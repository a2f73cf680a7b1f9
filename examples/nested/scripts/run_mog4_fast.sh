#!/bin/bash
# Fast-slow variant: first 2 dims slow
for DIM in 4 5 10 20 30; do
  python examples/nested/run.py --likelihood mixture --x_dim $DIM --num_slow 2 --log_suffix "_fast_d$DIM"
done
