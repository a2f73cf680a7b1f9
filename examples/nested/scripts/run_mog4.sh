#!/bin/bash
# Dim sweep for the 4-mode Gaussian mixture
for DIM in 2 3 4 5 10 20 30; do
  python examples/nested/run.py --likelihood mixture --x_dim $DIM --log_suffix "_d$DIM"
done
