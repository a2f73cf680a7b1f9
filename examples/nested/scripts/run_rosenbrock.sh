#!/bin/bash
# Dim sweep for Rosenbrock (equivalent of reference run_rosenbrock.sh)
for DIM in 2 3 4 5 10 20 30; do
  python examples/nested/run.py --likelihood rosenbrock --x_dim $DIM --log_suffix "_d$DIM"
done
