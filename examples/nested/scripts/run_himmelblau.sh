#!/bin/bash
python examples/nested/run.py --likelihood himmelblau --x_dim 2
