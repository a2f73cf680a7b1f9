"""CLI + analyse-tool integration: run the nested CLI main() on a tiny
config, then aggregate the run dir with the analyse tool (reference
examples/nested/run.py + analyse.py)."""

import argparse
import importlib.util
import os
import sys

import numpy as np


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ROOT = os.path.realpath(os.path.join(os.path.dirname(__file__), '..'))


def test_cli_and_analyse(tmp_path, capsys):
    run_mod = _load(os.path.join(ROOT, 'examples', 'nested', 'run.py'),
                    'nested_run_cli')
    args = argparse.Namespace(
        x_dim=2, train_iters=50, mcmc_steps=0, mcmc_num_chains=10,
        num_live_points=100, mcmc_fixed_step_size=False, switch=-1,
        hidden_dim=16, num_layers=1, flow='spline', num_blocks=3,
        jitter=-1, num_slow=0, log_dir=str(tmp_path / 'logs'),
        likelihood='gaussian', log_suffix='', base_dist='', scale='',
        beta=8.0, corr=0.0, strategy='', dlogz=0.5,
        rejection_batch_size=256, seed=1, mcmc_gen_batch=8,
        rejection_gen_batch=8, resume=False, max_iters=1000000)
    run_mod.main(args)

    run_dir = os.path.join(str(tmp_path / 'logs'), 'gaussian', 'run1')
    assert os.path.exists(os.path.join(run_dir, 'results', 'final.csv'))
    assert os.path.exists(os.path.join(run_dir, 'chains', 'chain.txt'))

    analyse = _load(os.path.join(ROOT, 'examples', 'nested', 'analyse.py'),
                    'nested_analyse_cli')
    aargs = argparse.Namespace(root=str(tmp_path / 'logs' / '*'), dim=2,
                               feedback=0, plot=False)
    analyse.main(aargs)
    out = capsys.readouterr().out
    assert 'Dim: 2' in out
    assert 'logz=' in out

    # chain file parses in getdist text format
    w, logl, samp = analyse.read_chain(
        os.path.join(run_dir, 'chains', 'chain.txt'))
    assert samp.shape[1] == 2
    assert np.all(w >= 0)
