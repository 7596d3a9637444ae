"""Figure CLI: regenerate the paper's insight figures from sweep logs.

Usage:
    python make_figures.py --nstep logs/run-*.txt --out figures/
    python make_figures.py --confounding logs/conf10.json --out figures/
    python make_figures.py --recover logs/recover_dist.json --out figures/

The reference buries its figure code in utils/results_utils.py:393+ and
never ships the rendered artifacts; here the figures are first-class
outputs (harness/plots.py) driven from the same log-as-database files.
"""

from __future__ import annotations

import argparse
import json
import os

import pandas as pd


def nstep_figure(log_paths, out_dir, datasets=None):
    from insite_tpu.harness.plots import plot_n_step_rmses
    from insite_tpu.harness.results import df_from_log
    df = pd.concat([df_from_log(p) for p in log_paths], ignore_index=True)
    if 'errored' in df.columns:
        df = df[~df.errored.astype(bool)]
    if datasets:
        df = df[df.dataset_name.isin(datasets)]
    out = os.path.join(out_dir, 'n_step_rmse.png')
    plot_n_step_rmses(df, out)
    return out


def confounding_figure(json_path, out_dir, metrics=('encoder_test_rmse_orig',)):
    """Build the gamma-sweep frame from a vectorized-confounding JSON
    ({method: {gammas, <metric>: [n_gamma][n_seed]}}) and plot one panel
    per requested metric (the reference's overlap graph emits one figure
    per horizon, results_utils.py:680-727). `metrics=['all']` expands to
    every metric column in the JSON."""
    from insite_tpu.harness.plots import plot_confounding_sweep
    with open(json_path) as f:
        grid = json.load(f)
    rows = []
    all_metrics = []
    for method, d in grid.items():
        cols = {k: v for k, v in d.items() if k != 'gammas'}
        all_metrics = [k for k in cols if k not in all_metrics] + \
            [k for k in all_metrics]
        for gi, gamma in enumerate(d['gammas']):
            n_seeds = len(next(iter(cols.values()))[gi])
            for s in range(n_seeds):
                rows.append({'method_name': method, 'domain_conf': gamma,
                             'seed': s,
                             **{k: v[gi][s] for k, v in cols.items()}})
    df = pd.DataFrame(rows)
    if list(metrics) == ['all']:
        metrics = all_metrics
    outs = []
    for metric in metrics:
        suffix = '' if metric == 'encoder_test_rmse_orig' else f'_{metric}'
        out = os.path.join(out_dir, f'confounding_sweep{suffix}.png')
        plot_confounding_sweep(df, out, metric=metric)
        outs.append(out)
    return outs


def less_samples_figure(log_paths, out_dir):
    """Sample-efficiency figure from INSIGHT_LESS_SAMPLES sweep logs
    (rows carry `train_samples`)."""
    from insite_tpu.harness.plots import plot_sample_efficiency
    from insite_tpu.harness.results import df_from_log
    df = pd.concat([df_from_log(p) for p in log_paths], ignore_index=True)
    if 'errored' in df.columns:
        df = df[~df.errored.astype(bool)]
    df = df[df.train_samples.notna()]
    out = os.path.join(out_dir, 'sample_efficiency.png')
    plot_sample_efficiency(df, out)
    return out


def recover_figure(json_path, out_dir):
    """Plot a recovered-vs-true decay-constant JSON
    ({arm: {true: [...], recovered: [...]}}, produced by
    `harness.insights.recover_parametric_dist(..., raw=True)`)."""
    from insite_tpu.harness.plots import plot_recovered_dist
    with open(json_path) as f:
        rec = json.load(f)
    rec = {arm: d for arm, d in rec.items() if 'true' in d}
    out = os.path.join(out_dir, 'recovered_dist.png')
    plot_recovered_dist(rec, out)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--nstep', nargs='*', default=[],
                    help='sweep logs for the n-step RMSE panels')
    ap.add_argument('--datasets', nargs='*', default=None,
                    help='restrict n-step panels to these datasets')
    ap.add_argument('--confounding', default=None,
                    help='vectorized confounding-grid JSON')
    ap.add_argument('--metrics', nargs='*',
                    default=['encoder_test_rmse_orig'],
                    help="confounding-figure metrics ('all' = every "
                         'metric column in the JSON, one panel each)')
    ap.add_argument('--recover', default=None,
                    help='recovered-parametric-dist JSON (insights.py)')
    ap.add_argument('--less-samples', nargs='*', default=[],
                    help='INSIGHT_LESS_SAMPLES sweep logs for the '
                         'sample-efficiency figure')
    ap.add_argument('--out', default='figures')
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    made = []
    if args.nstep:
        made.append(nstep_figure(args.nstep, args.out, args.datasets))
    if args.confounding:
        made.extend(confounding_figure(args.confounding, args.out,
                                       metrics=args.metrics))
    if args.recover:
        made.append(recover_figure(args.recover, args.out))
    if args.less_samples:
        made.append(less_samples_figure(args.less_samples, args.out))
    for p in made:
        print('wrote', p)
    if not made:
        print('nothing to do (pass --nstep and/or --confounding)')


if __name__ == '__main__':
    main()
