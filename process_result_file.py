"""Regenerate the paper tables from results log file(s) (reference:
process_result_file.py:1-34 — the log lines are the results database).

Usage:
    python process_result_file.py logs/run-*.txt [--csv out.csv]

With several logs, rows are combined and de-duplicated per
(dataset, method, seed, gamma), the LAST-given log winning — so
`logs/run-*.txt` (lexicographic = chronological) keeps the newest run of
every cell.
"""

import argparse

from insite_tpu.harness.results import (df_from_log,
                                        generate_main_results_table)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('log_path', nargs='+', help='sweep log(s) containing '
                   '"[Exp evaluation complete] {...}" lines')
    p.add_argument('--protocol', action='store_true',
                   help='keep only main-table protocol rows: gamma == 2 '
                        'and no noise_scale / train_samples override '
                        'columns set')
    p.add_argument('--csv', default=None,
                   help='also dump the parsed runs DataFrame to CSV')
    p.add_argument('--std', action='store_true',
                   help='report std instead of the default 95%% t-CI')
    p.add_argument('--paper', action='store_true',
                   help='emit the paper-format tabularx tables (grouped '
                        'LTE/ODE-D rows, shaded INSITE) instead of the '
                        'plain tabular layout')
    p.add_argument('--plots', default=None, metavar='DIR',
                   help='also render n-step (and, when multiple '
                        'domain_conf values exist, confounding) figures')
    p.add_argument('--vs-reference', nargs='?', metavar='REF_LOG',
                   const='/root/reference/results/2_main_table/'
                         'final_with_insite.txt',
                   default=None,
                   help='side-by-side markdown table against a reference '
                        'sweep log (default: the shipped main-table log)')
    args = p.parse_args()

    import os

    import pandas as pd
    from insite_tpu.harness.runner import _read_sweep_fingerprints
    PROTOCOL = {'epochs': 100, 'train_samples': 1000, 'val_samples': 100,
                'test_samples': 100}
    frames = []
    for path in args.log_path:
        if not os.path.exists(path):
            raise SystemExit(f'log file not found: {path}')
        if args.protocol:
            fps = _read_sweep_fingerprints(path)
            bad = [fp for fp in fps
                   if any(fp.get(k) != v for k, v in PROTOCOL.items())
                   or fp.get('model_overrides')]  # hparam-variant sweeps
                   # (ref_tuned preset, basin experiments) are not
                   # main-table evidence even at protocol scale
            if bad:
                # a log can hold several appended sweeps; any off-protocol
                # fingerprint means some rows in it are off-protocol
                print(f'[protocol] skipping {path}: {len(bad)} of '
                      f'{len(fps)} sweep config(s) off-protocol, e.g. '
                      f'{ {k: bad[0].get(k) for k in PROTOCOL} }')
                continue
            if not fps:
                print(f'[protocol] {path}: no [Sweep config] fingerprint '
                      f'(pre-fingerprint log) — rows kept unverified')
        d = df_from_log(path, with_ts=True)
        if not d.empty:
            frames.append(d)
    if not frames:
        raise SystemExit(f'no completed runs found in {args.log_path}')
    df = pd.concat(frames, ignore_index=True)
    key = [c for c in ('dataset_name', 'method_name', 'seed', 'domain_conf',
                       'noise_scale', 'train_samples') if c in df.columns]
    # newest-wins by the rows' ACTUAL logging timestamps — argument/glob
    # order is not chronological (round-1 logs passed after round-2 ones
    # used to shadow newer re-runs of the same (dataset, method, seed))
    df = df.sort_values('_log_ts', kind='stable') \
        .drop_duplicates(subset=key, keep='last') \
        .drop(columns=['_log_ts']).reset_index(drop=True)
    if args.protocol:
        keep = df['domain_conf'].astype(float) == 2.0
        if 'noise_scale' in df.columns:
            keep &= df['noise_scale'].isna() | (df['noise_scale'] == 1.0)
        if 'train_samples' in df.columns:      # LESS_SAMPLES override rows
            keep &= df['train_samples'].isna()
        df = df[keep].reset_index(drop=True)
    print(f'parsed {len(df)} completed runs '
          f'({df.dataset_name.nunique()} datasets x '
          f'{df.method_name.nunique()} methods)')
    if args.csv:
        df.to_csv(args.csv, index=False)
        print(f'wrote {args.csv}')
    if args.vs_reference:
        from insite_tpu.harness.results import parity_table
        print(parity_table(df, df_from_log(args.vs_reference)))
    if args.paper:
        from insite_tpu.harness.results import (
            generate_main_results_table_paper_format)
        tables = generate_main_results_table_paper_format(
            df, use_95_ci=not args.std)
    else:
        tables = generate_main_results_table(df, use_95_ci=not args.std)
    for metric, table in tables.items():
        print(f'\nLatex Table:: {metric}\n{table}')

    if args.plots:
        import os
        from insite_tpu.harness.plots import (plot_confounding_sweep,
                                              plot_n_step_rmses)
        os.makedirs(args.plots, exist_ok=True)
        print('wrote', plot_n_step_rmses(
            df, os.path.join(args.plots, 'n_step_rmse.png'),
            use_95_ci=not args.std))
        if 'domain_conf' in df.columns and df['domain_conf'].nunique() > 1:
            print('wrote', plot_confounding_sweep(
                df, os.path.join(args.plots, 'confounding.png'),
                use_95_ci=not args.std))


if __name__ == '__main__':
    main()
