"""Regenerate the paper tables from a results log file (reference:
process_result_file.py:1-34 — the log lines are the results database).

Usage:
    python process_result_file.py logs/run-YYYYMMDD-HHMMSS.txt [--csv out.csv]
"""

import argparse

from insite_tpu.harness.results import (df_from_log,
                                        generate_main_results_table)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('log_path', help='sweep log containing '
                   '"[Exp evaluation complete] {...}" lines')
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
    if not os.path.exists(args.log_path):
        raise SystemExit(f'log file not found: {args.log_path}')
    df = df_from_log(args.log_path)
    if df.empty:
        raise SystemExit(f'no completed runs found in {args.log_path}')
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
