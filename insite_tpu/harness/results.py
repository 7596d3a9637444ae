"""Results toolkit: log-as-database parsing, 95% t-CI aggregation and LaTeX
main-table emission (reference: utils/results_utils.py:16-392)."""

from __future__ import annotations

import ast

import numpy as np
import pandas as pd
from scipy import stats

METHOD_NAME_MAP = {'sindy': 'A-SINDy', 'wsindy': 'A-WSINDy',
                   'te-cde': 'TE-CDE', 'insite': r'\bf INSITE',
                   'crn': 'CRN', 'msm': 'MSM', 'gnet': 'G-Net',
                   'rmsn': 'RMSN', 'ct': 'CT', 'edct': 'EDCT'}
DATASET_NAME_ORDERING = {'cancer_sim': -1, 'EQ_4_A': 0, 'EQ_4_B': 1,
                         'EQ_4_C': 2, 'EQ_4_D': 3, 'EQ_5_A': 4, 'EQ_5_B': 5,
                         'EQ_5_C': 6, 'EQ_5_D': 7}
METHOD_NAME_ORDERING = {'msm': 0, 'rmsn': 1, 'crn': 2, 'gnet': 3,
                        'te-cde': 4, 'ct': 5, 'edct': 6, 'sindy': 7,
                        'wsindy': 8, 'insite': 9}
DATASET_NAME_MAP = {'EQ_4_A': 'Eq.4.A', 'EQ_4_B': 'Eq.4.B',
                    'EQ_4_C': 'Eq.4.C', 'EQ_4_D': 'Eq.4.D',
                    'EQ_5_A': 'Eq.5.A', 'EQ_5_B': 'Eq.5.B',
                    'EQ_5_C': 'Eq.5.C', 'EQ_5_D': 'Eq.5.D',
                    'cancer_sim': 'Cancer PKPD'}


def ci(data, confidence=0.95, axis=0):
    """95% t-interval half-width (results_utils.py:80-86)."""
    a = 1.0 * np.array(data)
    n = a.shape[axis]
    se = stats.sem(a, axis=axis)
    return se * stats.t.ppf((1 + confidence) / 2.0, n - 1)


def custom_format(number, threshold=1e-2):
    if abs(number) < threshold:
        return '0.00' if number == 0 else f'{number:.2e}'
    return f'{number:.2f}'


def df_from_log(path, with_ts=False) -> pd.DataFrame:
    """Parse '[Exp evaluation complete] {...}' lines back into a DataFrame
    (results_utils.py:121-172).

    with_ts=True adds a `_log_ts` column parsed from each line's logging
    timestamp so multi-log combiners can dedup newest-first by actual wall
    time rather than argument order (rows for the same (dataset, method,
    seed) can exist in several logs; the newest reflects current code)."""
    rows = []
    with open(path) as f:
        for line in f:
            if '[Exp evaluation complete] {' in line:
                payload = line.split('[Exp evaluation complete] ')[1].strip()
                payload = payload.replace('nan', "'nan'")
                payload = payload.replace('array', '')
                row = ast.literal_eval(payload)
                if with_ts:
                    try:
                        row['_log_ts'] = pd.Timestamp(
                            line.split(' INFO')[0].split(' DEBUG')[0]
                            .replace(',', '.').strip())
                    except (ValueError, IndexError):
                        row['_log_ts'] = pd.Timestamp(0)
                rows.append(row)
    return pd.DataFrame(rows)


def generate_main_results_table(df_results: pd.DataFrame, use_95_ci=True):
    """LaTeX table per n-step metric (results_utils.py:305-382)."""
    df = df_results.copy()
    if 'errored' in df.columns:
        df = df[~df['errored'].fillna(False)]
        df = df.drop(columns=['errored'])
    keep = [c for c in df.columns
            if c in ('dataset_name', 'method_name') or 'rmse' in c]
    df = df[keep]
    if df.empty or 'dataset_name' not in df.columns or \
            not any('rmse' in c for c in df.columns):
        return {}   # nothing completed — no tables to emit
    agg = [np.mean, ci] if use_95_ci else [np.mean, np.std]
    error_metric = 'ci' if use_95_ci else 'std'
    df_out = df.groupby(['dataset_name', 'method_name']).agg(agg) \
        .reset_index()
    df_out['dataset_name_order'] = \
        df_out['dataset_name'].map(DATASET_NAME_ORDERING)
    df_out['method_name_order'] = \
        df_out['method_name'].map(METHOD_NAME_ORDERING)
    df_out = df_out.sort_values(by=['dataset_name_order',
                                    'method_name_order'])
    df_out = df_out.drop(columns=['dataset_name_order', 'method_name_order'])

    metrics = [c for c in df.columns if 'decoder_test_rmse' in c] + \
        [c for c in df.columns if c == 'encoder_test_rmse_orig']
    tables = {}
    for metric in metrics:
        lines = [r'\begin{tabular}{@{}l' +
                 'c' * df_out.dataset_name.nunique() + '}', r'\toprule',
                 r'Method &' + '&'.join(
                     DATASET_NAME_MAP.get(dn, dn)
                     for dn in df_out.dataset_name.unique()) + r'\\',
                 r'\midrule']
        for method_name in df_out.method_name.unique():
            line = METHOD_NAME_MAP.get(method_name, method_name)
            for dataset_name in df_out.dataset_name.unique():
                row = df_out[(df_out.method_name == method_name) &
                             (df_out.dataset_name == dataset_name)]
                if row.empty or row[metric]['mean'].isna().all():
                    line += r'& NA'
                    continue
                mean = custom_format(row[metric]['mean'].iloc[0])
                err = row[metric][error_metric].iloc[0]
                err = custom_format(0.0 if np.isnan(err) else err)
                cell = mean + r'$\pm$' + err
                line += (r'& \textbf{' + cell + '}'
                         if method_name == 'insite' else '&' + cell)
            lines.append(line + r'\\')
        lines += [r'\bottomrule', r'\end{tabular}']
        tables[metric] = '\n'.join(lines)
    return tables


def generate_main_results_table_paper_format(df_results: pd.DataFrame,
                                             use_95_ci=True):
    """Paper-style LaTeX tables (results_utils.py:212-301): tabularx layout
    with \\cref dataset headers, LTE / ODE-D method-group rows, and the
    INSITE row shaded + bolded."""
    df = df_results.copy()
    if 'errored' in df.columns:
        df = df[~df['errored'].fillna(False)].drop(columns=['errored'])
    keep = [c for c in df.columns
            if c in ('dataset_name', 'method_name') or 'rmse' in c]
    df = df[keep]
    if df.empty or 'dataset_name' not in df.columns or \
            not any('rmse' in c for c in df.columns):
        return {}
    agg = [np.mean, ci] if use_95_ci else [np.mean, np.std]
    error_metric = 'ci' if use_95_ci else 'std'
    df_out = df.groupby(['dataset_name', 'method_name']).agg(agg) \
        .reset_index()
    df_out['dataset_name_order'] = \
        df_out['dataset_name'].map(DATASET_NAME_ORDERING)
    df_out['method_name_order'] = \
        df_out['method_name'].map(METHOD_NAME_ORDERING)
    df_out = df_out.sort_values(by=['dataset_name_order',
                                    'method_name_order'])
    df_out = df_out.drop(columns=['dataset_name_order', 'method_name_order'])

    eq4, eq5 = r'{\bf\cref{eq:one-compartment-pkpd}', r'{\bf\cref{eq:tumor}'
    name_map = {f'EQ_4_{v}': f'{eq4}.{v}' + r'}' for v in 'ABCD'}
    name_map.update({f'EQ_5_{v}': f'{eq5}.{v}' + r'}' for v in 'ABCD'})
    name_map['cancer_sim'] = 'Cancer PKPD'
    ode_methods = ('sindy', 'wsindy', 'insite')

    methods = list(df_out.method_name.unique())
    lte_methods = [m for m in methods if m not in ode_methods]
    oded_methods = [m for m in methods if m in ode_methods]

    metrics = [c for c in df.columns if 'decoder_test_rmse' in c]
    tables = {}
    for metric in metrics:
        n_ds = df_out.dataset_name.nunique()
        lines = [r'\begin{tabularx}{\textwidth}{cr | *{' + f'{n_ds}' +
                 r'}{X}}', r'\toprule',
                 r'&{\bf Method}&' + '&'.join(
                     name_map.get(dn, dn)
                     for dn in df_out.dataset_name.unique()) + r'\\',
                 r'\midrule']
        # rotated group labels span exactly their group's rows, and a group
        # that has no methods in this log emits nothing (a dangling
        # \multirow before \midrule is uncompilable LaTeX)
        if lte_methods:
            lines.append(r'\multirow{' + str(len(lte_methods)) +
                         r'}{*}{\rotatebox{90}{\bf LTE}}')
        ode_group_started = False
        for method_name in lte_methods + oded_methods:
            if method_name in ode_methods and not ode_group_started:
                if lte_methods:
                    lines.append(r'\midrule')
                lines.append(r'\multirow{' + str(len(oded_methods)) +
                             r'}{*}{\rotatebox{90}{\bf ODE-D}}')
                ode_group_started = True
            is_insite = method_name == 'insite'
            line = (r'& \CC{black!5} INSITE' if is_insite else
                    '&' + METHOD_NAME_MAP.get(method_name, method_name))
            for dataset_name in df_out.dataset_name.unique():
                row = df_out[(df_out.method_name == method_name) &
                             (df_out.dataset_name == dataset_name)]
                if row.empty or row[metric]['mean'].isna().all():
                    line += r'& NA'
                    continue
                mean = custom_format(row[metric]['mean'].iloc[0])
                err = row[metric][error_metric].iloc[0]
                err = custom_format(0.0 if np.isnan(err) else err)
                if is_insite:
                    line += (r'& \CC{black!5} {\bf ' + mean + r'} ' +
                             r'{\footnotesize $\pm$' + err + r'}')
                else:
                    line += ('&' + mean +
                             r'{\footnotesize $\pm$' + err + r'}')
            lines.append(line + r'\\')
        lines += [r'\bottomrule', r'\end{tabularx}']
        tables[metric] = '\n'.join(lines)
    return tables


def parity_table(df_ours: pd.DataFrame, df_ref: pd.DataFrame,
                 metrics=('encoder_test_rmse_orig',
                          'decoder_test_rmse_6-step')) -> str:
    """Side-by-side ours-vs-reference markdown table.

    Both frames come from df_from_log — the reference ships its raw sweep
    logs in the same '[Exp evaluation complete] {...}' format
    (results/2_main_table/*.txt), so its numbers can be re-aggregated with
    the same parser instead of transcribed by hand. Cells are
    mean±std over seeds; '**' marks the better mean.
    """
    def agg(df):
        df = df[~df.get('errored', pd.Series(False, index=df.index))
                .fillna(False)]
        out = {}
        for (ds, m), g in df.groupby(['dataset_name', 'method_name']):
            out[(ds, m)] = {k: (g[k].astype(float).mean(),
                                g[k].astype(float).std(ddof=0), len(g))
                            for k in metrics if k in g}
        return out

    ours, ref = agg(df_ours), agg(df_ref)
    keys = sorted(set(ours) & set(ref))
    if not keys:
        return '(no overlapping (dataset, method) cells)'
    head = '| dataset | method | n | ' + ' | '.join(
        f'{m} ours | ref' for m in metrics) + ' |'
    sep = '|' + '---|' * (3 + 2 * len(metrics))
    lines = [head, sep]
    for ds, m in keys:
        cells = [ds, m, str(ours[(ds, m)][metrics[0]][2])]
        for metric in metrics:
            o = ours[(ds, m)].get(metric)
            r = ref[(ds, m)].get(metric)
            if o is None or r is None:
                cells += ['—', '—']
                continue
            o_s = f'{o[0]:.3f}±{o[1]:.3f}'
            r_s = f'{r[0]:.3f}±{r[1]:.3f}'
            if o[0] <= r[0]:
                o_s = f'**{o_s}**'
            else:
                r_s = f'**{r_s}**'
            cells += [o_s, r_s]
        lines.append('| ' + ' | '.join(cells) + ' |')
    return '\n'.join(lines)
