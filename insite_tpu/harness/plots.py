"""Figure toolkit: n-step RMSE curves and confounding-sweep graphs
(clean re-expression of the reference's plotting helpers,
utils/results_utils.py:393+, which mix dead research code with seaborn
styling — here: plain matplotlib over the same aggregated DataFrames)."""

from __future__ import annotations

import numpy as np

from insite_tpu.harness.results import (DATASET_NAME_MAP, METHOD_NAME_MAP,
                                        ci)


def _agg(df, group_cols, use_95_ci=True):
    err = ci if use_95_ci else np.std
    num = df.select_dtypes('number')
    keep = [c for c in df.columns if c in group_cols or c in num.columns]
    g = df[keep].groupby(group_cols)
    return g.mean(), g.agg(err), ('ci' if use_95_ci else 'std')


def plot_n_step_rmses(df_results, out_path: str, use_95_ci=True,
                      logy=True, domain_conf=None):
    """One panel per dataset: mean +- CI of the 1..6-step RMSE per method,
    horizon on the x axis — the reference's n-step overlap graph
    (utils/results_utils.py:568-677): the 1-step point is
    encoder_test_rmse_orig (STEP_AHEAD_NAME_MAP), y is log-scale, and with
    a `domain_conf` (or when several gammas are present, gamma = 2, the
    benchmark default) only that confounding level is plotted."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    df = df_results[~df_results.get('errored', False).astype(bool)] \
        if 'errored' in df_results.columns else df_results
    if 'domain_conf' in df.columns:
        gammas = df['domain_conf'].dropna().unique()
        if domain_conf is None and len(gammas) > 1:
            domain_conf = 2.0      # results_utils.py:627
        if domain_conf is not None:
            df = df[df['domain_conf'] == float(domain_conf)]
    step_cols = sorted([c for c in df.columns if 'decoder_test_rmse' in c],
                       key=lambda c: int(c.split('_')[-1].split('-')[0]))
    if not step_cols:
        raise ValueError('no decoder_test_rmse_<k>-step columns found')
    steps = [int(c.split('_')[-1].split('-')[0]) for c in step_cols]
    if 'encoder_test_rmse_orig' in df.columns:  # 1-step-ahead point
        step_cols = ['encoder_test_rmse_orig'] + step_cols
        steps = [1] + steps
    datasets = list(df.dataset_name.unique())

    means, errs, _ = _agg(df, ['dataset_name', 'method_name'], use_95_ci)
    fig, axes = plt.subplots(1, len(datasets),
                             figsize=(4 * len(datasets), 3.2), squeeze=False)
    for ax, ds in zip(axes[0], datasets):
        for method in df.method_name.unique():
            try:
                m = means.loc[(ds, method), step_cols].to_numpy(float)
                e = errs.loc[(ds, method), step_cols].to_numpy(float)
            except KeyError:
                continue
            label = METHOD_NAME_MAP.get(method, method).replace(r'\bf ', '')
            ax.plot(steps, m, '--o', label=label)
            ax.fill_between(steps, m - np.nan_to_num(e),
                            m + np.nan_to_num(e), alpha=0.25)
        ax.set_title(DATASET_NAME_MAP.get(ds, ds))
        ax.set_xlabel(r'$\tau$-step ahead prediction')
        ax.set_ylabel('normalized RMSE (%)')
        ax.set_xticks(steps)
        if logy:
            ax.set_yscale('log')
    axes[0][0].legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_confounding_sweep(df_results, out_path: str,
                           metric='encoder_test_rmse_orig', use_95_ci=True,
                           logy=False):
    """RMSE vs confounding strength gamma — the INSIGHT_CONFOUNDING figure
    and the per-(dataset, step) half of the reference's overlap graph
    (utils/results_utils.py:680-727, one figure per metric via
    make_figures --metrics).  The reference's plot_threshold_plots
    (:729-838) is dead code inherited from the authors' active-observing
    project (env_name / sampling_policy / total_reward columns no run of
    THIS benchmark emits) and is deliberately not reproduced."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    df = df_results[~df_results.get('errored', False).astype(bool)] \
        if 'errored' in df_results.columns else df_results
    means, errs, _ = _agg(df, ['method_name', 'domain_conf'], use_95_ci)
    fig, ax = plt.subplots(figsize=(5, 3.5))
    for method in df.method_name.unique():
        sub_m = means.loc[method][metric]
        sub_e = errs.loc[method][metric]
        gammas = sub_m.index.to_numpy(float)
        label = METHOD_NAME_MAP.get(method, method).replace(r'\bf ', '')
        ax.plot(gammas, sub_m.to_numpy(float), '--o', label=label)
        ax.fill_between(gammas,
                        sub_m.to_numpy(float) -
                        np.nan_to_num(sub_e.to_numpy(float)),
                        sub_m.to_numpy(float) +
                        np.nan_to_num(sub_e.to_numpy(float)), alpha=0.25)
    ax.set_xlabel(r'confounding strength $\gamma$')
    ax.set_ylabel(f'{metric} (%)')
    if logy:
        ax.set_yscale('log')
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_sample_efficiency(df_results, out_path: str,
                           metric='encoder_test_rmse_orig', use_95_ci=True):
    """RMSE vs training-cohort size (the INSIGHT_LESS_SAMPLES figure;
    rows carry a `train_samples` column, runner.py LESS_SAMPLES runs)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    df = df_results[~df_results.get('errored', False).astype(bool)] \
        if 'errored' in df_results.columns else df_results
    means, errs, _ = _agg(df, ['method_name', 'train_samples'], use_95_ci)
    fig, ax = plt.subplots(figsize=(5, 3.5))
    for method in df.method_name.unique():
        sub_m = means.loc[method][metric]
        sub_e = errs.loc[method][metric]
        ns = sub_m.index.to_numpy(float)
        label = METHOD_NAME_MAP.get(method, method).replace(r'\bf ', '')
        m = sub_m.to_numpy(float)
        e = np.nan_to_num(sub_e.to_numpy(float))
        ax.plot(ns, m, '--o', label=label)
        ax.fill_between(ns, m - e, m + e, alpha=0.25)
    ax.set_xlabel('training patients')
    ax.set_ylabel(f'{metric} (%)')
    ax.set_xscale('log')
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_recovered_dist(rec_data: dict, out_path: str):
    """INSIGHT_RECOVER_PARAMETRIC_DIST figure: recovered vs true hidden
    decay constants (`harness/insights.py`). Left: per-patient scatter
    against the identity line with pearson r direct-labeled; right: the
    two distributions overlaid (true filled, recovered outlined).

    `rec_data` maps arm name -> {'true': [...], 'recovered': [...]}.
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, (ax_sc, ax_hi) = plt.subplots(1, 2, figsize=(8.4, 3.4))
    lo = min(float(np.min(d['true'])) for d in rec_data.values())
    hi = max(float(np.max(d['true'])) for d in rec_data.values())
    pad = 0.08 * (hi - lo + 1e-12)
    lo, hi = lo - pad, hi + pad
    ax_sc.plot([lo, hi], [lo, hi], color='0.6', lw=1, zorder=1)
    bins = np.linspace(lo, hi, 24)
    for i, (arm, d) in enumerate(sorted(rec_data.items())):
        t = np.asarray(d['true'], float)
        r = np.asarray(d['recovered'], float)
        color = f'C{i}'
        corr = np.corrcoef(t, r)[0, 1] if t.size > 1 else np.nan
        ax_sc.scatter(t, r, s=14, alpha=0.7, color=color, zorder=2,
                      label=f'{arm} (r={corr:.3f})')
        ax_hi.hist(t, bins=bins, alpha=0.35, color=color,
                   label=f'{arm} true')
        ax_hi.hist(r, bins=bins, histtype='step', lw=1.8, color=color,
                   label=f'{arm} recovered')
    ax_sc.set_xlabel('true hidden decay constant C')
    ax_sc.set_ylabel('recovered C (INSITE fine-tune)')
    ax_sc.legend(fontsize=8)
    ax_hi.set_xlabel('decay constant C')
    ax_hi.set_ylabel('patients')
    ax_hi.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
