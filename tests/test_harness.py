"""Harness tests: the run_experiment skeleton, log-as-database round-trip,
LaTeX table emission, dataset cache, and the hparam tuners."""

import logging

import numpy as np
import pytest

from insite_tpu.harness.config import RunConfig
from insite_tpu.harness.results import (ci, custom_format, df_from_log,
                                        generate_main_results_table)
from insite_tpu.harness.runner import Experiment, run_experiment
from insite_tpu.harness.tuning import grid_points, tune_insite_lam

TINY = dict(train_samples=80, val_samples=16, test_samples=8)


@pytest.fixture(scope='module')
def sindy_result():
    cfg = RunConfig(**TINY)
    return run_experiment('EQ_4_D', 'sindy', seed=0, domain_conf=2.0,
                          cfg=cfg)


def test_run_experiment_metric_keys(sindy_result):
    r = sindy_result
    for k in ('encoder_test_rmse_orig', 'encoder_test_rmse_all',
              'encoder_test_rmse_last', 'decoder_test_rmse_2-step',
              'decoder_test_rmse_6-step', 'global_equation_string',
              'seconds_taken', 'method'):
        assert k in r, k
    assert np.isfinite(r['encoder_test_rmse_orig'])
    assert r['encoder_test_rmse_orig'] < 2.0


def test_log_roundtrip(tmp_path, sindy_result):
    """'[Exp evaluation complete] {...}' lines are the results database
    (results_utils.py:121-172)."""
    log_path = tmp_path / 'run.txt'
    row = dict(sindy_result)
    row.update({'errored': False, 'dataset_name': 'EQ_4_D',
                'method_name': 'sindy', 'domain_conf': 2.0})
    logger = logging.getLogger('roundtrip_test')
    handler = logging.FileHandler(log_path)
    logger.addHandler(handler)
    logger.warning(f'[Exp evaluation complete] {row}')
    handler.close()

    df = df_from_log(log_path)
    assert len(df) == 1
    assert df.iloc[0]['method_name'] == 'sindy'
    np.testing.assert_allclose(df.iloc[0]['encoder_test_rmse_orig'],
                               sindy_result['encoder_test_rmse_orig'])

    tables = generate_main_results_table(df)
    assert 'encoder_test_rmse_orig' in tables
    assert r'\begin{tabular}' in tables['encoder_test_rmse_orig']
    assert 'Eq.4.D' in tables['encoder_test_rmse_orig']


def test_ci_and_format():
    vals = np.array([1.0, 1.1, 0.9, 1.05, 0.95])
    half = ci(vals)
    assert 0 < half < 0.2
    assert custom_format(0.123456) == '0.12'
    assert 'e' in custom_format(1.2e-4)
    assert custom_format(0.0) == '0.00'


def test_grid_points_subsample_deterministic():
    space = {'a': [1, 2, 3], 'b': [10, 20]}
    full = grid_points(space)
    assert len(full) == 6
    sub1 = grid_points(space, n_trials=3, seed=4)
    sub2 = grid_points(space, n_trials=3, seed=4)
    assert sub1 == sub2 and len(sub1) == 3
    for p in sub1:
        assert p in full


def test_tune_insite_lam():
    from insite_tpu.data import PkpdDatasetCollection
    from insite_tpu.models.sindy import SINDyConfig, SINDyRegressor
    coll = PkpdDatasetCollection(
        conf_coeff=2.0, num_patients={'train': 60, 'val': 12, 'test': 4},
        equation_str='EQ_4_D', seed=0)
    coll.process_data_multi()
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, insite=True,
                      bfgs_maxiter=20)
    model = SINDyRegressor(cfg, coll).fit(coll.train_f)
    grid = (0.0, 10.0, 1000.0)
    best, scores = tune_insite_lam(model, coll.val_f, lam_grid=grid)
    assert set(scores) == set(grid)
    assert best == min(scores, key=scores.get)
    assert model.cfg.lam == best
    assert all(np.isfinite(v) for v in scores.values())


def test_dataset_cache_roundtrip(tmp_path, monkeypatch):
    from insite_tpu.harness import cache
    monkeypatch.setattr(cache, 'CACHE_DIR', str(tmp_path))
    from insite_tpu.data import PkpdDatasetCollection
    coll = PkpdDatasetCollection(
        conf_coeff=2.0, num_patients={'train': 8, 'val': 4, 'test': 2},
        equation_str='EQ_4_A', seed=0)
    key = ('EQ_4_A', 'multiclass', 0, 2.0)
    cache.put_cached(key, coll)
    back = cache.get_cached(key)
    assert back is not None
    np.testing.assert_array_equal(back.train_f.data['cancer_volume'],
                                  coll.train_f.data['cancer_volume'])
    assert cache.get_cached(('missing',)) is None


def test_sweep_fault_isolation(monkeypatch, tmp_path):
    """A run that raises becomes an errored row, not a crashed sweep
    (run.py:159-169)."""
    import insite_tpu.harness.runner as runner_mod

    def boom(*a, **k):
        raise RuntimeError('injected failure')

    monkeypatch.setattr(runner_mod, 'run_experiment', boom)
    cfg = RunConfig(methods=('sindy',), datasets=('EQ_4_D',), seed_runs=1,
                    debug_mode=False, **TINY)
    df, tables = runner_mod.sweep(cfg, Experiment.MAIN_TABLE)
    assert len(df) == 1
    assert bool(df.iloc[0]['errored'])


def test_parity_table():
    import pandas as pd
    from insite_tpu.harness.results import parity_table
    ours = pd.DataFrame([
        {'dataset_name': 'EQ_4_D', 'method_name': 'rmsn', 'seed': 0,
         'encoder_test_rmse_orig': 0.6, 'decoder_test_rmse_6-step': 1.2},
        {'dataset_name': 'EQ_4_D', 'method_name': 'rmsn', 'seed': 1,
         'encoder_test_rmse_orig': 0.8, 'decoder_test_rmse_6-step': 1.4}])
    ref = pd.DataFrame([
        {'dataset_name': 'EQ_4_D', 'method_name': 'rmsn', 'seed': 0,
         'encoder_test_rmse_orig': 2.5, 'decoder_test_rmse_6-step': 1.9}])
    md = parity_table(ours, ref)
    assert '| EQ_4_D | rmsn | 2 |' in md
    assert '**0.700±0.100**' in md       # ours better -> bold
    assert '2.500±0.000' in md
    # no overlap -> graceful message
    empty = parity_table(ours, ref[ref.dataset_name == 'nope'])
    assert 'no overlapping' in empty


def test_isolated_run_roundtrip():
    """--isolate executes run_experiment in a fresh interpreter and
    returns the same metrics dict shape; a child crash raises (which the
    sweep's fault wall turns into an errored row)."""
    from insite_tpu.harness.isolated import run_isolated
    cfg = RunConfig(**TINY)
    result = run_isolated('EQ_4_D', 'sindy', 0, 2.0, cfg,
                          Experiment.MAIN_TABLE)
    assert np.isfinite(result['encoder_test_rmse_orig'])
    assert 'global_equation_string' in result

    with pytest.raises(RuntimeError, match='isolated run'):
        run_isolated('NO_SUCH_DATASET', 'sindy', 0, 2.0, cfg,
                     Experiment.MAIN_TABLE)


@pytest.mark.parametrize('mode', ['sliding_treatment',
                                  'random_trajectories'])
def test_cf_seq_modes_end_to_end(mode):
    """Both counterfactual-plan modes (pkpd_simulation.py:474-503) drive the
    full n-step protocol on both simulator families."""
    cfg = RunConfig(train_samples=40, val_samples=8, test_samples=6,
                    cf_seq_mode=mode)
    r = run_experiment('EQ_4_D', 'sindy', seed=0, domain_conf=2.0, cfg=cfg)
    assert np.isfinite(r['decoder_test_rmse_6-step'])
    cfg2 = RunConfig(train_samples=16, val_samples=4, test_samples=4,
                     cf_seq_mode=mode)
    r2 = run_experiment('cancer_sim', 'sindy', seed=0, domain_conf=2.0,
                        cfg=cfg2)
    assert np.isfinite(r2['decoder_test_rmse_6-step'])


def test_vectorized_sweep_logs_standard_rows(tmp_path):
    """--vectorized: one on-device dispatch per (dataset, method) column,
    logged as standard per-seed rows the results toolkit can parse."""
    from insite_tpu.harness.logging_utils import create_logger_in_process
    from insite_tpu.harness.results import df_from_log
    from insite_tpu.harness.runner import vectorized_sweep
    cfg = RunConfig(train_samples=40, val_samples=8, test_samples=6,
                    seed_runs=2, methods=('sindy', 'msm'),
                    datasets=('EQ_4_D',), debug_mode=False)
    log_path = str(tmp_path / 'vec.txt')
    log = create_logger_in_process(log_path)
    df, tables = vectorized_sweep(cfg, log=log)
    sub = df[~df.errored.astype(bool)]
    # every requested method has a vectorized column (msm via the
    # seed-batched host solves, harness/vectorized_msm.py)
    assert set(sub.method_name) == {'sindy', 'msm'} and len(sub) == 4
    assert np.isfinite(sub.encoder_test_rmse_orig).all()
    assert np.isfinite(sub['decoder_test_rmse_6-step']).all()
    parsed = df_from_log(log_path)
    assert len(parsed[~parsed.errored.astype(bool)]) == 4
    assert tables


def test_vectorized_confounding_sweep_rows():
    """--vectorized --experiment INSIGHT_CONFOUNDING: per-(gamma, seed)
    rows with the domain_conf column set, one compiled program reused."""
    from insite_tpu.harness.runner import vectorized_sweep
    cfg = RunConfig(train_samples=40, val_samples=8, test_samples=6,
                    seed_runs=2, methods=('sindy',),
                    experiment='INSIGHT_CONFOUNDING',
                    domain_confs=(0.0, 2.0), debug_mode=False)
    df, _ = vectorized_sweep(cfg)
    sub = df[~df.errored.astype(bool)]
    assert len(sub) == 4                      # 2 gammas x 2 seeds
    assert set(sub.domain_conf) == {0.0, 2.0}
    assert np.isfinite(sub.encoder_test_rmse_orig).all()


@pytest.mark.slow
def test_tune_neural_grid_end_to_end(monkeypatch):
    """--tune for a neural method: seeded subsampled grid search on val
    (the reference's Ray/Optuna finetune, time_varying_model.py:319-395),
    winner's hparams recorded and used for eval."""
    from insite_tpu.harness import tuning
    monkeypatch.setitem(
        tuning.NEURAL_HPARAM_GRIDS, 'ct',
        {'learning_rate': [0.01, 0.001], 'dropout_rate': [0.1]})
    cfg = RunConfig(train_samples=24, val_samples=8, test_samples=6,
                    epochs=1, tune_hparams=True, tune_trials=2)
    r = run_experiment('EQ_4_D', 'ct', seed=0, domain_conf=2.0, cfg=cfg)
    assert r['tuned_hparams']['learning_rate'] in (0.01, 0.001)
    assert r['tuned_hparams']['dropout_rate'] == 0.1
    assert np.isfinite(r['encoder_test_rmse_orig'])


def test_model_overrides_precedence():
    """Tuned-hparam overlays: method < method@dataset < method@dataset/coeff
    (the reference's +backbone/<m>_hparams/<ds>_domain_conf/<coeff>.yaml
    overlay chain, run.py:197-263)."""
    from insite_tpu.harness.runner import _apply_model_overrides
    from insite_tpu.models.ct import CTConfig
    cfg = RunConfig(model_overrides={
        'ct': {'learning_rate': 0.5, 'br_size': 8},
        'ct@EQ_4_D': {'learning_rate': 0.25},
        'ct@EQ_4_D/2': {'learning_rate': 0.125},
    })
    m = _apply_model_overrides(CTConfig(), cfg, 'ct', 'EQ_4_D', 2.0)
    assert m.learning_rate == 0.125 and m.br_size == 8
    m = _apply_model_overrides(CTConfig(), cfg, 'ct', 'EQ_4_D', 3.0)
    assert m.learning_rate == 0.25 and m.br_size == 8
    m = _apply_model_overrides(CTConfig(), cfg, 'ct', 'EQ_4_A', 2.0)
    assert m.learning_rate == 0.5
    assert _apply_model_overrides(CTConfig(), RunConfig(), 'ct', 'EQ_4_D',
                                  2.0) == CTConfig()
    with pytest.raises(ValueError, match='unknown CTConfig fields'):
        _apply_model_overrides(
            CTConfig(), RunConfig(model_overrides={'ct': {'nope': 1}}),
            'ct', 'EQ_4_D', 2.0)


def test_model_overrides_reach_the_model():
    from insite_tpu.harness.runner import _build_model, _collection_for
    cfg = RunConfig(**TINY, model_overrides={
        'sindy@EQ_4_D': {'sindy_threshold': 0.05}})
    coll = _collection_for('EQ_4_D', 'sindy', 0, 2.0, cfg,
                           Experiment.MAIN_TABLE)
    model = _build_model('sindy', 'EQ_4_D', coll, cfg,
                         Experiment.MAIN_TABLE, 0, domain_conf=2.0)
    assert model.cfg.sindy_threshold == 0.05


def test_paper_format_table():
    """Paper tabularx variant (results_utils.py:212-301): group rows,
    shaded/bolded INSITE cells, one table per n-step metric."""
    from insite_tpu.harness.results import (
        generate_main_results_table_paper_format)
    import pandas as pd
    rows = []
    for seed in (0, 1):
        for m in ('msm', 'insite'):
            rows.append({'dataset_name': 'EQ_4_D', 'method_name': m,
                         'seed': seed,
                         'encoder_test_rmse_orig': 0.5 + 0.1 * seed,
                         'decoder_test_rmse_2-step': 0.6 + 0.1 * seed,
                         'decoder_test_rmse_6-step': 0.7 + 0.1 * seed})
    tables = generate_main_results_table_paper_format(pd.DataFrame(rows))
    assert set(tables) == {'decoder_test_rmse_2-step',
                           'decoder_test_rmse_6-step'}
    t = tables['decoder_test_rmse_6-step']
    assert r'\begin{tabularx}' in t and r'\rotatebox{90}{\bf ODE-D}' in t
    assert r'\CC{black!5} INSITE' in t and r'\CC{black!5} {\bf' in t
    assert 'MSM' in t and r'\cref{eq:one-compartment-pkpd}.D' in t
    assert r'\multirow{1}{*}{\rotatebox{90}{\bf LTE}}' in t
    # ODE-only logs must not emit a dangling LTE group header
    # (uncompilable \multirow immediately followed by \midrule)
    ode_only = generate_main_results_table_paper_format(
        pd.DataFrame([{'dataset_name': 'EQ_4_D', 'method_name': 'insite',
                       'seed': s, 'decoder_test_rmse_6-step': 0.1 + s}
                      for s in (0, 1)]))
    t2 = ode_only['decoder_test_rmse_6-step']
    assert 'LTE' not in t2
    assert r'\multirow{1}{*}{\rotatebox{90}{\bf ODE-D}}' in t2


def test_successive_halving_search_promotes_survivors():
    """The adaptive tuner spends most budget on configs that win early
    rungs, and the returned model is trained at the full budget."""
    from insite_tpu.harness.tuning import successive_halving_search

    fitted = []

    class _Stub:
        def __init__(self, params):
            self.params = params

        def get_normalised_masked_rmse(self, val_f):
            # config quality = |x - 3|; more epochs always helps a bit
            p = self.params
            return 0.0, abs(p['x'] - 3) + 10.0 / p['epochs']

    def build_and_fit(params):
        fitted.append(dict(params))
        return _Stub(params)

    space = {'x': [0, 1, 2, 3, 4, 5]}
    best, model, trials = successive_halving_search(
        build_and_fit, space, val_f=None, n_trials=6, eta=3,
        min_budget=4, max_budget=36)
    assert best == {'x': 3}
    assert model.params['epochs'] == 36      # winner refit at full budget
    budgets = sorted({f['epochs'] for f in fitted})
    assert budgets == [4, 12, 36]            # geometric rungs
    # rung sizes shrink: 6 -> 2 -> 1
    from collections import Counter
    c = Counter(f['epochs'] for f in fitted)
    assert c[4] == 6 and c[12] == 2 and c[36] == 1


def test_multi_log_dedup_is_newest_by_timestamp(tmp_path):
    """process_result_file combines logs newest-first by each row's
    LOGGING timestamp, not argument order: an older log passed later on
    the command line must not shadow a newer re-run of the same
    (dataset, method, seed) (the round-2 'contradictory cells' bug)."""
    import json
    import subprocess
    import sys

    def row(ts, rmse):
        d = {'encoder_test_rmse_orig': rmse, 'encoder_test_rmse_all': rmse,
             'encoder_test_rmse_last': rmse,
             'decoder_test_rmse_6-step': rmse, 'method': 'sindy',
             'seed': 0, 'seconds_taken': 1.0, 'errored': False,
             'dataset_name': 'EQ_4_D', 'method_name': 'sindy',
             'domain_conf': 2.0}
        return f'{ts} INFO [Exp evaluation complete] {d}\n'

    new_log = tmp_path / 'new.txt'
    old_log = tmp_path / 'old.txt'
    new_log.write_text(row('2026-08-18 10:00:00,000', 1.0))
    old_log.write_text(row('2026-08-17 10:00:00,000', 9.0))
    out_csv = tmp_path / 'rows.csv'
    # older log passed LAST — must still lose to the newer row
    r = subprocess.run(
        [sys.executable, 'process_result_file.py', str(new_log),
         str(old_log), '--csv', str(out_csv)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    import pandas as pd
    df = pd.read_csv(out_csv)
    assert len(df) == 1
    assert float(df['encoder_test_rmse_orig'].iloc[0]) == 1.0
