"""Tests for the aux subsystems: metrics logging, profiling helpers,
figure toolkit, and the real-data collection (SURVEY.md §5)."""

import json
import os

import numpy as np
import pandas as pd
import pytest


def test_metrics_logger_jsonl(tmp_path):
    from insite_tpu.harness.metrics_logger import MetricsLogger
    path = str(tmp_path / 'metrics.jsonl')
    ml = MetricsLogger(path, run_name='test-run')
    ml.log_params({'lam': 10.0, 'nested': {'a': 1}, 'multi': {'b': 2}},
                  submodel='multi')
    ml.log_metrics({'val_rmse_all': 0.5, 'skipped_str': 'x'}, step=3)
    ml.finish()
    recs = [json.loads(line) for line in open(path)]
    assert len(recs) == 2
    assert recs[0]['kind'] == 'params'
    assert 'nested' not in recs[0]          # filtered: other submodel
    assert 'multi' in recs[0]
    assert recs[1] == pytest.approx(
        {**recs[1], 'val_rmse_all': 0.5, 'step': 3})
    assert 'skipped_str' not in recs[1]


def test_time_blocked():
    import jax.numpy as jnp
    from insite_tpu.utils import time_blocked
    secs, result = time_blocked(lambda x: jnp.sum(x * 2), jnp.ones(16),
                                reps=2)
    assert secs >= 0
    assert float(result) == 32.0


def test_plots_render(tmp_path):
    from insite_tpu.harness.plots import (plot_confounding_sweep,
                                          plot_n_step_rmses)
    rows = []
    for method in ('insite', 'ct'):
        for seed in range(3):
            for gamma in (0.0, 2.0):
                rows.append({
                    'dataset_name': 'EQ_4_D', 'method_name': method,
                    'seed': seed, 'domain_conf': gamma, 'errored': False,
                    'encoder_test_rmse_orig': np.random.rand(),
                    **{f'decoder_test_rmse_{k}-step': np.random.rand()
                       for k in range(2, 7)}})
    df = pd.DataFrame(rows)
    p1 = plot_n_step_rmses(df, str(tmp_path / 'nstep.png'))
    p2 = plot_confounding_sweep(df, str(tmp_path / 'conf.png'))
    assert os.path.getsize(p1) > 1000
    assert os.path.getsize(p2) > 1000


def test_sample_efficiency_plot_renders(tmp_path):
    from insite_tpu.harness.plots import plot_sample_efficiency
    rows = [{'method_name': m, 'seed': s, 'train_samples': n,
             'errored': False, 'encoder_test_rmse_orig': np.random.rand()}
            for m in ('insite', 'sindy') for s in range(2)
            for n in (50, 250, 1000)]
    p = plot_sample_efficiency(pd.DataFrame(rows),
                               str(tmp_path / 'less.png'))
    assert os.path.getsize(p) > 1000


def test_confounding_figure_cli_multi_metric(tmp_path):
    """make_figures.confounding_figure emits one panel per metric
    (the reference's per-horizon overlap graphs, results_utils.py:680-727)."""
    from make_figures import confounding_figure
    rng = np.random.default_rng(0)
    grid = {m: {'gammas': [0.0, 2.0],
                'encoder_test_rmse_orig': rng.random((2, 3)).tolist(),
                'decoder_test_rmse_6-step': rng.random((2, 3)).tolist()}
            for m in ('insite', 'sindy')}
    path = tmp_path / 'conf.json'
    path.write_text(json.dumps(grid))
    outs = confounding_figure(str(path), str(tmp_path), metrics=['all'])
    assert len(outs) == 2
    names = {os.path.basename(o) for o in outs}
    assert names == {'confounding_sweep.png',
                     'confounding_sweep_decoder_test_rmse_6-step.png'}
    for o in outs:
        assert os.path.getsize(o) > 1000


def test_recovered_dist_plot_renders(tmp_path):
    from insite_tpu.harness.plots import plot_recovered_dist
    rng = np.random.default_rng(0)
    rec = {}
    for a in range(2):
        true = rng.normal(0.4 + 0.5 * a, 0.05, 50)
        rec[f'arm{a}'] = {'true': true.tolist(),
                          'recovered': (true + rng.normal(0, 0.005, 50))
                          .tolist()}
    p = plot_recovered_dist(rec, str(tmp_path / 'rec.png'))
    assert os.path.getsize(p) > 1000


def test_real_dataset_collection():
    """Factual-only collection drives CT end-to-end without counterfactual
    ground truth (dataset_collection.py:113-205)."""
    import copy
    from insite_tpu.data import PkpdDatasetCollection
    from insite_tpu.data.collection import RealDatasetCollection

    syn = PkpdDatasetCollection(
        conf_coeff=2.0, num_patients={'train': 24, 'val': 8, 'test': 6},
        equation_str='EQ_4_D', seed=0, max_seq_length=16,
        treatment_mode='multilabel')
    syn.process_data_encoder()   # processes train/val/test_cf_one_step
    real = RealDatasetCollection(
        train_f=copy.deepcopy(syn.train_f), val_f=copy.deepcopy(syn.val_f),
        test_f=copy.deepcopy(syn.test_cf_one_step),
        projection_horizon=5, treatment_mode='multilabel')
    real.process_data_multi()
    assert real.processed_data_multi
    d = real.test_f_multi.data
    assert 'future_past_split' in d

    from insite_tpu.models.ct import CausalTransformer, CTConfig
    dd = real.train_f.data
    cfg = CTConfig(epochs=1, seed=0, treatment_mode='multilabel',
                   batch_size=8,
                   dim_outcome=dd['outputs'].shape[-1],
                   dim_treatments=dd['current_treatments'].shape[-1],
                   dim_static_features=dd['static_features'].shape[-1])
    m = CausalTransformer(cfg, real)
    m.fit(real.train_f, real.val_f)
    orig, all_ = m.get_normalised_masked_rmse(real.test_f)
    assert np.isfinite([orig, all_]).all()
    n_step = m.get_normalised_n_step_rmses(real.test_cf_treatment_seq)
    assert np.isfinite(np.asarray(n_step)).all()


def test_debug_shims():
    import jax
    import jax.numpy as jnp
    from insite_tpu.utils.debug import (debug_scan, debug_vmap,
                                        find_nonfinite)

    def f(x, s):
        return x * 2 + s

    xs = jnp.arange(6.0).reshape(3, 2)
    out = debug_vmap(f, (xs, jnp.asarray(1.0)), in_axes=(0, None))
    np.testing.assert_array_equal(out, jax.vmap(f, (0, None))(
        xs, jnp.asarray(1.0)))

    def step(c, x):
        return c + x, c

    c1, ys1 = debug_scan(step, jnp.asarray(0.0), jnp.arange(4.0))
    c2, ys2 = jax.lax.scan(step, jnp.asarray(0.0), jnp.arange(4.0))
    assert float(c1) == float(c2)
    np.testing.assert_array_equal(ys1, ys2)

    bad = find_nonfinite({'a': jnp.array([1.0, jnp.nan]),
                          'b': jnp.ones(2)})
    assert len(bad) == 1 and "'a'" in list(bad)[0]


def test_runconfig_from_yaml(tmp_path):
    from insite_tpu.harness.config import RunConfig
    p = tmp_path / 'sweep.yaml'
    p.write_text('methods: [sindy, insite]\nseed_runs: 3\nepochs: 5\n')
    cfg = RunConfig.from_yaml(str(p), epochs=7)
    assert cfg.methods == ('sindy', 'insite')
    assert cfg.seed_runs == 3
    assert cfg.epochs == 7          # kwarg override wins
    p2 = tmp_path / 'bad.yaml'
    p2.write_text('not_a_field: 1\n')
    with pytest.raises(ValueError):
        RunConfig.from_yaml(str(p2))
