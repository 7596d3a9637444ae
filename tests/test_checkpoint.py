"""Checkpoint/resume — framework features the reference lacks entirely
(SURVEY.md §5: "Checkpoint / resume: none"; "Resume-a-sweep = re-run").

- save_model/load_model round-trips every estimator family: a freshly
  constructed model restored from disk must predict identically.
- sweep(resume_log=...) reuses completed rows from a previous log and only
  runs the remainder.
"""

import numpy as np
import pytest

from insite_tpu.data import PkpdDatasetCollection
from insite_tpu.harness.checkpoint import load_model, save_model

TINY = {'train': 32, 'val': 8, 'test': 6}
SEQ = 20


def make_coll(treatment_mode='multilabel'):
    return PkpdDatasetCollection(
        conf_coeff=2.0, num_patients=dict(TINY), equation_str='EQ_4_D',
        seed=0, max_seq_length=SEQ, treatment_mode=treatment_mode)


def dims(coll):
    d = coll.train_f.data
    return dict(dim_outcome=d['outputs'].shape[-1],
                dim_treatments=d['current_treatments'].shape[-1],
                dim_static_features=d['static_features'].shape[-1])


def _roundtrip(model, fresh, coll, tmp_path, kind):
    path = save_model(model, str(tmp_path / kind))
    load_model(fresh, path)
    want = model.get_predictions(coll.test_cf_one_step)
    got = fresh.get_predictions(coll.test_cf_one_step)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sindy_checkpoint_roundtrip(tmp_path):
    from insite_tpu.models.sindy import SINDyConfig, SINDyRegressor
    coll = make_coll('multiclass')
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, insite=False,
                      treatment_mode='multiclass')
    m = SINDyRegressor(cfg, coll).fit(coll.train_f)
    fresh = SINDyRegressor(cfg, coll)
    _roundtrip(m, fresh, coll, tmp_path, 'sindy')
    assert fresh.global_equation_string == m.global_equation_string


def test_ct_checkpoint_roundtrip(tmp_path):
    from insite_tpu.models.ct import CTConfig, CausalTransformer
    coll = make_coll()
    coll.process_data_multi()
    cfg = CTConfig(epochs=2, seed=0, treatment_mode='multilabel',
                   **dims(coll))
    m = CausalTransformer(cfg, coll).fit(coll.train_f)
    fresh = CausalTransformer(cfg, coll)
    _roundtrip(m, fresh, coll, tmp_path, 'ct')


def test_checkpoint_class_mismatch(tmp_path):
    from insite_tpu.models.ct import CTConfig, CausalTransformer
    from insite_tpu.models.sindy import SINDyConfig, SINDyRegressor
    coll = make_coll('multiclass')
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, insite=False,
                      treatment_mode='multiclass')
    m = SINDyRegressor(cfg, coll).fit(coll.train_f)
    path = save_model(m, str(tmp_path / 'sindy'))
    other = CausalTransformer(CTConfig(**dims(coll)))
    with pytest.raises(ValueError, match='checkpoint is a'):
        load_model(other, path)


def test_sweep_resume_skips_completed(tmp_path, monkeypatch):
    """A resumed sweep reuses logged rows and only executes the rest."""
    import logging

    from insite_tpu.harness import runner as runner_mod
    from insite_tpu.harness.config import RunConfig
    from insite_tpu.harness.runner import Experiment

    base = dict(train_samples=40, val_samples=8, test_samples=6,
                seed_runs=2, debug_mode=True, metrics_jsonl='')

    log_path = tmp_path / 'first.txt'
    handler = logging.FileHandler(log_path)
    log = logging.getLogger('resume_test')
    log.setLevel(logging.INFO)
    log.addHandler(handler)

    # first sweep: 1 seed only
    cfg1 = RunConfig(methods=('sindy',), datasets=('EQ_4_D',), **{
        **base, 'seed_runs': 1})
    df1, _ = runner_mod.sweep(cfg1, Experiment.MAIN_TABLE, log=log)
    handler.flush()
    assert len(df1) == 1

    # second sweep: 2 seeds, resuming — seed 0 must NOT re-run
    calls = []
    real_run = runner_mod.run_experiment

    def counting_run(*a, **k):
        calls.append(a[:3])
        return real_run(*a, **k)

    monkeypatch.setattr(runner_mod, 'run_experiment', counting_run)
    cfg2 = RunConfig(methods=('sindy',), datasets=('EQ_4_D',),
                     resume_log=str(log_path), **base)
    df2, _ = runner_mod.sweep(cfg2, Experiment.MAIN_TABLE, log=log)
    assert len(df2) == 2
    assert calls == [('EQ_4_D', 'sindy', 1)]   # only the new seed ran
    # the reused row carries the original metrics
    reused = df2[df2['seed'] == 0].iloc[0]
    orig = df1.iloc[0]
    assert float(reused['encoder_test_rmse_orig']) == \
        pytest.approx(float(orig['encoder_test_rmse_orig']))


def test_sweep_resume_refuses_config_mismatch(tmp_path, monkeypatch):
    """Rows logged under a different sweep config (e.g. a smoke run with
    fewer epochs) must NOT be reused as this sweep's results."""
    import logging

    from insite_tpu.harness import runner as runner_mod
    from insite_tpu.harness.config import RunConfig
    from insite_tpu.harness.runner import Experiment

    base = dict(train_samples=40, val_samples=8, test_samples=6,
                seed_runs=1, debug_mode=True, metrics_jsonl='')

    log_path = tmp_path / 'smoke.txt'
    handler = logging.FileHandler(log_path)
    log = logging.getLogger('resume_fp_test')
    log.setLevel(logging.INFO)
    log.addHandler(handler)

    # smoke sweep at a tiny cohort / different epochs
    cfg1 = RunConfig(methods=('sindy',), datasets=('EQ_4_D',), epochs=7,
                     **base)
    runner_mod.sweep(cfg1, Experiment.MAIN_TABLE, log=log)
    handler.flush()

    calls = []
    real_run = runner_mod.run_experiment

    def counting_run(*a, **k):
        calls.append(a[:3])
        return real_run(*a, **k)

    monkeypatch.setattr(runner_mod, 'run_experiment', counting_run)
    # resumed sweep differs on epochs -> every run must execute fresh
    cfg2 = RunConfig(methods=('sindy',), datasets=('EQ_4_D',), epochs=9,
                     resume_log=str(log_path), **base)
    df2, _ = runner_mod.sweep(cfg2, Experiment.MAIN_TABLE, log=log)
    assert len(df2) == 1
    assert calls == [('EQ_4_D', 'sindy', 0)]   # re-ran despite resume_log


def test_sweep_resume_refuses_multi_fingerprint_log(tmp_path, monkeypatch):
    """A log holding SEVERAL appended sweeps must be verified against every
    fingerprint: rows written under an earlier, different config may hide
    behind a matching last fingerprint (ADVICE r2)."""
    import logging

    from insite_tpu.harness import runner as runner_mod
    from insite_tpu.harness.config import RunConfig
    from insite_tpu.harness.runner import Experiment

    base = dict(train_samples=40, val_samples=8, test_samples=6,
                seed_runs=1, debug_mode=True, metrics_jsonl='')

    log_path = tmp_path / 'appended.txt'
    handler = logging.FileHandler(log_path)
    log = logging.getLogger('resume_multifp_test')
    log.setLevel(logging.INFO)
    log.addHandler(handler)

    # sweep 1: epochs=7 writes rows into the log
    cfg1 = RunConfig(methods=('sindy',), datasets=('EQ_4_D',), epochs=7,
                     **base)
    runner_mod.sweep(cfg1, Experiment.MAIN_TABLE, log=log)
    # sweep 2 APPENDS to the same log at epochs=9 (its fingerprint is now
    # the last one in the file) but covers a different dataset, so the
    # epochs=7 EQ_4_D row is still the only EQ_4_D row present
    cfg2 = RunConfig(methods=('sindy',), datasets=('EQ_4_A',), epochs=9,
                     **base)
    runner_mod.sweep(cfg2, Experiment.MAIN_TABLE, log=log)
    handler.flush()

    calls = []
    real_run = runner_mod.run_experiment

    def counting_run(*a, **k):
        calls.append(a[:3])
        return real_run(*a, **k)

    monkeypatch.setattr(runner_mod, 'run_experiment', counting_run)
    # resume at epochs=9: the last fingerprint matches, but the EQ_4_D row
    # was written under epochs=7 — resume must refuse and re-run it
    cfg3 = RunConfig(methods=('sindy',), datasets=('EQ_4_D',), epochs=9,
                     resume_log=str(log_path), **base)
    df3, _ = runner_mod.sweep(cfg3, Experiment.MAIN_TABLE, log=log)
    assert len(df3) == 1
    assert calls == [('EQ_4_D', 'sindy', 0)]   # re-ran despite resume_log


@pytest.mark.parametrize('kind', ['msm', 'gnet', 'rmsn', 'crn', 'edct'])
def test_remaining_families_roundtrip(tmp_path, kind):
    coll = make_coll()
    if kind in ('crn', 'rmsn', 'edct'):
        coll.process_data_encoder()
    else:
        coll.process_data_multi()
    d = dims(coll)
    if kind == 'msm':
        from insite_tpu.models.msm import MSM, MSMConfig
        cfg = MSMConfig(max_epochs=2, **d)
        m, fresh = MSM(cfg, coll), MSM(cfg, coll)
    elif kind == 'gnet':
        from insite_tpu.models.gnet import GNet, GNetConfig
        cfg = GNetConfig(epochs=2, seed=0, mc_samples=2, **d)
        m, fresh = GNet(cfg, coll), GNet(cfg, coll)
    elif kind == 'rmsn':
        from insite_tpu.models.rmsn import RMSN, RMSNConfig
        cfg = RMSNConfig(epochs=2, seed=0, treatment_mode='multilabel', **d)
        m, fresh = RMSN(cfg, coll), RMSN(cfg, coll)
    elif kind == 'crn':
        from insite_tpu.models.crn import CRN, CRNConfig
        cfg = CRNConfig(epochs=2, seed=0, treatment_mode='multilabel', **d)
        m, fresh = CRN(cfg, coll), CRN(cfg, coll)
    else:
        from insite_tpu.models.edct import EDCT, EDCTConfig
        cfg = EDCTConfig(epochs=2, seed=0, treatment_mode='multilabel', **d)
        m, fresh = EDCT(cfg, coll), EDCT(cfg, coll)
    m.fit(coll.train_f, coll.val_f)
    _roundtrip(m, fresh, coll, tmp_path, kind)
