"""Vectorized multi-seed benchmark: the reference's run-level parallelism
(`multiprocessing.Pool` over (seed, dataset, method) runs, run.py:91-131)
re-expressed the TPU way — every seed's ENTIRE pipeline (simulate cohort ->
build design -> STLSQ discovery -> INSITE fine-tune -> counterfactual
evaluation) is a pure function of its PRNG key, so a seed sweep is one
`vmap` and the whole main-table column runs in a single XLA dispatch.

Scope: the EQ_4 family with the SINDy/INSITE methods (the fully-on-device
path). Key discipline replicates `PkpdDatasetCollection.subset` exactly
(fresh PRNGKey(seed), one split for params, one for the simulator), so
per-seed cohorts match the standard harness bit-for-bit; discovery uses the
on-device QR STLSQ rather than the host solve, so coefficients agree to
f32 tolerance rather than bitwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from insite_tpu.core.constants import MAX_VALUE, STANDARD_DT
from insite_tpu.discovery.library import PolynomialLibrary
from insite_tpu.discovery.stlsq import stlsq
from insite_tpu.models.sindy import (_eq4_design, batched_rollout,
                                     insite_gn_finetune_predict)
from insite_tpu.sim import pkpd


def _one_seed(key, equation, n_train, n_test, seq_length, conf_coeff,
              library, threshold, alpha, lam, insite, dt, gn_iters):
    """Pure per-seed pipeline; all shapes static across seeds."""
    add_noise = equation.name.split('_')[-1] in ('B', 'C', 'D')
    from insite_tpu.core.dtypes import default_float
    dtype = default_float()

    def cohort(n, mode):
        # PkpdDatasetCollection.subset key discipline (collection.py:127-146)
        k = key
        k, sub = jax.random.split(k)
        params = pkpd.get_standard_params(n, equation, sub)
        params = dict(params)
        params['observation_noise'] = pkpd.OBSERVATION_NOISE
        params['sigmoid_intercept'] = MAX_VALUE / 2.0
        params['sigmoid_gamma'] = conf_coeff / MAX_VALUE
        k, sub = jax.random.split(k)
        if mode == 'factual':
            return pkpd._simulate_factual_full(params, sub, seq_length,
                                               add_noise, dtype=dtype)
        return pkpd._simulate_cf_1_step_full(params, sub, seq_length,
                                             add_noise, dtype=dtype)

    # ---- train: simulate + design + per-arm STLSQ -----------------------
    volumes, treatments, lengths = cohort(n_train, 'factual')[:3]
    # same sub-key as cohort()'s params draw -> identical statics
    params_t = pkpd.get_standard_params(n_train, equation,
                                        jax.random.split(key)[1])
    statics = jnp.stack([params_t['observed_static_c_0'],
                         params_t['observed_static_c_1']], axis=-1)
    arms = treatments[:, :-1].astype(jnp.int32)
    eff_len = jnp.maximum(lengths - 1, 2)
    flat_theta, flat_y, flat_ok, flat_arm = _eq4_design(
        volumes, statics, arms, eff_len, dt, library=library, joint=False,
        smooth=True, fd_order=4)
    coefs = []
    for a in range(2):
        w = (flat_ok & (flat_arm == a)).astype(flat_theta.dtype)
        c, _ = stlsq(flat_theta, flat_y, threshold, alpha, sample_weight=w)
        coefs.append(c)
    coefs = jnp.stack(coefs)

    # ---- test: 1-step counterfactual rows + prediction + masked RMSE ----
    rows, actions, row_lengths, st0, st1 = cohort(n_test, 'cf_one_step')
    N = n_test * 2 * (seq_length - 1)
    rows = rows.reshape(N, seq_length)
    actions = actions.reshape(N, seq_length)
    row_lengths = row_lengths.reshape(N)
    row_statics = jnp.stack([st0, st1], axis=-1)

    prev = rows[:, :-1]
    target = rows[:, 1:]
    row_arms = actions[:, :-1].astype(jnp.int32)
    if insite:
        preds, _ = insite_gn_finetune_predict(
            library, coefs, prev, row_statics, row_arms, row_lengths, dt,
            lam, projection_horizon=1, joint=False, gn_iters=gn_iters)
    else:
        preds = batched_rollout(library, coefs[None], prev[:, 0],
                                row_statics, row_arms, dt, joint=False,
                                shared_coefs=True)

    T1 = seq_length - 1
    active = (jnp.arange(T1)[None, :] < row_lengths[:, None]) \
        .astype(rows.dtype)                                   # [N, T-1]
    se = ((preds - target) ** 2) * active
    mse_orig = jnp.mean(jnp.sum(se, 0) / jnp.maximum(jnp.sum(active, 0), 1))
    rmse_orig = jnp.sqrt(mse_orig) / MAX_VALUE * 100.0
    rmse_all = jnp.sqrt(jnp.sum(se) / jnp.sum(active)) / MAX_VALUE * 100.0
    last = active - jnp.concatenate(
        [active[:, 1:], jnp.zeros((N, 1), active.dtype)], axis=1)
    rmse_last = jnp.sqrt(
        jnp.sum(se * last) / jnp.sum(last)) / MAX_VALUE * 100.0
    return rmse_orig, rmse_all, rmse_last, coefs


@partial(jax.jit, static_argnames=('equation_str', 'n_train', 'n_test',
                                   'seq_length', 'insite', 'gn_iters'))
def _sweep_jit(keys, equation_str, n_train, n_test, seq_length,
               conf_coeff, threshold, alpha, lam, insite, gn_iters):
    equation = pkpd.Equation[equation_str]
    library = PolynomialLibrary(n_inputs=3)
    fn = partial(_one_seed, equation=equation, n_train=n_train,
                 n_test=n_test, seq_length=seq_length,
                 conf_coeff=conf_coeff, library=library,
                 threshold=threshold, alpha=alpha, lam=lam, insite=insite,
                 dt=STANDARD_DT, gn_iters=gn_iters)
    return jax.vmap(fn)(keys)


def vectorized_eq4_sweep(equation_str: str, n_seeds: int = 10,
                         n_train: int = 1000, n_test: int = 100,
                         seq_length: int = 60, conf_coeff: float = 2.0,
                         threshold: float = 0.1, alpha: float = 0.5,
                         lam: float = 10.0, method: str = 'insite',
                         gn_iters: int = 12, mesh=None) -> dict:
    """All seeds of one (EQ_4 dataset, method) benchmark cell in ONE
    dispatch. Returns per-seed arrays + mean/CI aggregates matching the
    log-table protocol.

    With a `mesh` (1-D batch mesh), the seed axis is sharded across
    devices — each chip runs its seeds' whole pipelines independently
    (embarrassingly parallel; no collectives), so the sweep scales
    linearly over ICI. n_seeds must then be a multiple of the mesh size.
    """
    assert 'EQ_4' in equation_str
    assert method in ('insite', 'sindy')
    keys = jnp.stack([jax.random.PRNGKey(s) for s in range(n_seeds)])
    if mesh is not None:
        # shard the seed axis: each chip runs its seeds' whole pipelines
        # independently (no collectives) — linear scaling over ICI
        assert n_seeds % mesh.devices.size == 0, \
            'n_seeds must be a multiple of the mesh size'
        from jax.sharding import NamedSharding, PartitionSpec as P
        keys = jax.device_put(
            keys, NamedSharding(mesh, P(mesh.axis_names[0])))
    rmse_orig, rmse_all, rmse_last, coefs = _sweep_jit(
        keys, equation_str, n_train, n_test, seq_length,
        float(conf_coeff), float(threshold), float(alpha), float(lam),
        method == 'insite', gn_iters)
    rmse_orig, rmse_all, rmse_last, coefs = jax.device_get(
        (rmse_orig, rmse_all, rmse_last, coefs))
    from insite_tpu.harness.results import ci
    return {
        'encoder_test_rmse_orig': rmse_orig,
        'encoder_test_rmse_all': rmse_all,
        'encoder_test_rmse_last': rmse_last,
        'global_coefs': coefs,
        'mean': float(np.mean(rmse_orig)),
        'ci95': float(ci(rmse_orig)) if n_seeds > 1 else 0.0,
    }
