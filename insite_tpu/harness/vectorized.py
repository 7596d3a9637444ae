"""Vectorized multi-seed benchmark: the reference's run-level parallelism
(`multiprocessing.Pool` over (seed, dataset, method) runs, run.py:91-131)
re-expressed the TPU way — every seed's ENTIRE pipeline (simulate cohort ->
build design -> STLSQ discovery -> INSITE fine-tune -> counterfactual
evaluation) is a pure function of its PRNG key, so a seed sweep is one
`vmap` and the whole main-table column runs in a single XLA dispatch.

Scope: the EQ_4 family with the SINDy/INSITE methods (the fully-on-device
path). Key discipline replicates `PkpdDatasetCollection.subset` exactly
(fresh PRNGKey(seed), one split for params, one for the simulator), so
per-seed cohorts match the standard harness bit-for-bit; discovery uses
the on-device f32 gram STLSQ (highest-precision einsums) rather than the
standard path's host f64 solve, so coefficients agree to f32 tolerance
rather than bitwise.
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
              library, threshold, alpha, lam, insite, dt, gn_iters,
              projection_horizon):
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
        if mode == 'cf_seq':
            return pkpd._simulate_cf_seq_full(
                params, sub, seq_length, projection_horizon,
                'sliding_treatment', add_noise, dtype=dtype)
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
        # NOTE: the factual/cf row pair of each prefix share a masked
        # objective, so a per-prefix dedup (like the n-step branch below)
        # would halve this fine-tune — but adding a second
        # dedup+gather+rollout structure to the program tripped an opaque
        # 'TPU backend error (Internal)' at 10 vmapped seeds, so the
        # one-step branch fine-tunes per row
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

    # ---- n-step: treatment-sequence counterfactual rows ------------------
    ph = projection_horizon
    s_rows, s_actions, s_lengths, s_st0, s_st1 = cohort(n_test, 'cf_seq')
    T_out = seq_length + ph
    N2 = n_test * (seq_length - 1) * 2 * ph
    s_rows = s_rows.reshape(N2, T_out)
    s_actions = s_actions.reshape(N2, T_out)
    s_lengths = s_lengths.reshape(N2)
    s_statics = jnp.stack([s_st0, s_st1], axis=-1)
    s_prev = s_rows[:, :-1]
    s_arms = s_actions[:, :-1].astype(jnp.int32)
    if insite:
        # all 2*ph plan rows of one (patient, prefix) share the factual
        # prefix, so their fine-tune objectives (masked to the prefix) are
        # identical — solve one GN problem per prefix and gather, a 2*ph x
        # reduction in fine-tune work and jacfwd memory
        n_pref = seq_length - 1
        P2 = 2 * ph

        def rep(x):
            return x.reshape(n_test, n_pref, P2, *x.shape[1:])[:, :, 0] \
                .reshape(n_test * n_pref, *x.shape[1:])

        _, coefs_pref = insite_gn_finetune_predict(
            library, coefs, rep(s_prev), rep(s_statics), rep(s_arms),
            rep(s_lengths), dt, lam, projection_horizon=ph, joint=False,
            gn_iters=gn_iters)
        coefs_rows = jnp.repeat(
            coefs_pref.reshape(n_test, n_pref, 1, *coefs_pref.shape[1:]),
            P2, axis=2).reshape(N2, *coefs_pref.shape[1:])
        s_preds = batched_rollout(library, coefs_rows, s_prev[:, 0],
                                  s_statics, s_arms, dt, joint=False,
                                  shared_coefs=False)
    else:
        s_preds = batched_rollout(library, coefs[None], s_prev[:, 0],
                                  s_statics, s_arms, dt, joint=False,
                                  shared_coefs=True)
    # slice the last-ph window (sindy.py:729-733 / dataset sequential test):
    # targets are s_rows[fact+1 .. fact+ph] = outputs[fact .. fact+ph-1]
    # with fact = L - ph; preds index t predicts vol[t+1]
    fact = (s_lengths - ph).astype(jnp.int32)
    win = fact[:, None] + jnp.arange(ph)[None, :]          # [N2, ph]
    ridx = jnp.arange(N2)[:, None]
    pred_win = s_preds[ridx, win]
    target_win = s_rows[:, 1:][ridx, win]
    n_step_rmses = jnp.sqrt(
        jnp.mean((pred_win - target_win) ** 2, axis=0)) / MAX_VALUE * 100.0
    return rmse_orig, rmse_all, rmse_last, n_step_rmses, coefs


@partial(jax.jit, static_argnames=('equation_str', 'n_train', 'n_test',
                                   'seq_length', 'insite', 'gn_iters',
                                   'projection_horizon'))
def _sweep_jit(keys, equation_str, n_train, n_test, seq_length,
               conf_coeff, threshold, alpha, lam, insite, gn_iters,
               projection_horizon):
    equation = pkpd.Equation[equation_str]
    library = PolynomialLibrary(n_inputs=3)
    fn = partial(_one_seed, equation=equation, n_train=n_train,
                 n_test=n_test, seq_length=seq_length,
                 conf_coeff=conf_coeff, library=library,
                 threshold=threshold, alpha=alpha, lam=lam, insite=insite,
                 dt=STANDARD_DT, gn_iters=gn_iters,
                 projection_horizon=projection_horizon)
    return jax.vmap(fn)(keys)


def vectorized_eq4_sweep(equation_str: str, n_seeds: int = 10,
                         n_train: int = 1000, n_test: int = 100,
                         seq_length: int = 60, conf_coeff: float = 2.0,
                         threshold: float = 0.1, alpha: float = 0.5,
                         lam: float = 10.0, method: str = 'insite',
                         gn_iters: int = 12, projection_horizon: int = 5,
                         mesh=None) -> dict:
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
    out = _sweep_jit(
        keys, equation_str, n_train, n_test, seq_length,
        float(conf_coeff), float(threshold), float(alpha), float(lam),
        method == 'insite', gn_iters, projection_horizon)
    rmse_orig, rmse_all, rmse_last, n_step, coefs = jax.device_get(out)
    from insite_tpu.harness.results import ci
    res = {
        'encoder_test_rmse_orig': rmse_orig,
        'encoder_test_rmse_all': rmse_all,
        'encoder_test_rmse_last': rmse_last,
        'global_coefs': coefs,
        'mean': float(np.mean(rmse_orig)),
        'ci95': float(ci(rmse_orig)) if n_seeds > 1 else 0.0,
    }
    for k in range(n_step.shape[1]):       # [S, ph] -> per-horizon columns
        res[f'decoder_test_rmse_{k + 2}-step'] = n_step[:, k]
    return res


def vectorized_confounding_sweep(equation_str: str = 'EQ_4_D',
                                 gammas=(0.0, 1.0, 2.0, 3.0, 4.0),
                                 n_seeds: int = 10, n_train: int = 1000,
                                 n_test: int = 100, seq_length: int = 60,
                                 method: str = 'insite', threshold=0.1,
                                 alpha=0.5, lam=10.0, gn_iters: int = 12,
                                 projection_horizon: int = 5) -> dict:
    """The INSIGHT_CONFOUNDING experiment (run.py:105-114: method x gamma x
    seed grid) as ONE dispatch: conf_coeff is a traced scalar in the
    per-seed pipeline, so the whole (gamma, seed) grid is a nested vmap.
    Returns {'gammas': [G], '<metric>': [G, S] arrays}."""
    assert 'EQ_4' in equation_str and method in ('insite', 'sindy')
    keys = jnp.stack([jax.random.PRNGKey(s) for s in range(n_seeds)])
    gam = jnp.asarray(gammas, jnp.float32)

    def for_gamma(g):
        return _sweep_jit(keys, equation_str, n_train, n_test, seq_length,
                          g, float(threshold), float(alpha), float(lam),
                          method == 'insite', gn_iters, projection_horizon)

    out = jax.jit(jax.vmap(for_gamma))(gam)
    rmse_orig, rmse_all, rmse_last, n_step, _ = jax.device_get(out)
    res = {'gammas': np.asarray(gammas),
           'encoder_test_rmse_orig': rmse_orig,     # [G, S]
           'encoder_test_rmse_all': rmse_all,
           'encoder_test_rmse_last': rmse_last}
    for k in range(n_step.shape[2]):
        res[f'decoder_test_rmse_{k + 2}-step'] = n_step[:, :, k]
    return res
