"""Vectorized neural seed sweeps: train a whole seed column of the Causal
Transformer as ONE vmapped XLA dispatch.

The reference trains each (dataset, seed) neural run in its own Lightning
process (run.py:91-131, ~49 s per CT run); here the per-seed training
program (`make_br_train_fn`) is pure in (params, data, rng), so a seed
column becomes `jit(vmap(run))` over stacked cohorts — the tiny per-model
matmuls (hidden 16, seq 65) widen by the seed axis onto the MXU and the
whole column trains in roughly one seed's wall-clock.

Cohorts are the standard per-seed collections (np.random draw-order parity
with the reference); only training/inference is vectorized, so the metrics
are computed with the exact per-seed evaluation protocol
(eval/metrics.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from insite_tpu.data import make_collection
from insite_tpu.eval.metrics import (normalised_masked_rmse,
                                     normalised_n_step_rmses)
from insite_tpu.models.ct import _BATCH_KEYS


def _stack_padded(dicts, keys):
    """Stack per-seed data dicts to [S, N_max, ...], zero-padding rows."""
    n_rows = [np.asarray(d[keys[0]]).shape[0] for d in dicts]
    n_max = max(n_rows)
    out = {}
    for k in keys:
        leaves = []
        for d in dicts:
            v = np.asarray(d[k], np.float32)
            pad = n_max - v.shape[0]
            if pad:
                v = np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
            leaves.append(v)
        out[k] = np.stack(leaves)
    return out, n_rows


def _seed_sharding(mesh):
    """NamedSharding that splits the leading (seed) axis over a 1-D mesh,
    replicating every other axis."""
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))


def _shard_seed_axis(tree, mesh):
    sharding = _seed_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree)


def _predict_chunked(predict, params, data, chunk, mesh=None):
    """Run a seed-vmapped predict over row chunks of [S, N, ...] arrays.

    The CT attention maps materialize as [S, heads, T, T, N]-shaped
    fusions; at counterfactual-test scale (N ~ 6e4 rows x 10 seeds) one
    whole-set dispatch exceeds HBM. Chunks are padded to `chunk` rows so
    exactly one program is compiled; outputs are fetched with a single
    batched device_get. With a `mesh`, chunks are placed sharded over the
    seed axis so each chip evaluates only its own seeds.
    """
    n = next(iter(data.values())).shape[1]
    chunk = min(chunk, n)
    outs = []
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        piece = {}
        for k, v in data.items():
            p = v[:, start:end]
            if end - start < chunk:
                pad = np.zeros((p.shape[0], chunk - (end - start))
                               + p.shape[2:], p.dtype)
                p = np.concatenate([p, pad], axis=1)
            piece[k] = jnp.asarray(p) if mesh is None else \
                jax.device_put(p, _seed_sharding(mesh))
        outs.append(predict(params, piece)[:, :end - start])
    return np.concatenate(jax.device_get(outs), axis=1)


def vectorized_ct_sweep(dataset_name: str, n_seeds: int = 10,
                        num_patients: dict = None, coeff: float = 2.0,
                        epochs: int = 100, seed_start: int = 0,
                        eval_chunk: int = 4096, mesh=None) -> dict:
    """Train + evaluate CT for `n_seeds` seeds in one vmapped program.

    Returns {'encoder_test_rmse_orig'/'all'/'last': [S],
             'decoder_test_rmse_<k>-step': [S]} — the same metric keys as
    run_experiment, one value per seed.

    With a `mesh` (1-D device mesh, `parallel.batch_mesh()`), the seed
    axis of the stacked cohorts, params, and RNGs is sharded over the
    chips: seeds' training programs are independent, so the column
    scales linearly over ICI with no collectives on the training path.
    n_seeds must be a multiple of the mesh size.
    """
    from insite_tpu.models.ct import CTConfig, CTNetwork, ct_train_config
    from insite_tpu.models.nn.training import (make_br_train_fn,
                                               merge_by_mask,
                                               treatment_head_mask)
    num_patients = num_patients or {'train': 1000, 'val': 100, 'test': 100}

    # --- per-seed cohorts (standard path: reference draw-order parity) ----
    colls = []
    for seed in range(seed_start, seed_start + n_seeds):
        np.random.seed(seed)
        coll = make_collection(dataset_name, num_patients, seed,
                               coeff=float(coeff),
                               treatment_mode='multilabel')
        coll.process_data_multi()
        colls.append(coll)

    d = colls[0].train_f.data
    cfg = CTConfig(epochs=epochs,
                   dim_outcome=d['outputs'].shape[-1],
                   dim_treatments=d['current_treatments'].shape[-1],
                   dim_static_features=d['static_features'].shape[-1],
                   treatment_mode='multilabel')
    net = CTNetwork(cfg)

    if mesh is not None:
        assert n_seeds % mesh.devices.size == 0, \
            'n_seeds must be a multiple of the mesh size'

    train, _ = _stack_padded([c.train_f.data for c in colls], _BATCH_KEYS)
    train = {k: jnp.asarray(v) for k, v in train.items()} if mesh is None \
        else _shard_seed_axis(train, mesh)

    # --- per-seed init + one vmapped training dispatch --------------------
    sample = jax.tree_util.tree_map(lambda a: a[0, :2], train)
    rngs = jnp.stack([jax.random.PRNGKey(s)
                      for s in range(seed_start, seed_start + n_seeds)])
    if mesh is not None:
        rngs = _shard_seed_axis(rngs, mesh)

    def init_one(rng):
        r_init, r_drop = jax.random.split(rng)
        return net.init({'params': r_init, 'dropout': r_drop}, sample,
                        0.0, False, False)['params']

    params = jax.jit(jax.vmap(init_one))(rngs)
    mask = treatment_head_mask(
        jax.tree_util.tree_map(lambda a: a[0], params))

    tc = ct_train_config(cfg)

    def apply_fn(p, batch, alpha, train_flag, rngs_, detach):
        return net.apply({'params': p}, batch, alpha, train_flag, detach,
                         rngs=rngs_)

    run = make_br_train_fn(apply_fn, tc, mask)
    train_rngs = jax.vmap(lambda r: jax.random.fold_in(r, 1))(rngs)
    params, ema = jax.jit(jax.vmap(run))(params, train, train_rngs)
    # EMA weights for the non-treatment partition (predict_step,
    # time_varying_model.py:599-608); works on stacked trees
    pred_params = merge_by_mask(params, ema, mask) if cfg.weights_ema \
        else params

    predict = jax.jit(jax.vmap(
        lambda p, b: apply_fn(p, b, 0.0, False, None, False)[1]))

    # --- 1-step eval (exact per-seed metric on unpadded rows) -------------
    one_step, n_rows = _stack_padded(
        [c.test_cf_one_step.data for c in colls], _BATCH_KEYS)
    preds = _predict_chunked(predict, pred_params, one_step, eval_chunk,
                             mesh=mesh)
    res = {'encoder_test_rmse_orig': [], 'encoder_test_rmse_all': [],
           'encoder_test_rmse_last': []}
    for s, c in enumerate(colls):
        o, a, l = normalised_masked_rmse(c.test_cf_one_step,
                                         preds[s, :n_rows[s]],
                                         one_step_counterfactual=True)
        res['encoder_test_rmse_orig'].append(o)
        res['encoder_test_rmse_all'].append(a)
        res['encoder_test_rmse_last'].append(l)

    # --- n-step eval: the CT rolling-origin loop (ct.py:187-203) with a
    # seed axis — predictions written into prev_outputs at each seed's own
    # future_past_split ----------------------------------------------------
    ph = cfg.projection_horizon
    seq_sets = [c.test_cf_treatment_seq for c in colls]
    seq, seq_rows = _stack_padded([t.data for t in seq_sets], _BATCH_KEYS)
    split = np.stack([
        np.pad(np.asarray(t.data['future_past_split']).astype(int),
               (0, seq['outputs'].shape[1] - len(t.data['future_past_split'])),
               constant_values=1)
        for t in seq_sets])
    S, N = split.shape
    s_idx = np.arange(S)[:, None]
    n_idx = np.arange(N)[None, :]
    predicted = np.zeros((S, N, ph, cfg.dim_outcome), np.float32)
    for t in range(ph + 1):
        out = _predict_chunked(predict, pred_params, seq, eval_chunk,
                                mesh=mesh)
        if t < ph:
            seq['prev_outputs'][s_idx, n_idx, split + t, :] = \
                out[s_idx, n_idx, split - 1 + t, :]
        if t > 0:
            predicted[:, :, t - 1, :] = out[s_idx, n_idx, split - 1 + t, :]
    for s, t_set in enumerate(seq_sets):
        rmses = normalised_n_step_rmses(t_set, predicted[s, :seq_rows[s]])
        for k, v in enumerate(np.asarray(rmses)):
            res.setdefault(f'decoder_test_rmse_{k + 2}-step',
                           []).append(float(v))
    return {k: np.asarray(v) for k, v in res.items()}
