"""Causal Transformer (CT) — multi-input transformer with balanced
representations and domain-confusion training.

JAX/flax re-design of the reference CT (src/models/ct.py:26-216, blocks at
utils_transformer.py:220-321).  Training runs as one jitted lax.scan program
(see nn/training.py); multi-step prediction follows the reference's
write-predictions-into-prev_outputs protocol (ct.py:187-203).

Like the reference (ct.py:88-96), ONE relative-PE k table and ONE v table
are created per model and shared by every attention module in every block.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from insite_tpu.models.base import CausalEstimator
from insite_tpu.models.nn.blocks import (BRTreatmentOutcomeHead, TorchDense,
                                         TransformerMultiInputBlock)
from insite_tpu.models.nn.training import (TrainConfig, fit_br_model,
                                           merge_by_mask,
                                           treatment_head_mask)


@dataclass
class CTConfig:
    """Tuned hparams from config/backbone/ct.yaml +
    benchmark_hparams/ct.yaml."""

    dim_treatments: int = 2
    dim_static_features: int = 2
    dim_outcome: int = 1
    # vitals stream (real-EHR collections; every synthetic benchmark has
    # dim_vitals = 0, config/dataset/*.yaml)
    dim_vitals: int = 0
    # training-time augmentation: each batch doubled with a vitals-masked
    # copy split at a random point (reference ct.py:116-126,
    # config/backbone/ct.yaml:28)
    augment_with_masked_vitals: bool = True
    seq_hidden_units: int = 16
    br_size: int = 16
    fc_hidden_units: int = 32
    dropout_rate: float = 0.1
    num_layer: int = 1
    num_heads: int = 2
    max_relative_position: int = 15
    learning_rate: float = 0.01
    batch_size: int = 256
    epochs: int = 100
    balancing: str = 'domain_confusion'
    alpha: float = 0.01
    update_alpha: bool = True
    weights_ema: bool = True
    beta: float = 0.99
    treatment_mode: str = 'multiclass'
    projection_horizon: int = 5
    max_grad_norm: Optional[float] = None
    seed: int = 0


class CTNetwork(nn.Module):
    cfg: CTConfig

    @nn.compact
    def __call__(self, batch, alpha=0.0, train=False,
                 detach_treatment=False):
        cfg = self.cfg
        has_vitals = cfg.dim_vitals > 0
        x_t = TorchDense(cfg.seq_hidden_units,
                       name='treatments_input')(batch['prev_treatments'])
        x_o = TorchDense(cfg.seq_hidden_units,
                       name='outputs_input')(batch['prev_outputs'])
        x_s = TorchDense(cfg.seq_hidden_units,
                       name='static_input')(batch['static_features'][:, None,
                                                                     :])
        active = batch['active_entries']
        T = x_t.shape[1]

        # vitals masked past the rolling origin — test sequence rows and
        # masked-augmentation training rows carry a per-row split
        # (reference ct.py:143-151)
        split = batch.get('fixed_split', batch.get('future_past_split'))
        x_v = active_vitals = None
        if has_vitals:
            vitals = batch['vitals']
            active_vitals = active
            if split is not None:
                vit_mask = (jnp.arange(T)[None, :] <
                            split[:, None]).astype(vitals.dtype)
                vitals = vitals * vit_mask[..., None]
                active_vitals = active * vit_mask[..., None]
            x_v = TorchDense(cfg.seq_hidden_units,
                             name='vitals_input')(vitals)

        head_size = cfg.seq_hidden_units // cfg.num_heads
        # ONE shared k and ONE shared v relative-PE table for every
        # attention module in every block (reference ct.py:92-93)
        from insite_tpu.models.nn.blocks import RelativePositionalEncoding
        rel_k = RelativePositionalEncoding(
            cfg.max_relative_position, head_size, name='self_pe_k')(T, T)
        rel_v = RelativePositionalEncoding(
            cfg.max_relative_position, head_size, name='self_pe_v')(T, T)
        for i in range(cfg.num_layer):
            streams = TransformerMultiInputBlock(
                cfg.seq_hidden_units, cfg.num_heads, head_size,
                cfg.seq_hidden_units * 4, cfg.dropout_rate, cfg.dropout_rate,
                cfg.max_relative_position, name=f'block_{i}')(
                    x_t, x_o, x_s, active, train, rel_k, rel_v,
                    x_v=x_v, active_vitals=active_vitals)
            if has_vitals:
                x_t, x_o, x_v = streams
            else:
                x_t, x_o = streams
        if not has_vitals:
            x = (x_o + x_t) / 2
        elif split is not None:
            # past the split only t/o streams carry signal (ct.py:173-180)
            pre = (jnp.arange(T)[None, :] < split[:, None])[..., None]
            x = jnp.where(pre, (x_o + x_t + x_v) / 3, (x_o + x_t) / 2)
        else:
            x = (x_o + x_t + x_v) / 3
        x = nn.Dropout(cfg.dropout_rate, deterministic=not train)(x)
        head = BRTreatmentOutcomeHead(cfg.br_size, cfg.fc_hidden_units,
                                      cfg.dim_treatments, cfg.dim_outcome,
                                      cfg.balancing,
                                      name='br_treatment_outcome_head')
        return head(x, batch['current_treatments'], alpha, detach_treatment)


_BATCH_KEYS = ('prev_treatments', 'prev_outputs', 'static_features',
               'current_treatments', 'outputs', 'active_entries')
# optional keys picked up when the dataset carries them (real-EHR vitals,
# rolling-origin test rows)
_OPT_KEYS = ('vitals', 'future_past_split')


def _device_batch(data, keys=_BATCH_KEYS, dtype=jnp.float32):
    keys = tuple(keys) + tuple(k for k in _OPT_KEYS
                               if k in data and k not in keys)
    return {k: jnp.asarray(data[k], dtype) for k in keys}


def ct_augment_fn(batch, rng):
    """Masked-vitals training augmentation (reference ct.py:116-126): the
    batch is doubled — originals keep their full vitals (split = seq_len),
    copies get a uniform random split in [0, seq_len] masking vitals from
    there on.  The reference re-doubles the already-doubled batch on the
    second optimizer pass (Lightning calls forward once per optimizer on
    the same mutated dict) — here both optimizer losses see ONE doubled
    batch per step, the documented intent of the augmentation."""
    seq_len = batch['active_entries'][..., 0].sum(axis=1)
    rand_split = jnp.floor(
        jax.random.uniform(rng, seq_len.shape) * (seq_len + 1.0))
    doubled = jax.tree_util.tree_map(
        lambda v: jnp.concatenate([v, v], axis=0), batch)
    doubled['fixed_split'] = jnp.concatenate([seq_len, rand_split])
    return doubled


def ct_train_config(cfg: CTConfig):
    """CTConfig -> TrainConfig, shared by the single-seed fit and the
    vectorized seed-column sweep (harness/vectorized_neural.py) so the two
    paths cannot drift."""
    return TrainConfig(epochs=cfg.epochs, batch_size=cfg.batch_size,
                       learning_rate=cfg.learning_rate,
                       balancing=cfg.balancing, alpha=cfg.alpha,
                       update_alpha=cfg.update_alpha,
                       weights_ema=cfg.weights_ema, beta=cfg.beta,
                       treatment_mode=cfg.treatment_mode,
                       max_grad_norm=cfg.max_grad_norm)


class CausalTransformer(CausalEstimator):
    model_type = 'multi'
    tuning_criterion = 'rmse'

    def __init__(self, cfg: CTConfig, dataset_collection=None):
        self.cfg = cfg
        self.collection = dataset_collection
        self.net = CTNetwork(cfg)
        self.params = None
        self.ema_params = None
        self.treat_mask = None
        if dataset_collection is not None and \
                not dataset_collection.processed_data_multi:
            dataset_collection.process_data_multi()

    def _apply(self, params, batch, alpha, train, rngs, detach_treatment):
        return self.net.apply({'params': params}, batch, alpha, train,
                              detach_treatment, rngs=rngs)

    def fit(self, train_f=None, val_f=None):
        train_f = train_f or self.collection.train_f
        cfg = self.cfg
        data = _device_batch(train_f.data)
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_rng = jax.random.split(rng)
        sample = jax.tree_util.tree_map(lambda a: a[:2], data)
        variables = self.net.init({'params': init_rng, 'dropout': rng},
                                  sample, 0.0, False, False)
        params = variables['params']
        self.treat_mask = treatment_head_mask(params)

        tc = ct_train_config(cfg)
        self.params, self.ema_params = fit_br_model(
            self._apply, params, data, tc, self.treat_mask, rng,
            augment_fn=ct_augment_fn if (cfg.dim_vitals > 0 and
                                         cfg.augment_with_masked_vitals)
            else None)
        return self

    def _predict_params(self):
        if self.cfg.weights_ema and self.ema_params is not None:
            # EMA weights for the non-treatment partition
            # (predict_step, time_varying_model.py:599-608)
            return merge_by_mask(self.params, self.ema_params,
                                 self.treat_mask)
        return self.params

    def get_predictions(self, dataset) -> np.ndarray:
        batch = _device_batch(dataset.data)
        _, outcome_pred, _ = self._apply(self._predict_params(), batch, 0.0,
                                         False, None, False)
        return np.asarray(outcome_pred)

    def get_representations(self, dataset) -> np.ndarray:
        batch = _device_batch(dataset.data)
        _, _, br = self._apply(self._predict_params(), batch, 0.0, False,
                               None, False)
        return np.asarray(br)

    def get_attention_maps(self, dataset) -> dict:
        """Per-module attention maps {module_path: [B, heads, Tq, Tk]} —
        the reference's CT.visualize hook targets (ct.py:205-216:
        self/cross attentions of every block, incl. the vitals stream's
        shared modules) via flax's 'intermediates' collection."""
        from flax.traverse_util import flatten_dict
        batch = _device_batch(dataset.data)
        _, state = self.net.apply(
            {'params': self._predict_params()}, batch, 0.0, False, False,
            mutable=['intermediates'])
        flat = flatten_dict(state['intermediates'])
        return {'/'.join(p[:-1]): np.asarray(v[0])
                for p, v in flat.items() if p[-1] == 'attention'}

    def get_autoregressive_predictions(self, dataset) -> np.ndarray:
        """Iterative multi-step: write predictions into prev_outputs at the
        rolling origin (ct.py:187-203)."""
        ph = self.cfg.projection_horizon
        data = {k: np.array(dataset.data[k])
                for k in _BATCH_KEYS + _OPT_KEYS if k in dataset.data}
        split = dataset.data['future_past_split'].astype(int)
        n = data['outputs'].shape[0]
        predicted = np.zeros((n, ph, self.cfg.dim_outcome))
        for t in range(ph + 1):
            batch = _device_batch(data)
            _, outcome_pred, _ = self._apply(self._predict_params(), batch,
                                             0.0, False, None, False)
            outputs_scaled = np.asarray(outcome_pred)
            if t < ph:
                data['prev_outputs'][np.arange(n), split + t, :] = \
                    outputs_scaled[np.arange(n), split - 1 + t, :]
            if t > 0:
                predicted[:, t - 1, :] = \
                    outputs_scaled[np.arange(n), split - 1 + t, :]
        return predicted
