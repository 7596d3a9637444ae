"""CRN — Counterfactual Recurrent Network (encoder/decoder variational
LSTMs with balanced representations).

JAX/flax re-design of the reference CRN (src/models/crn.py:27-182) and the
two-stage train_enc_dec pipeline (runnables/train_enc_dec.py:23-148):
encoder fits one-step-ahead on factual data; the decoder consumes encoder
representations as its LSTM warm start over rolling-origin rows; n-step
evaluation decodes autoregressively (time_varying_model.py:201-217).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from insite_tpu.models.base import CausalEstimator
from insite_tpu.models.nn.blocks import (BRTreatmentOutcomeHead,
                                         VariationalLSTM)
from insite_tpu.models.nn.training import (TrainConfig, fit_br_model,
                                           merge_by_mask,
                                           treatment_head_mask)


@dataclass
class CRNConfig:
    """config/backbone/crn.yaml + benchmark_hparams/crn.yaml."""

    dim_treatments: int = 2
    dim_static_features: int = 2
    dim_outcome: int = 1
    # encoder
    enc_seq_hidden_units: int = 24
    enc_br_size: int = 6
    enc_fc_hidden_units: int = 18
    enc_dropout_rate: float = 0.2
    enc_learning_rate: float = 0.01
    enc_batch_size: int = 64
    # decoder (seq_hidden = encoder br_size, crn.py:158)
    dec_br_size: int = 3
    dec_fc_hidden_units: int = 9
    dec_dropout_rate: float = 0.2
    dec_learning_rate: float = 0.001
    dec_batch_size: int = 512
    num_layer: int = 1
    epochs: int = 100
    balancing: str = 'domain_confusion'
    alpha: float = 0.01
    update_alpha: bool = True
    weights_ema: bool = True
    beta: float = 0.99
    treatment_mode: str = 'multiclass'
    projection_horizon: int = 5
    seed: int = 0


class CRNSubNetwork(nn.Module):
    """One CRN stage: VariationalLSTM + BR head (crn.py:96-101)."""

    seq_hidden_units: int
    br_size: int
    fc_hidden_units: int
    dim_treatments: int
    dim_outcome: int
    dropout_rate: float
    num_layer: int
    balancing: str
    use_init_state: bool = False

    @nn.compact
    def __call__(self, batch, alpha=0.0, train=False,
                 detach_treatment=False):
        # (prev_treatments, [vitals,] prev_outputs) — reference
        # crn.py:95-96, 129-132; only encoder batches carry vitals
        parts = [batch['prev_treatments']]
        if 'vitals' in batch:
            parts.append(batch['vitals'])
        parts.append(batch['prev_outputs'])
        x = jnp.concatenate(parts, axis=-1)
        statics = jnp.repeat(batch['static_features'][:, None, :],
                             x.shape[1], axis=1)
        x = jnp.concatenate([x, statics], axis=-1)
        init_states = batch['init_state'] if self.use_init_state else None
        h = VariationalLSTM(self.seq_hidden_units, self.num_layer,
                            self.dropout_rate, name='lstm')(
                                x, init_states, train)
        head = BRTreatmentOutcomeHead(self.br_size, self.fc_hidden_units,
                                      self.dim_treatments, self.dim_outcome,
                                      self.balancing,
                                      name='br_treatment_outcome_head')
        return head(h, batch['current_treatments'], alpha, detach_treatment)


_ENC_KEYS = ('prev_treatments', 'prev_outputs', 'static_features',
             'current_treatments', 'outputs', 'active_entries')
_DEC_KEYS = _ENC_KEYS + ('init_state',)
_ENC_IN = ('prev_treatments', 'prev_outputs', 'static_features',
           'current_treatments')
_DEC_IN = _ENC_IN + ('init_state',)


def _device_batch(data, keys, dtype=jnp.float32):
    return {k: jnp.asarray(data[k], dtype) for k in keys}


class _Stage(CausalEstimator):
    """Shared encoder/decoder machinery."""

    def __init__(self, net, keys, train_cfg: TrainConfig, seed: int,
                 input_keys=None):
        self.net = net
        self.keys = keys
        self.input_keys = input_keys or keys
        self.train_cfg = train_cfg
        self.seed = seed
        self.params = self.ema_params = self.treat_mask = None

    def _apply(self, params, batch, alpha, train, rngs, detach_treatment):
        return self.net.apply({'params': params}, batch, alpha, train,
                              detach_treatment, rngs=rngs)

    def fit_stage(self, data: dict):
        batch_data = _device_batch(data, self.keys)
        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        sample = jax.tree_util.tree_map(lambda a: a[:2], batch_data)
        params = self.net.init({'params': init_rng, 'dropout': rng}, sample,
                               0.0, False, False)['params']
        self.treat_mask = treatment_head_mask(params)
        self.params, self.ema_params = fit_br_model(
            self._apply, params, batch_data, self.train_cfg,
            self.treat_mask, rng)
        return self

    def _predict_params(self):
        if self.train_cfg.weights_ema and self.ema_params is not None:
            return merge_by_mask(self.params, self.ema_params,
                                 self.treat_mask)
        return self.params

    def predict_all(self, data: dict):
        batch = _device_batch(data, self.input_keys)
        tp, op, br = self._apply(self._predict_params(), batch, 0.0, False,
                                 None, False)
        return np.asarray(op), np.asarray(br)

    def get_predictions(self, dataset) -> np.ndarray:
        return self.predict_all(dataset.data)[0]

    def get_representations(self, dataset) -> np.ndarray:
        return self.predict_all(dataset.data)[1]

    def get_attention_maps(self, dataset) -> dict:
        """Per-layer attention maps {module_path: [B, heads, Tq, Tk]} —
        the reference's forward-hook visualization (edct.py:194-227) via
        flax's 'intermediates' collection."""
        from flax.traverse_util import flatten_dict
        batch = _device_batch(dataset.data, self.input_keys)
        _, state = self.net.apply(
            {'params': self._predict_params()}, batch, 0.0, False, False,
            mutable=['intermediates'])
        flat = flatten_dict(state['intermediates'])
        return {'/'.join(p[:-1]): np.asarray(v[0])
                for p, v in flat.items() if p[-1] == 'attention'}


class CRN(CausalEstimator):
    """Two-stage CRN estimator (encoder + decoder)."""

    model_type = 'encoder_decoder'
    tuning_criterion = 'rmse'

    def __init__(self, cfg: CRNConfig, dataset_collection):
        self.cfg = cfg
        self.collection = dataset_collection
        enc_net = CRNSubNetwork(cfg.enc_seq_hidden_units, cfg.enc_br_size,
                                cfg.enc_fc_hidden_units, cfg.dim_treatments,
                                cfg.dim_outcome, cfg.enc_dropout_rate,
                                cfg.num_layer, cfg.balancing, False)
        dec_net = CRNSubNetwork(cfg.enc_br_size, cfg.dec_br_size,
                                cfg.dec_fc_hidden_units, cfg.dim_treatments,
                                cfg.dim_outcome, cfg.dec_dropout_rate,
                                cfg.num_layer, cfg.balancing, True)
        common = dict(epochs=cfg.epochs, balancing=cfg.balancing,
                      alpha=cfg.alpha, update_alpha=cfg.update_alpha,
                      weights_ema=cfg.weights_ema, beta=cfg.beta,
                      treatment_mode=cfg.treatment_mode)
        # encoder consumes the vitals stream when the collection has one
        # (reference crn.py:113,129-132); the decoder never does
        vit = ('vitals',) if getattr(dataset_collection, 'has_vitals',
                                     False) else ()
        self.encoder = _Stage(enc_net, _ENC_KEYS + vit,
                              TrainConfig(batch_size=cfg.enc_batch_size,
                                          learning_rate=cfg.enc_learning_rate,
                                          **common), cfg.seed,
                              input_keys=_ENC_IN + vit)
        self.decoder = _Stage(dec_net, _DEC_KEYS,
                              TrainConfig(batch_size=cfg.dec_batch_size,
                                          learning_rate=cfg.dec_learning_rate,
                                          **common), cfg.seed + 1,
                              input_keys=_DEC_IN)
        if not dataset_collection.processed_data_encoder:
            dataset_collection.process_data_encoder()

    def fit(self, train_f=None, val_f=None):
        coll = self.collection
        self.encoder.fit_stage(coll.train_f.data)
        if not coll.processed_data_decoder:
            coll.process_data_decoder(self.encoder)
        self.decoder.fit_stage(coll.train_f.data)
        return self

    # one-step (encoder) metrics --------------------------------------------
    def get_predictions(self, dataset) -> np.ndarray:
        return self.encoder.get_predictions(dataset)

    # n-step (decoder) metrics ----------------------------------------------
    def get_autoregressive_predictions(self, dataset) -> np.ndarray:
        """time_varying_model.py:201-217: step-by-step decoding on the
        autoregressive-test placeholder rows."""
        ph = self.cfg.projection_horizon
        data = {k: np.array(dataset.data[k]) for k in _DEC_IN}
        n = data['prev_outputs'].shape[0]
        predicted = np.zeros((n, ph, self.cfg.dim_outcome))
        for t in range(ph):
            outputs_scaled, _ = self.decoder.predict_all(data)
            predicted[:, t] = outputs_scaled[:, t]
            if t < ph - 1:
                data['prev_outputs'][:, t + 1, :] = outputs_scaled[:, t, :]
        return predicted
