"""EDCT — Encoder-Decoder Causal Transformer.

JAX/flax re-design of the reference EDCT (src/models/edct.py:27-331):
transformer encoder over factual history; decoder with causal
self-attention + cross-attention over the encoder's balanced
representations (per-row gathered via original_index, dataset.py:81-88).
Same two-stage pipeline and autoregressive n-step protocol as CRN.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from insite_tpu.models.base import CausalEstimator
from insite_tpu.models.crn import _Stage, _device_batch
from insite_tpu.models.nn.blocks import (BRTreatmentOutcomeHead, TorchDense,
                                         TransformerDecoderBlock,
                                         TransformerEncoderBlock)
from insite_tpu.models.nn.training import TrainConfig


@dataclass
class EDCTConfig:
    """config/backbone/edct.yaml + benchmark_hparams/edct.yaml (the
    shipped per-coeff overlays, e.g. edct_hparams/pkpd_sim_domain_conf/
    2.yaml, equal the benchmark defaults — 2-layer 18-unit encoder,
    2-layer bottleneck decoder with br_size 3 / fc 12 / dropout 0.2;
    decoder d_model = encoder br_size, reference edct.py:306)."""

    dim_treatments: int = 2
    dim_static_features: int = 2
    dim_outcome: int = 1
    enc_seq_hidden_units: int = 18
    enc_br_size: int = 18
    enc_fc_hidden_units: int = 18
    enc_dropout_rate: float = 0.1
    enc_learning_rate: float = 0.01
    enc_batch_size: int = 128
    dec_br_size: int = 3
    dec_fc_hidden_units: int = 12
    dec_dropout_rate: float = 0.2
    dec_learning_rate: float = 0.001
    dec_batch_size: int = 512
    num_layer: int = 2
    num_heads: int = 2
    max_relative_position: int = 15
    epochs: int = 100
    balancing: str = 'domain_confusion'
    alpha: float = 0.01
    update_alpha: bool = True
    weights_ema: bool = True
    beta: float = 0.99
    treatment_mode: str = 'multiclass'
    projection_horizon: int = 5
    seed: int = 0


class EDCTEncoderNetwork(nn.Module):
    cfg: EDCTConfig

    @nn.compact
    def __call__(self, batch, alpha=0.0, train=False,
                 detach_treatment=False):
        cfg = self.cfg
        parts = [batch['prev_treatments']]
        if 'vitals' in batch:      # real-EHR encoder stream (edct.py)
            parts.append(batch['vitals'])
        parts.append(batch['prev_outputs'])
        x = jnp.concatenate(parts, axis=-1)
        statics = jnp.repeat(batch['static_features'][:, None, :],
                             x.shape[1], axis=1)
        x = jnp.concatenate([x, statics], axis=-1)
        x = TorchDense(cfg.enc_seq_hidden_units, name='input')(x)
        head_size = cfg.enc_seq_hidden_units // cfg.num_heads
        active = batch['active_entries']
        from insite_tpu.models.nn.blocks import RelativePositionalEncoding
        T = x.shape[1]
        rel_k = RelativePositionalEncoding(
            cfg.max_relative_position, head_size, name='self_pe_k')(T, T)
        rel_v = RelativePositionalEncoding(
            cfg.max_relative_position, head_size, name='self_pe_v')(T, T)
        for i in range(cfg.num_layer):
            x = TransformerEncoderBlock(
                cfg.enc_seq_hidden_units, cfg.num_heads, head_size,
                cfg.enc_seq_hidden_units * 4, cfg.enc_dropout_rate,
                cfg.enc_dropout_rate, cfg.max_relative_position,
                name=f'block_{i}')(x, active, train, rel_k, rel_v)
        x = nn.Dropout(cfg.enc_dropout_rate, deterministic=not train)(x)
        head = BRTreatmentOutcomeHead(cfg.enc_br_size,
                                      cfg.enc_fc_hidden_units,
                                      cfg.dim_treatments, cfg.dim_outcome,
                                      cfg.balancing,
                                      name='br_treatment_outcome_head')
        return head(x, batch['current_treatments'], alpha, detach_treatment)


class EDCTDecoderNetwork(nn.Module):
    """Decoder d_model = encoder br_size (edct.py:310)."""

    cfg: EDCTConfig

    @nn.compact
    def __call__(self, batch, alpha=0.0, train=False,
                 detach_treatment=False):
        cfg = self.cfg
        d_model = cfg.enc_br_size
        x = jnp.concatenate([batch['prev_treatments'],
                             batch['prev_outputs']], axis=-1)
        statics = jnp.repeat(batch['static_features'][:, None, :],
                             x.shape[1], axis=1)
        x = jnp.concatenate([x, statics], axis=-1)
        x = TorchDense(d_model, name='input')(x)
        encoder_br = batch['encoder_r']
        active = batch['active_entries']
        active_encoder = batch['active_encoder_r']
        head_size = d_model // cfg.num_heads
        from insite_tpu.models.nn.blocks import RelativePositionalEncoding
        Tq, Tk = x.shape[1], encoder_br.shape[1]
        rel_k = RelativePositionalEncoding(
            cfg.max_relative_position, head_size, name='self_pe_k')(Tq, Tq)
        rel_v = RelativePositionalEncoding(
            cfg.max_relative_position, head_size, name='self_pe_v')(Tq, Tq)
        # cross-attention PEs: distance measured from the encoder-sequence
        # end (reference edct.py:99-104, cross_attn=True)
        cross_k = RelativePositionalEncoding(
            cfg.max_relative_position, head_size, cross_attn=True,
            name='cross_pe_k')(Tq, Tk)
        cross_v = RelativePositionalEncoding(
            cfg.max_relative_position, head_size, cross_attn=True,
            name='cross_pe_v')(Tq, Tk)
        for i in range(cfg.num_layer):
            x = TransformerDecoderBlock(
                d_model, cfg.num_heads, head_size, d_model * 4,
                cfg.dec_dropout_rate, cfg.dec_dropout_rate,
                cfg.max_relative_position, name=f'block_{i}')(
                    x, encoder_br, active, active_encoder, train,
                    rel_k, rel_v, cross_k, cross_v)
        x = nn.Dropout(cfg.dec_dropout_rate, deterministic=not train)(x)
        head = BRTreatmentOutcomeHead(cfg.dec_br_size,
                                      cfg.dec_fc_hidden_units,
                                      cfg.dim_treatments, cfg.dim_outcome,
                                      cfg.balancing,
                                      name='br_treatment_outcome_head')
        return head(x, batch['current_treatments'], alpha, detach_treatment)


_ENC_KEYS = ('prev_treatments', 'prev_outputs', 'static_features',
             'current_treatments', 'outputs', 'active_entries')
_ENC_IN = ('prev_treatments', 'prev_outputs', 'static_features',
           'current_treatments', 'active_entries')
_DEC_KEYS = _ENC_KEYS + ('encoder_r', 'active_encoder_r')
_DEC_IN = _ENC_IN + ('encoder_r', 'active_encoder_r')


class EDCT(CausalEstimator):
    model_type = 'encoder_decoder'
    tuning_criterion = 'rmse'

    def __init__(self, cfg: EDCTConfig, dataset_collection):
        self.cfg = cfg
        self.collection = dataset_collection
        common = dict(epochs=cfg.epochs, balancing=cfg.balancing,
                      alpha=cfg.alpha, update_alpha=cfg.update_alpha,
                      weights_ema=cfg.weights_ema, beta=cfg.beta,
                      treatment_mode=cfg.treatment_mode)
        vit = ('vitals',) if getattr(dataset_collection, 'has_vitals',
                                     False) else ()
        self.encoder = _Stage(EDCTEncoderNetwork(cfg), _ENC_KEYS + vit,
                              TrainConfig(batch_size=cfg.enc_batch_size,
                                          learning_rate=cfg.enc_learning_rate,
                                          **common), cfg.seed,
                              input_keys=_ENC_IN + vit)
        self.decoder = _Stage(EDCTDecoderNetwork(cfg), _DEC_KEYS,
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
            coll.process_data_decoder(self.encoder, save_encoder_r=True)
        # gather per-row encoder representations for cross-attention
        train_data = dict(coll.train_f.data)
        enc_r = coll.train_f.encoder_r
        orig_idx = train_data['original_index'].astype(int)
        train_data['encoder_r'] = enc_r[orig_idx]
        self.decoder.fit_stage(train_data)
        return self

    def get_predictions(self, dataset) -> np.ndarray:
        return self.encoder.get_predictions(dataset)

    def get_autoregressive_predictions(self, dataset) -> np.ndarray:
        ph = self.cfg.projection_horizon
        data = {k: np.array(dataset.data[k]) for k in
                ('prev_treatments', 'prev_outputs', 'static_features',
                 'current_treatments', 'active_entries',
                 'active_encoder_r')}
        data['encoder_r'] = np.array(dataset.encoder_r)
        n = data['prev_outputs'].shape[0]
        predicted = np.zeros((n, ph, self.cfg.dim_outcome))
        for t in range(ph):
            outputs_scaled, _ = self.decoder.predict_all(data)
            predicted[:, t] = outputs_scaled[:, t]
            if t < ph - 1:
                data['prev_outputs'][:, t + 1, :] = outputs_scaled[:, t, :]
        return predicted
