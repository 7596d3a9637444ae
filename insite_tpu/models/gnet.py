"""G-Net — LSTM g-computation with MC-sampled autoregressive rollouts.

JAX/flax re-design of the reference G-Net (src/models/gnet.py:29-267):
representation LSTM + sequential conditional heads, a holdout split whose
residuals provide the empirical noise distribution, and n-step prediction by
Monte-Carlo averaging over `mc_samples` noisy autoregressive rollouts.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from insite_tpu.models.base import CausalEstimator
from insite_tpu.models.nn.blocks import ROutcomeVitalsHead, VariationalLSTM
from insite_tpu.models.nn.training import (TrainConfig, fit_simple,
                                           masked_mean)


@dataclass
class GNetConfig:
    """config/backbone/gnet.yaml + benchmark_hparams/gnet.yaml."""

    dim_treatments: int = 1
    dim_static_features: int = 2
    dim_outcome: int = 1
    seq_hidden_units: int = 24
    r_size: int = 3
    fc_hidden_units: int = 48
    dropout_rate: float = 0.1
    num_layer: int = 1
    learning_rate: float = 0.01
    batch_size: int = 128
    epochs: int = 100
    mc_samples: int = 25       # config.gnet.mcsamples override (run.py:226)
    holdout_ratio: float = 0.1
    projection_horizon: int = 5
    seed: int = 0


class GNetNetwork(nn.Module):
    cfg: GNetConfig

    @nn.compact
    def __call__(self, x, train=False):
        cfg = self.cfg
        h = VariationalLSTM(cfg.seq_hidden_units, cfg.num_layer,
                            cfg.dropout_rate, name='repr_net')(x, None,
                                                               train)
        return ROutcomeVitalsHead(cfg.r_size, cfg.fc_hidden_units,
                                  (cfg.dim_outcome,),
                                  name='r_outcome_vitals_head')(h)


def _inputs(data):
    T = data['prev_outputs'].shape[1]
    statics = np.repeat(np.asarray(data['static_features'])[:, None, :], T,
                        axis=1)
    return np.concatenate([data['current_treatments'],
                           data['prev_outputs'], statics], axis=-1)


class GNet(CausalEstimator):
    model_type = 'g_net'
    tuning_criterion = 'rmse'

    def __init__(self, cfg: GNetConfig, dataset_collection):
        self.cfg = cfg
        self.collection = dataset_collection
        self.net = GNetNetwork(cfg)
        self.params = None
        if not dataset_collection.processed_data_multi:
            dataset_collection.process_data_multi()
        dataset_collection.split_train_f_holdout(cfg.holdout_ratio)
        dataset_collection.explode_cf_treatment_seq(cfg.mc_samples)

    def fit(self, train_f=None, val_f=None):
        cfg = self.cfg
        data = self.collection.train_f.data
        x = _inputs(data)
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_rng = jax.random.split(rng)
        params = self.net.init({'params': init_rng, 'dropout': rng},
                               jnp.asarray(x[:2], jnp.float32),
                               False)['params']
        batch_data = {'x': jnp.asarray(x, jnp.float32),
                      'outputs': jnp.asarray(data['outputs'], jnp.float32),
                      'active_entries': jnp.asarray(data['active_entries'],
                                                    jnp.float32)}

        def loss_fn(p, batch, rngs):
            pred = self.net.apply({'params': p}, batch['x'], True,
                                  rngs=rngs)
            mse = (pred[..., :cfg.dim_outcome] - batch['outputs']) ** 2
            return masked_mean(mse, batch['active_entries'])

        tc = TrainConfig(cfg.epochs, cfg.batch_size, cfg.learning_rate)
        self.params = fit_simple(loss_fn, params, batch_data, tc, rng)

        # holdout residual distribution (gnet.py:180-202); with
        # holdout_ratio <= 0 no split exists and rollouts run noise-free
        holdout = getattr(self.collection, 'train_f_holdout', None)
        if holdout is not None and len(holdout.data['outputs']):
            preds = self._predict_data(holdout.data)
            self.holdout_resid = np.asarray(holdout.data['outputs']) - preds
            self.holdout_resid_len = \
                holdout.data['sequence_lengths'].astype(int)
        else:
            self.holdout_resid = self.holdout_resid_len = None
        return self

    # Cap rows per dispatch: the stacked MC eval batch (mc_samples x
    # exploded cf rows ~ 270k sequences) otherwise compiles a >16G-HBM
    # program on a 16G chip.  The last chunk is zero-padded to the chunk
    # size so every dispatch shares one compiled shape.
    _PREDICT_CHUNK = 65536

    def _predict_data(self, data):
        x = np.asarray(_inputs(data), np.float32)
        B, chunk = x.shape[0], self._PREDICT_CHUNK
        if B <= chunk:
            pred = self.net.apply({'params': self.params}, jnp.asarray(x),
                                  False)
            return np.array(pred[..., :self.cfg.dim_outcome])
        # keep per-chunk outputs on device, fetch once at the end (the
        # remote-TPU link stalls on loops of blocking np.asarray pulls —
        # CLAUDE.md; the sliced outputs are small, ~[B, T, dim_outcome])
        outs = []
        for s in range(0, B, chunk):
            xb = x[s:s + chunk]
            pad = chunk - xb.shape[0]
            if pad:
                xb = np.concatenate(
                    [xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
            pred = self.net.apply({'params': self.params}, jnp.asarray(xb),
                                  False)
            outs.append(pred[:chunk - pad, ..., :self.cfg.dim_outcome])
        return np.concatenate(jax.device_get(outs))

    def get_predictions(self, dataset) -> np.ndarray:
        return self._predict_data(dataset.data)

    def get_autoregressive_predictions(self, datasets) -> np.ndarray:
        """MC rollouts with residual-noise injection (gnet.py:230-267)."""
        cfg = self.cfg
        ph = cfg.projection_horizon
        assert isinstance(datasets, list) and len(datasets) == cfg.mc_samples
        rng = np.random.RandomState(cfg.seed)
        M = cfg.mc_samples
        n = len(datasets[0].data['prev_outputs'])
        # the M copies are identical and independent: stack them into one
        # [M*n] batch so each rollout step is ONE jitted dispatch and ONE
        # device fetch instead of M (serial per-copy pulls stall the remote
        # TPU link — see CLAUDE.md); residual draws keep the reference's
        # per-(t, m) np.random order
        flat = {k: np.concatenate([np.array(d.data[k]) for d in datasets])
                for k in ('prev_outputs', 'current_treatments',
                          'static_features', 'future_past_split')}
        rows = np.arange(M * n)
        split = flat['future_past_split'].astype(int)
        predicted = np.zeros((M, n, ph, cfg.dim_outcome))
        for t in range(ph + 1):
            outputs_scaled = self._predict_data(flat)       # [M*n, T, D]
            if t > 0:
                predicted[:, :, t - 1, :] = \
                    outputs_scaled[rows, split - 1 + t, :].reshape(
                        M, n, cfg.dim_outcome)
            if self.holdout_resid is not None:
                ridx = np.concatenate(
                    [rng.randint(len(self.holdout_resid), size=n)
                     for _ in range(M)])
                rlen = self.holdout_resid_len[ridx]
                resid = self.holdout_resid[
                    ridx, np.minimum(split - 1 + t, rlen - 1), :]
                outputs_scaled[rows, split - 1 + t, :] += resid
            if t < ph:
                flat['prev_outputs'][rows, split + t, :] = \
                    outputs_scaled[rows, split - 1 + t, :]
        return predicted.mean(0)

    def get_normalised_n_step_rmses(self, dataset, datasets_mc=None):
        datasets_mc = datasets_mc or self.collection.test_cf_treatment_seq_mc
        return super().get_normalised_n_step_rmses(dataset, datasets_mc)
