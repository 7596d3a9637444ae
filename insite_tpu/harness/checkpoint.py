"""Model checkpointing — save/restore fitted estimators to disk.

The reference has NO model persistence ("Checkpoint / resume: none",
SURVEY.md §5; Lightning restore is unused): a crashed sweep re-trains
every model.  This module adds a framework-level save/load for every
estimator family, so fitted models survive process restarts and can be
served without re-training.

Format: a checkpoint directory with
- ``meta.json``   — estimator class, config snapshot, optional library spec
- ``state.msgpack`` — the fitted-state pytree (flax msgpack: numpy arrays,
  scalars, strings, None), safe to load without unpickling arbitrary code.

Usage::

    save_model(model, 'ckpts/insite_eq4d_s0')
    fresh = SINDyRegressor(cfg)              # same config, unfitted
    load_model(fresh, 'ckpts/insite_eq4d_s0')
    fresh.get_predictions(dataset)           # identical to the saved model
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
from flax import serialization

# Fitted-state fields per estimator class; dotted paths reach the
# encoder/decoder _Stage sub-objects of CRN/EDCT.
STATE_FIELDS = {
    'SINDyRegressor': ('coefs', 'global_equation_string'),
    'CausalTransformer': ('params', 'ema_params', 'treat_mask'),
    'CRN': ('encoder.params', 'encoder.ema_params', 'encoder.treat_mask',
            'decoder.params', 'decoder.ema_params', 'decoder.treat_mask'),
    'EDCT': ('encoder.params', 'encoder.ema_params', 'encoder.treat_mask',
             'decoder.params', 'decoder.ema_params', 'decoder.treat_mask'),
    'RMSN': ('params',),
    'GNet': ('params', 'holdout_resid', 'holdout_resid_len'),
    'MSM': ('prop_treat', 'prop_hist', 'regressors'),
}


def _get_path(obj, path):
    for part in path.split('.'):
        obj = getattr(obj, part)
    return obj


def _set_path(obj, path, value):
    parts = path.split('.')
    for part in parts[:-1]:
        obj = getattr(obj, part)
    setattr(obj, parts[-1], value)


def _to_host(x):
    """Device arrays -> numpy; tuples -> lists (flax msgpack rejects
    tuples; sequence unpacking on load works identically on lists)."""
    if isinstance(x, (list, tuple)):
        return [_to_host(v) for v in x]
    if isinstance(x, dict):
        return {k: _to_host(v) for k, v in x.items()}
    return np.asarray(x) if hasattr(x, 'shape') else x


def _config_snapshot(model):
    cfg = getattr(model, 'cfg', None)
    if cfg is not None and dataclasses.is_dataclass(cfg):
        return dataclasses.asdict(cfg)
    return None


def save_model(model, path: str) -> str:
    """Write a fitted estimator's state to checkpoint directory ``path``."""
    cls = type(model).__name__
    if cls not in STATE_FIELDS:
        raise NotImplementedError(f'no checkpoint schema for {cls}')
    os.makedirs(path, exist_ok=True)

    state = {f: _to_host(_get_path(model, f)) for f in STATE_FIELDS[cls]}
    meta = {'class': cls, 'config': _config_snapshot(model)}
    lib = getattr(model, 'library', None)
    if lib is not None:
        meta['library'] = {'n_inputs': lib.n_inputs, 'degree': lib.degree,
                           'interaction_only': lib.interaction_only,
                           'include_bias': lib.include_bias}

    with open(os.path.join(path, 'state.msgpack'), 'wb') as f:
        f.write(serialization.msgpack_serialize(state))
    with open(os.path.join(path, 'meta.json'), 'w') as f:
        json.dump(meta, f, indent=1, default=str)
    return path


def load_model(model, path: str):
    """Restore fitted state into a freshly-constructed estimator of the
    same class (build it with the same config, then load)."""
    with open(os.path.join(path, 'meta.json')) as f:
        meta = json.load(f)
    cls = type(model).__name__
    if meta['class'] != cls:
        raise ValueError(
            f"checkpoint is a {meta['class']}, got a {cls} instance")
    with open(os.path.join(path, 'state.msgpack'), 'rb') as f:
        state = serialization.msgpack_restore(f.read())
    for field, value in state.items():
        _set_path(model, field, value)
    if 'library' in meta and hasattr(model, 'library'):
        from insite_tpu.discovery.library import PolynomialLibrary
        model.library = PolynomialLibrary(**meta['library'])
    return model
