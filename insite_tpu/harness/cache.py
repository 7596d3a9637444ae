"""Dataset-collection disk cache — the shelve cache of the reference
(runnables/run_utils.py:4-20), keyed by the stringified dataset config."""

from __future__ import annotations

import hashlib
import os
import pickle

CACHE_DIR = os.environ.get('INSITE_TPU_CACHE', '.insite_cache')


def _path(key) -> str:
    digest = hashlib.sha256(repr(key).encode()).hexdigest()[:24]
    return os.path.join(CACHE_DIR, f'collection_{digest}.pkl')


def get_cached(key):
    path = _path(key)
    if os.path.exists(path):
        with open(path, 'rb') as f:
            return pickle.load(f)
    return None


def put_cached(key, collection):
    os.makedirs(CACHE_DIR, exist_ok=True)
    with open(_path(key), 'wb') as f:
        pickle.dump(collection, f)
