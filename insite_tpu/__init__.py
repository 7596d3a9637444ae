"""insite_tpu — TPU-native framework for ODE discovery for longitudinal
heterogeneous treatment-effects inference (INSITE, A-SINDy, A-WSINDy and the
neural/classical baselines MSM / RMSN / CRN / G-Net / CT / EDCT).

A from-scratch JAX/XLA re-design of the capabilities of the reference
benchmark harness `samholt/ODE-Discovery-for-Longitudinal-Heterogeneous-
Treatment-Effects-Inference` (mounted read-only at /root/reference; see
SURVEY.md for the component map).  Everything on the compute path is a pure
function over arrays, jit/vmap/shard_map-able over a `jax.sharding.Mesh`:

- `insite_tpu.core`       fixed-step sub-stepped Euler integrator, masking,
                          dtype policy (reference: libs_m/ct/src/data/pkpd/utils.py:68-94)
- `insite_tpu.sim`        the three synthetic simulators (PKPD EQ_4, cancer
                          PKPD, continuous EQ_5) as closed-form batched array
                          programs (reference: src/data/{pkpd,cancer_sim,continuous})
- `insite_tpu.data`       dataset processing pipeline: scaling, one-hot
                          treatments, active-entry masks, trajectory explosion,
                          rolling-origin splits (reference: src/data/*/dataset.py)
- `insite_tpu.discovery`  polynomial/weak-form candidate libraries, smoothed
                          finite differences, STLSQ/SR3 as batched masked ridge
                          (replaces pysindy; reference: pkpd/utils.py:96-335)
- `insite_tpu.models`     INSITE / SINDy / WSINDy estimators + neural baselines
- `insite_tpu.eval`       normalized masked RMSE protocol + sweep aggregation
- `insite_tpu.parallel`   mesh/sharding helpers (batch data-parallel over ICI)
- `insite_tpu.harness`    experiment orchestration, config, caching, logging
"""

__version__ = "0.1.0"

# Repo-local persistent XLA compile cache for every entrypoint (sweep CLI,
# driver hooks, library use — bench.py set this up only for itself, so each
# sweep process was recompiling the simulators from scratch: ~5 min of the
# wall-clock of every neural run on the tumor family). The container's
# sitecustomize imports jax before us, so set the config directly too.
import os as _os

_cache = _os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".jax_cache"))
try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _cache)
except Exception:       # pragma: no cover - jax always present in practice
    pass
