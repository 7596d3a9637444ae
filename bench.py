"""Driver benchmark: the BASELINE.json north star.

Simulate a 10k-patient EQ_4 PKPD cohort, run STLSQ discovery, and INSITE
per-patient fine-tuning — wall-clock on one TPU chip, target < 60 s
(reference harness: ~96 s for INSITE on a 1.2k-patient cohort on CPU,
BASELINE.md wall-clock table).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1.0 means faster than the 60 s target.
"""

import json
import os
import sys
from time import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from insite_tpu.data import PkpdDatasetCollection  # noqa: E402
from insite_tpu.models.sindy import SINDyConfig, SINDyRegressor  # noqa: E402
from insite_tpu.sim import pkpd  # noqa: E402


def main():
    n_train = int(os.environ.get("BENCH_PATIENTS", 10_000))
    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    t0 = time()
    # --- simulate the cohort (10k factual + small val/test) ---------------
    coll = PkpdDatasetCollection(
        conf_coeff=2.0,
        num_patients={'train': n_train, 'val': 100, 'test': 2},
        equation_str='EQ_4_D', seed=0)
    jax.effects_barrier()
    t_sim = time() - t0
    print(f"[bench] simulate+process: {t_sim:.2f}s", file=sys.stderr)

    # --- STLSQ discovery ---------------------------------------------------
    t1 = time()
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, insite=True,
                      bfgs_tol=1e-9, bfgs_maxiter=100)
    model = SINDyRegressor(cfg, coll)
    model.fit(coll.train_f)
    t_fit = time() - t1
    print(f"[bench] discovery (STLSQ x2 arms over "
          f"{n_train}x59 samples): {t_fit:.2f}s", file=sys.stderr)
    print(f"[bench] {model.global_equation_string}", file=sys.stderr)

    # --- INSITE per-patient fine-tune over the full cohort -----------------
    t2 = time()
    preds = model._fine_tuned_rollout(coll.train_f, projection_horizon=1)
    t_ft = time() - t2
    print(f"[bench] INSITE fine-tune ({n_train} patients, vmapped BFGS): "
          f"{t_ft:.2f}s", file=sys.stderr)

    total = time() - t0

    # sanity: fine-tuned factual fit quality (normalised RMSE %, should be
    # at the INSITE level ~0.02-0.1%)
    from insite_tpu.eval.metrics import normalised_masked_rmse
    rmse_orig, rmse_all = normalised_masked_rmse(coll.train_f,
                                                 np.asarray(preds))
    print(f"[bench] factual normalised RMSE: orig={rmse_orig:.4f}% "
          f"all={rmse_all:.4f}%", file=sys.stderr)

    print(json.dumps({
        "metric": "eq4_10k_simulate_discover_finetune_wall_s",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(60.0 / total, 3),
    }))


if __name__ == "__main__":
    main()
