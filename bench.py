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
from time import sleep, time

# repo-local persistent compilation cache: the XLA programs (notably the
# jacfwd-through-scan Gauss-Newton fine-tune) compile in minutes but run in
# seconds; the cache survives /tmp cleanup between driver runs
_default_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _default_cache)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

# BENCH_PLATFORM=cpu: smoke the bench on the host backend (e.g. while the
# single-client TPU tunnel is held or down). Must flip the already-imported
# jax config — the container's sitecustomize imports jax (registering the
# TPU plugin) before env vars can take effect, so JAX_PLATFORMS=cpu alone
# still blocks on the tunnel.
_PLATFORM = os.environ.get("BENCH_PLATFORM")
if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

from insite_tpu.data import PkpdDatasetCollection  # noqa: E402
from insite_tpu.models.sindy import SINDyConfig, SINDyRegressor  # noqa: E402
from insite_tpu.sim import pkpd  # noqa: E402


def warmup(mode):
    """Touch the device + transfer path once before the clock starts: the
    remote-TPU tunnel sporadically stalls 50-300 s on a fresh process's
    first heavy interaction (one-time environment cost, not workload)."""
    t0 = time()
    x = jnp.ones((256, 64))
    np.asarray(jnp.cumsum(x, axis=1))
    if mode == "fused":
        from insite_tpu.harness.northstar import fused_northstar
        fused_northstar(8, seed=1)
    else:
        coll = PkpdDatasetCollection(
            conf_coeff=2.0, num_patients={'train': 8, 'val': 4, 'test': 2},
            equation_str='EQ_4_D', seed=1)
        cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                          sindy_alpha=0.5, lam=10.0, insite=True)
        m = SINDyRegressor(cfg, coll)
        m.fit(coll.train_f)
        m._fine_tuned_rollout(coll.train_f, projection_horizon=1)
    print(f"[bench] warmup (untimed, absorbs link stalls + small-shape "
          f"compiles): {time() - t0:.2f}s", file=sys.stderr)


def wait_for_backend():
    """Bounded wait for the remote-TPU tunnel: a transient outage (or a
    sweep holding the single-client tunnel) must not zero a round's perf
    evidence. Probes in a SUBPROCESS so a failed backend init can't be
    cached by this process's jax, and a wedged probe can be timed out.

    Returns the suffix to append to the metric name: '' when the TPU
    answered, '_cpu_fallback' when the wait budget expired and the bench
    degraded to the host backend (the workload is identical — same 10k
    cohort, same programs — only the device differs, and the metric name
    says so). Disable with BENCH_CPU_FALLBACK=0 to keep the old abort."""
    import subprocess
    if _PLATFORM == "cpu":
        return "_cpu"               # host backend requested explicitly
    # default sized to outlast one endgame queue stage: stage budgets are
    # capped at 2100 s (tools/deadline_extender.sh rolls the queue deadline
    # in now+2700 steps, budgets are remaining-600), so a bench launched
    # while a sweep holds the single-client tunnel always gets the TPU
    # when that stage ends instead of degrading to the CPU fallback
    wait_budget = float(os.environ.get("BENCH_WAIT_S", 2700))
    fallback = os.environ.get("BENCH_CPU_FALLBACK", "1") != "0"
    deadline = time() + wait_budget
    tries = 0
    while True:
        tries += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=420, capture_output=True)
            if r.returncode == 0:
                if tries > 1:
                    print(f"[bench] backend answered on probe {tries}",
                          file=sys.stderr, flush=True)
                return ""
        except subprocess.TimeoutExpired:
            pass
        if time() >= deadline:
            if fallback:
                print(f"[bench] TPU tunnel unavailable after "
                      f"{wait_budget:.0f}s ({tries} probes) — degrading to "
                      f"the host backend (metric suffixed _cpu_fallback)",
                      file=sys.stderr, flush=True)
                jax.config.update("jax_platforms", "cpu")
                return "_cpu_fallback"
            print(f"[bench] backend unavailable after {wait_budget:.0f}s "
                  f"({tries} probes) — aborting", file=sys.stderr,
                  flush=True)
            sys.exit(3)
        print(f"[bench] backend unavailable/busy (probe {tries}); "
              f"retrying in 60s", file=sys.stderr, flush=True)
        sleep(60)


def main():
    n_train = int(os.environ.get("BENCH_PATIENTS", 10_000))
    suffix = wait_for_backend()
    # the tunnel can still wedge between the probe and our first transfer;
    # guard ONLY the stall-prone init+warmup phase with a hard deadline —
    # the timed benchmark itself must not be killed mid-compile
    import threading
    budget = float(os.environ.get("BENCH_TIMEOUT_S", 1800))

    def _deadline():
        print(f"[bench] TIMEOUT after {budget:.0f}s (TPU tunnel "
              f"unavailable or stalled) — aborting", file=sys.stderr,
              flush=True)
        os._exit(3)

    killer = threading.Timer(budget, _deadline)
    killer.daemon = True
    killer.start()
    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)
    # 'fused' (default): the whole simulate+design+QR as ONE device
    # program, F x F STLSQ on host, fine-tune as the second program —
    # same cohort and coefficients as the standard path
    # (tests/test_northstar.py), minus its per-stage host<->device
    # roundtrips. BENCH_MODE=standard keeps the collection+fit path.
    mode = os.environ.get("BENCH_MODE", "fused")
    warmup(mode)
    killer.cancel()

    if mode == "fused":
        from insite_tpu.harness.northstar import fused_northstar
        # device-time attribution: after the timed pass, each device
        # program is re-dispatched N times (compiled, inputs resident) and
        # the min wall-clock reported — separates remote-tunnel stalls
        # (spiky, filtered by the min) from code regressions. The repeats
        # run OUTSIDE the timed window.
        repeats = int(os.environ.get("BENCH_DEVICE_REPEATS", 2))
        r = fused_northstar(n_train, seed=0, equation_name='EQ_4_D',
                            projection_horizon=1,
                            device_time_repeats=repeats)
        # the repeats run after the timed stages; the headline wall metric
        # is the sum of the four timed stages, as before
        total = r['total']
        print(f"[bench] fused: sim+design+QR {r['t_sim_design']:.2f}s | "
              f"host STLSQ {r['t_stlsq']:.3f}s | fine-tune "
              f"{r['t_finetune']:.2f}s | metric {r['t_metric']:.2f}s",
              file=sys.stderr)
        if 'device_sim_design_s' in r:
            print(f"[bench] device-time (min of {repeats} re-dispatches): "
                  f"sim+design+QR {r['device_sim_design_s']:.2f}s | "
                  f"fine-tune {r['device_finetune_s']:.2f}s", file=sys.stderr)
        print(f"[bench] {r['global_equation_string']}", file=sys.stderr)
        print(f"[bench] factual normalised RMSE: orig={r['rmse_orig']:.4f}%"
              f" all={r['rmse_all']:.4f}%", file=sys.stderr)
        out = {
            "metric": "eq4_10k_simulate_discover_finetune_wall_s" + suffix,
            "value": round(total, 2),
            "unit": "s",
            "vs_baseline": round(60.0 / total, 3),
        }
        if 'device_sim_design_s' in r:
            out["device_time_s"] = {
                "sim_design": round(r['device_sim_design_s'], 2),
                "finetune": round(r['device_finetune_s'], 2),
                "total": round(r['device_sim_design_s']
                               + r['device_finetune_s'], 2),
            }
        print(json.dumps(out))
        return

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
    print(f"[bench] INSITE fine-tune ({n_train} patients, vmapped "
          f"Gauss-Newton): {t_ft:.2f}s", file=sys.stderr)

    total = time() - t0

    # sanity: fine-tuned factual fit quality (normalised RMSE %, should be
    # at the INSITE level ~0.02-0.1%)
    from insite_tpu.eval.metrics import normalised_masked_rmse
    rmse_orig, rmse_all = normalised_masked_rmse(coll.train_f,
                                                 np.asarray(preds))
    print(f"[bench] factual normalised RMSE: orig={rmse_orig:.4f}% "
          f"all={rmse_all:.4f}%", file=sys.stderr)

    print(json.dumps({
        "metric": "eq4_10k_simulate_discover_finetune_wall_s" + suffix,
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(60.0 / total, 3),
    }))


if __name__ == "__main__":
    main()
