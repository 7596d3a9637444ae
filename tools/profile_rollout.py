#!/usr/bin/env python
"""Device-time profile: Pallas plane-layout rollout kernel vs the XLA
`lax.scan` rollout (VERDICT r4 #3 — substantiate the kernel-speed claim
with a checked-in artifact instead of an assertion).

Measures, at counterfactual-test scale (exploded cf rows of a full-size
protocol dataset):
  * per-call DEVICE time of each backend, measured by looping K chained
    calls inside ONE jit (dispatch/tunnel overhead amortised away — the
    axon tunnel adds 50-300 ms per blocking transfer, which would drown
    the kernel itself if timed per dispatch);
  * XLA `memory_analysis()` (HBM argument/temp/output bytes) for both;
  * the Pallas kernel's static VMEM working set from its block shapes
    (everything the kernel touches between HBM loads);
and for the fine-tune path, the forward-sensitivity kernel
(`pallas_rollout_with_sens`) vs XLA jvp-through-scan used by the
Gauss-Newton fine-tune.

Writes logs/profile_r5.md and optionally a raw jax.profiler trace under
logs/profiles/ (--trace).

Usage (TPU lane — dispatch via the queue's post_tasks):
    python tools/profile_rollout.py [--rows 25600] [--reps 50] [--trace]
"""

import argparse
import sys
import time

sys.path[0] = '/root/repo'   # tools/queue.py shadows stdlib `queue`

import numpy as np


def device_time_per_call(fn_one, args, reps):
    """Median device time per call: run `reps` chained calls inside one
    jit (the chain feeds epsilon of each output into the next y0 so XLA
    cannot elide or parallelise the iterations), timed around a single
    block_until_ready.  One untimed warmup call absorbs compile + the
    tunnel's first-transfer stall."""
    import jax
    import jax.numpy as jnp

    def chained(coefs, y0, statics, arms):
        def body(carry, _):
            out = fn_one(coefs, carry, statics, arms)
            return y0 + 1e-12 * out[:, -1], out[:, -1]

        final, _ = jax.lax.scan(body, y0, None, length=reps)
        return final

    f = jax.jit(chained)
    f(*args).block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        f(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / reps


def memory_rows(fn_one, args):
    import jax
    ma = jax.jit(fn_one).lower(*args).compile().memory_analysis()
    out = {}
    for attr in ('argument_size_in_bytes', 'output_size_in_bytes',
                 'temp_size_in_bytes', 'generated_code_size_in_bytes'):
        out[attr] = int(getattr(ma, attr, 0))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rows', type=int, default=25600,
                   help='batch rows (cf-test scale: 100 test patients '
                        'explode to ~25k rolling-origin cf rows)')
    p.add_argument('--reps', type=int, default=50)
    p.add_argument('--trace', action='store_true',
                   help='also write a raw jax.profiler trace')
    p.add_argument('--out', default='logs/profile_r5.md')
    p.add_argument('--platform', default=None, choices=('cpu', 'tpu'))
    args = p.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from insite_tpu.discovery import PolynomialLibrary
    from insite_tpu.models.sindy import batched_rollout
    from insite_tpu.ops import pallas_batched_rollout
    from insite_tpu.ops.pallas_rollout import LANES, SUBLANES

    interpret = jax.default_backend() != 'tpu'
    B, T, A, S = args.rows, 60, 2, 2
    lib = PolynomialLibrary(n_inputs=1 + S, degree=2)
    F = len(lib.exponents())
    rng = np.random.RandomState(0)
    dt = 0.041666666
    coefs = jnp.asarray(rng.uniform(-0.3, 0.0, (1, A, F)), jnp.float32)
    y0 = jnp.asarray(rng.uniform(0.5, 5.0, B), jnp.float32)
    statics = jnp.asarray(rng.uniform(0.5, 2.0, (B, S)), jnp.float32)
    arms = jnp.asarray(rng.randint(0, A, (B, T)), jnp.int32)
    w = (B, T, A, F, S)

    def xla_call(c, y, s, a):
        return batched_rollout(lib, c, y, s, a, dt, shared_coefs=True)

    def pallas_call_(c, y, s, a):
        return pallas_batched_rollout(lib, c, y, s, a, dt,
                                      shared_coefs=True,
                                      interpret=interpret)

    # numerical agreement first (the comparison is meaningless otherwise)
    ref = np.asarray(xla_call(coefs, y0, statics, arms))
    got = np.asarray(pallas_call_(coefs, y0, statics, arms))
    max_rel = float(np.max(np.abs(got - ref) /
                           (1e-6 + np.abs(ref))))

    t_xla = device_time_per_call(xla_call, (coefs, y0, statics, arms),
                                 args.reps)
    t_pal = device_time_per_call(pallas_call_, (coefs, y0, statics, arms),
                                 args.reps)
    m_xla = memory_rows(xla_call, (coefs, y0, statics, arms))
    m_pal = memory_rows(pallas_call_, (coefs, y0, statics, arms))

    if args.trace and jax.default_backend() == 'tpu':
        import os
        os.makedirs('logs/profiles', exist_ok=True)
        with jax.profiler.trace('logs/profiles'):
            jax.block_until_ready(
                pallas_call_(coefs, y0, statics, arms))
            jax.block_until_ready(xla_call(coefs, y0, statics, arms))

    # static VMEM working set of one Pallas grid program (block shapes
    # from pallas_batched_rollout's in/out specs + the unrolled planes)
    fb = 4  # f32
    vmem = (A * F + 1 + S + 2 * T) * SUBLANES * LANES * fb
    substeps_note = ('all T steps integrated VMEM-resident per 1024-'
                     'patient grid program; zero HBM round-trips inside')

    mib = 2 ** 20
    lines = [
        '# Rollout kernel profile — Pallas plane-layout vs XLA scan',
        '',
        f'Backend: **{jax.default_backend()}** '
        f'({"interpret-mode Pallas — times NOT meaningful" if interpret else "compiled"}) | '
        f'workload B={B} rows x T={T} steps, A={A} arms, F={F} features, '
        f'{args.reps} chained in-jit reps, best of 3',
        '',
        f'max rel. deviation Pallas vs XLA outputs: {max_rel:.3g}',
        '',
        '| backend | device time / call | rows/s | HBM args MiB | '
        'HBM temp MiB | HBM out MiB |',
        '|---|---|---|---|---|---|',
        f'| XLA `lax.scan` | {t_xla * 1e3:.3f} ms | {B / t_xla:,.0f} | '
        f'{m_xla["argument_size_in_bytes"] / mib:.1f} | '
        f'{m_xla["temp_size_in_bytes"] / mib:.1f} | '
        f'{m_xla["output_size_in_bytes"] / mib:.1f} |',
        f'| Pallas kernel | {t_pal * 1e3:.3f} ms | {B / t_pal:,.0f} | '
        f'{m_pal["argument_size_in_bytes"] / mib:.1f} | '
        f'{m_pal["temp_size_in_bytes"] / mib:.1f} | '
        f'{m_pal["output_size_in_bytes"] / mib:.1f} |',
        '',
        f'**Speedup: {t_xla / t_pal:.2f}x** (device time, '
        'dispatch/tunnel overhead amortised by the in-jit chain).',
        '',
        f'Pallas VMEM working set per grid program: '
        f'{vmem / 2 ** 10:.0f} KiB '
        f'({A * F} coef planes + state + {S} static planes + {T} arm '
        f'planes + {T} output planes, each [8, 128] f32; {substeps_note}).',
        '',
    ]
    with open(args.out, 'w') as f:
        f.write('\n'.join(lines))
    print('\n'.join(lines[6:12]))
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
