#!/usr/bin/env python
"""Bit-parity probe: our EQ_4 cohort generation vs the reference's.

The reference's PKPD generator is itself jax-based (pkpd/dataset.py:52-54
seeds `jax.random.PRNGKey(seed)` and pkpd_simulation.py draws from it), so
cohort bit-parity at equal seed is directly testable: import the
reference's `generate_params`/`simulate_*` (stubbing its unused pysindy /
sympy2jax imports), generate an EQ_4 cohort, and compare array-for-array
with `insite_tpu.sim.pkpd` under the identical key-split sequence
(`data/collection.py::PkpdDatasetCollection.subset`).

This is the evidence VERDICT r4 #6 asks for: if the cohorts are
bit-identical, the MSM EQ_4 deltas in PARITY.md are estimator-side (our
host-f64 L-BFGS logistic + WLS vs sklearn), and the *cell-mean* gap is the
reference's shared-cohort artifact (its shipped msm EQ_4 rows are
bit-identical across all 10 "seeds" — std 0.0 in final_with_insite.txt).

Usage: python tools/pkpd_cohort_parity.py [--seed 0] [--eq EQ_4_D] [--n 1000]
CPU-only (never touches the TPU tunnel): the reference module forces
jax_platform_name=cpu + x64 at import; we pre-force jax_platforms=cpu.
"""

import argparse
import sys
import types

import numpy as np


def _stub(name, attrs=()):
    mod = types.ModuleType(name)
    for a in attrs:
        setattr(mod, a, type(a, (), {}))
    sys.modules[name] = mod
    return mod


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--eq', default='EQ_4_D')
    p.add_argument('--n', type=int, default=1000)
    p.add_argument('--conf-coeff', type=float, default=2.0)
    args = p.parse_args()

    # sys.path[0] is tools/, where queue.py shadows the stdlib `queue`
    # that torch imports — drop it before any heavy import
    sys.path[0] = '/root/repo'

    import jax
    jax.config.update('jax_platforms', 'cpu')   # sitecustomize imported jax
    jax.config.update('jax_enable_x64', True)

    # the reference module imports pysindy/sympy2jax/torch.multiprocessing
    # at module scope but generate_params/simulate_* never touch them
    _stub('pysindy', ['SINDy'])
    _stub('pysindy.feature_library', ['PolynomialLibrary'])
    _stub('pysindy.differentiation',
          ['FiniteDifference', 'SmoothedFiniteDifference'])
    _stub('pysindy.optimizers', [])
    _stub('pysindy.optimizers.base', ['BaseOptimizer'])
    _stub('sympy2jax', ['SymbolicModule'])
    _stub('equinox', ['Module'])
    # load pkpd_simulation/utils directly from file, bypassing the
    # src.data package __init__ (which drags in pytorch_lightning)
    import importlib.util
    base = '/root/reference/libs_m/ct/src/data/pkpd'
    for pkg in ('src', 'src.data', 'src.data.pkpd'):
        m = types.ModuleType(pkg)
        m.__path__ = []
        sys.modules.setdefault(pkg, m)

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load('src.data.pkpd.utils', f'{base}/utils.py')
    ref = load('src.data.pkpd.pkpd_simulation', f'{base}/pkpd_simulation.py')

    import jax.numpy as jnp
    from insite_tpu.sim import pkpd as ours

    eq_ref = ref.Equation[args.eq]
    eq_our = ours.Equation[args.eq]

    def gen(mod, eq, mode, dtype=None):
        key = jax.random.PRNGKey(args.seed)
        key, sub = jax.random.split(key)
        kw = {} if dtype is None else {'dtype': dtype}
        params = mod.generate_params(args.n, conf_coeff=args.conf_coeff,
                                     window_size=15, lag=0, key=sub,
                                     equation=eq, **kw)
        key, sub = jax.random.split(key)
        if mode == 'factual':
            data = mod.simulate_factual(params, 60, key=sub, equation=eq,
                                        **kw)
        else:
            data = mod.simulate_counterfactual_1_step(params, 60, key=sub,
                                                      equation=eq, **kw)
        return params, data

    rows = []
    for mode in ('factual', 'counterfactual_one_step'):
        p_ref, d_ref = gen(ref, eq_ref, mode)
        p_our, d_our = gen(ours, eq_our, mode, dtype=jnp.float64)
        common = sorted(set(d_ref) & set(d_our))
        only_ref = sorted(set(d_ref) - set(d_our))
        only_our = sorted(set(d_our) - set(d_ref))
        print(f'== {mode}: {len(common)} shared keys '
              f'(ref-only {only_ref}, ours-only {only_our})')
        for k in common:
            a, b = np.asarray(d_ref[k]), np.asarray(d_our[k])
            if a.shape != b.shape:
                rows.append((mode, k, 'SHAPE', f'{a.shape} vs {b.shape}'))
                continue
            if a.dtype.kind in 'fc':
                d = float(np.max(np.abs(a - b))) if a.size else 0.0
                rows.append((mode, k, 'ok' if d == 0.0 else f'max|d|={d:g}',
                             ''))
            else:
                neq = int((a != b).sum())
                rows.append((mode, k, 'ok' if neq == 0 else f'{neq} differ',
                             ''))
        # param-level check too (hidden patient parameters)
        for k in sorted(set(p_ref) & set(p_our)):
            a, b = np.asarray(p_ref[k]), np.asarray(p_our[k])
            if a.shape == b.shape and a.dtype.kind in 'fc':
                d = float(np.max(np.abs(a - b))) if a.size else 0.0
                if d != 0.0:
                    rows.append((mode, f'param:{k}', f'max|d|={d:g}', ''))

    bad = [r for r in rows if r[2] != 'ok']
    for r in rows:
        print('  ', *r)
    print('RESULT:', 'BIT-IDENTICAL' if not bad else
          f'{len(bad)} mismatching arrays')
    return 0 if not bad else 1


if __name__ == '__main__':
    sys.exit(main())
