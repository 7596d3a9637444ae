"""Eager debugging shims: run traced code as Python loops.

The reference debugs jit/vmap/scan code by swapping in python-loop
equivalents (`debug_vmap` / `debug_scan`, pkpd/utils.py:337-365). Same
tools here — drop-in signatures, so a kernel can be exercised eagerly
(breakpoints, prints, NaN hunting) without changing the call site:

    # preds = jax.vmap(finetune_row)(prev, statics, arms, lengths)
    preds = debug_vmap(finetune_row, (prev, statics, arms, lengths))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def debug_vmap(fn, args, in_axes=0, progress: bool = False):
    """Eager vmap: apply ``fn`` per leading-axis slice in a Python loop and
    stack the results (pytree outputs supported)."""
    n_args = len(args)
    axes = in_axes if isinstance(in_axes, (tuple, list)) \
        else (in_axes,) * n_args
    lengths = [a.shape[ax] for a, ax in zip(args, axes) if ax is not None]
    assert lengths and len(set(lengths)) == 1, \
        f'inconsistent mapped lengths {lengths}'
    outs = []
    for i in range(lengths[0]):
        sliced = [a if ax is None else jnp.take(a, i, axis=ax)
                  for a, ax in zip(args, axes)]
        outs.append(fn(*sliced))
        if progress:
            print(f'[debug_vmap] {i + 1}/{lengths[0]}')
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)


def debug_scan(f, init, xs, length=None, progress: bool = False):
    """Eager lax.scan: python loop with the same (carry, ys) contract."""
    if xs is None:
        assert length is not None
        xs_list = [None] * length
    else:
        n = len(jax.tree_util.tree_leaves(xs)[0])
        if length is not None and length != n:
            raise ValueError(f'length={length} does not match xs leading '
                             f'dimension {n}')   # lax.scan errors here too
        xs_list = [jax.tree_util.tree_map(lambda a: a[i], xs)
                   for i in range(n)]
    carry, ys = init, []
    for i, x in enumerate(xs_list):
        carry, y = f(carry, x)
        ys.append(y)
        if progress:
            print(f'[debug_scan] {i + 1}/{len(xs_list)}')
    if not ys:
        return carry, None   # zero-length scan: no ys to stack
    stacked = (None if ys[0] is None else
               jax.tree_util.tree_map(lambda *zs: jnp.stack(zs), *ys))
    return carry, stacked


def find_nonfinite(tree, name: str = 'tree'):
    """Report which leaves contain NaN/Inf (and where) — the assert-based
    NaN guards of the reference (pkpd_simulation.py:308,468) as a tool."""
    tree = jax.device_get(tree)   # ONE batched fetch (see CLAUDE.md)
    bad = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        try:
            finite = np.isfinite(arr)   # works for bf16/f8 too, unlike
        except TypeError:               # issubdtype(dtype, np.floating)
            continue                    # (ints, bools, strings)
        if not finite.all():
            idx = np.argwhere(~finite)
            bad[jax.tree_util.keystr(path)] = (int((~finite).sum()),
                                               idx[:5].tolist())
    if bad:
        print(f'[find_nonfinite] {name}: {bad}')
    return bad
