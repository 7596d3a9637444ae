#!/usr/bin/env python
"""Vec-EDCT crash postmortem: measured HBM analysis + fix validation
(VERDICT r4 #2).

Runs ONE vectorized EDCT column (default 2 seeds on EQ_4_A) with
`_fit_br_stage(compile_probe=...)` patched in, which AOT-compiles the
three column-fit formulations per stage — vmap-over-seeds (faulted the
v5e worker at S=10/5/2), lax.map-over-seeds (faulted too,
logs/queue_r5.log 08:17-08:39), and the single-seed host-loop body (the
shipped fix) — recording each executable's XLA `memory_analysis()` to
logs/edct_hbm.jsonl WITHOUT executing the faulting variants.  The column
itself then runs on the fixed host-serial path, so a clean exit is also
the on-TPU validation that the fix holds.

Summarizes both into logs/edct_hbm.md.

Usage (TPU lane — dispatch via the queue's post_tasks):
    python tools/edct_hbm.py [--dataset EQ_4_A] [--seeds 2] [--epochs 100]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path[0] = '/root/repo'   # tools/queue.py shadows stdlib `queue`

V5E_HBM = 16 * 1024 ** 3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dataset', default='EQ_4_A')
    p.add_argument('--seeds', type=int, default=2)
    p.add_argument('--epochs', type=int, default=100)
    p.add_argument('--jsonl', default='logs/edct_hbm.jsonl')
    p.add_argument('--out', default='logs/edct_hbm.md')
    p.add_argument('--train-samples', type=int, default=1000)
    p.add_argument('--platform', default=None, choices=('cpu', 'tpu'))
    args = p.parse_args()

    if args.platform == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')

    if os.path.exists(args.jsonl):   # stale records skew stage labels
        os.remove(args.jsonl)
    from insite_tpu.harness import vectorized_neural as vn
    vn._fit_br_stage = functools.partial(vn._fit_br_stage,
                                         compile_probe=args.jsonl)
    t0 = time.time()
    num_patients = {'train': args.train_samples, 'val': 100, 'test': 100}
    r = vn.vectorized_enc_dec_sweep('edct', args.dataset,
                                    n_seeds=args.seeds, epochs=args.epochs,
                                    num_patients=num_patients)
    wall = time.time() - t0
    import numpy as np
    enc = np.asarray(r['encoder_test_rmse_orig'])

    recs = [json.loads(l) for l in open(args.jsonl)]
    lines = [
        '# Vec-EDCT HBM analysis + host-serial fix validation',
        '',
        f'Backend: {recs[0].get("backend")} | dataset {args.dataset}, '
        f'S={args.seeds} stacked seeds, {args.epochs} epochs | '
        f'v5e HBM budget {V5E_HBM / 2**30:.0f} GiB',
        '',
        'Each vectorized EDCT stage fit AOT-compiled in three '
        'formulations (XLA `memory_analysis()`, no execution of the '
        'faulting variants). Stages appear in pipeline order: encoder '
        'fit, then decoder fit (exploded rolling-origin rows x '
        'cross-attention — the program whose vmap/lax.map forms fault '
        'the worker).',
        '',
        '| stage | variant | S | args MiB | temp MiB | output MiB | '
        'gen code MiB | compile s |',
        '|---|---|---|---|---|---|---|---|',
    ]
    stage_names = ['encoder', 'decoder']
    per_stage = max(1, len(recs) // len(stage_names)) \
        if len(recs) >= 2 else 1
    for i, rec in enumerate(recs):
        stage = stage_names[min(i // 3, len(stage_names) - 1)]
        if 'error' in rec:
            lines.append(f'| {stage} | {rec["variant"]} | '
                         f'{rec["n_seeds"]} | compile error: '
                         f'{rec["error"][:120]} | | | | '
                         f'{rec.get("compile_s", "")} |')
            continue
        mib = 2 ** 20

        def g(k):
            return f'{rec.get(k, 0) / mib:.0f}'

        lines.append(
            f'| {stage} | {rec["variant"]} | {rec["n_seeds"]} | '
            f'{g("argument_size_in_bytes")} | {g("temp_size_in_bytes")} | '
            f'{g("output_size_in_bytes")} | '
            f'{g("generated_code_size_in_bytes")} | '
            f'{rec["compile_s"]} |')
    lines += [
        '',
        f'**Fix validation**: the column itself ran on the host-serial '
        f'decoder path and completed in {wall:.0f} s wall; encoder '
        f'1-step RMSEs {np.round(enc, 4).tolist()} — no worker fault.',
        '',
        'Reading: if every variant fits far inside the 16 GiB budget, '
        'the historical worker crash is NOT an HBM overflow (a true '
        'overflow raises RESOURCE_EXHAUSTED, not a worker kill) but a '
        'fault in the compiled seed-wrapped mega-program, which is why '
        'the host-loop formulation — same math, no device-side seed '
        'wrapper — is the shipped path.',
        '',
    ]
    with open(args.out, 'w') as f:
        f.write('\n'.join(lines))
    print(f'wrote {args.out} ({len(recs)} probe records, column wall '
          f'{wall:.0f}s)')


if __name__ == '__main__':
    main()
