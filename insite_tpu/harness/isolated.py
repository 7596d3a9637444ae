"""Per-run process isolation for sweeps (``run.py --isolate``).

The reference runs each experiment inside a ``multiprocessing.Pool`` worker
(run.py:91-131), so a crashed run cannot poison the rest of the sweep.  Our
default is in-process execution (one XLA compile cache, no tunnel-warmup
cost per run), but a device-level failure — e.g. an HBM OOM — can wedge
the process's TPU backend and fail every subsequent run.  ``--isolate``
restores the reference's blast-radius semantics: each run executes in a
fresh interpreter; the parent gets the metrics dict back over stdout, and
any child failure surfaces as a normal exception for the sweep's fault
wall to convert into an ``errored`` row.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys

_MARKER = 'ISOLATED_RESULT:'


def run_isolated(dataset_name: str, method_name: str, seed: int,
                 domain_conf: float, cfg, experiment) -> dict:
    """Execute one run_experiment in a fresh interpreter, return its
    metrics dict. Raises RuntimeError on any child failure."""
    payload = json.dumps({
        'dataset_name': dataset_name,
        'method_name': method_name,
        'seed': seed,
        'domain_conf': domain_conf,
        'cfg': dataclasses.asdict(cfg),
        'experiment': experiment.name,
    })
    # the child resolves `insite_tpu` via PYTHONPATH (the package need not
    # be pip-installed, and the parent may have been launched from
    # anywhere via `python /path/to/run.py`)
    import insite_tpu
    pkg_parent = os.path.dirname(os.path.dirname(insite_tpu.__file__))
    env = dict(os.environ)
    env['PYTHONPATH'] = pkg_parent + os.pathsep + env.get('PYTHONPATH', '')
    proc = subprocess.run(
        [sys.executable, '-m', 'insite_tpu.harness.isolated'],
        input=payload, capture_output=True, text=True, env=env)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(_MARKER):
            return json.loads(line[len(_MARKER):])
    raise RuntimeError(
        f'isolated run ({dataset_name}, {method_name}, seed {seed}) '
        f'failed with exit code {proc.returncode}; stderr tail:\n'
        f'{proc.stderr[-2000:]}')


def _main():
    # honor JAX_PLATFORMS even though the container's sitecustomize already
    # imported jax and registered the TPU plugin (env alone is ignored at
    # that point — same dance as tests/conftest.py)
    import os
    platforms = os.environ.get('JAX_PLATFORMS')
    if platforms:
        import jax
        jax.config.update('jax_platforms', platforms)
        if os.environ.get('JAX_ENABLE_X64', '').lower() in ('1', 'true'):
            jax.config.update('jax_enable_x64', True)
    spec = json.loads(sys.stdin.read())
    from insite_tpu.harness.config import RunConfig
    from insite_tpu.harness.runner import Experiment, run_experiment
    result = run_experiment(spec['dataset_name'], spec['method_name'],
                            spec['seed'], spec['domain_conf'],
                            RunConfig.from_dict(spec['cfg']),
                            Experiment[spec['experiment']])
    print(_MARKER + json.dumps(result, default=float), flush=True)


if __name__ == '__main__':
    _main()
