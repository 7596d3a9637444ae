#!/usr/bin/env python
"""Unified endgame TPU queue — the one parametrized successor to the
round-3/4 shell queues (queue_r3_*.sh, queue_r4[c-h].sh, archived in
tools/archive/).  Encodes every tunnel lesson those scripts learned:

  * single-instance mkdir lock held for the WHOLE run (a duplicate queue
    double-dispatches to the single-client tunnel; the r4h handoff bug was
    releasing the lock before exec'ing the next phase) — removed on exit
    with the exit status preserved;
  * PID-gated handover (--wait-pids): the jax.devices() probe is NOT a
    mutex — a new TPU process blocks indefinitely while another holds the
    tunnel, so we gate on the prior process's liveness instead;
  * dead-man's-switch deadline: an internal extender thread rolls the
    deadline file forward in short (+2700 s) steps only while the driver
    heartbeat (PROGRESS.jsonl mtime) stays fresh, so every stage budget
    stays small enough that the driver's end-of-round bench (which probes
    the tunnel for up to BENCH_WAIT_S=2700 s) can never be starved;
  * bench guard window: every budget is min(cap, remaining-600) and a
    stage is only dispatched when the budget clears --min-budget (600 s
    default — a smaller window cannot land a seed through the 50-300 s
    tunnel stall + compile, it just delays the handoff);
  * thinnest-cell-first dispatch via `tools/seed_gaps.py --next-cell`
    (one-shot priority lines in logs/markers/priority_cells jump the
    queue); vec columns that land nothing are auto-quarantined into
    logs/markers/vectorized_exclude and refilled via the standard path;
  * rc=124 (timeout) is NEVER grounds to park or quarantine a cell — a
    heavy first seed plus a tunnel stall is normal, not a fault;
  * post-gap tasks: once every main-table cell is at n=10, lines from
    logs/markers/post_tasks run FIFO ("<budget_cap>\\t<shell command>"),
    so secondary evidence (wsindy tumor columns, basin experiments,
    profile traces) uses the leftover window without a second queue.

Children are spawned in their own process group and killed by pgid on
TERM/INT — never by pattern.
"""

import argparse
import os
import shlex
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCK = os.path.join(REPO, 'logs', 'markers', 'queue.lock')
DEADLINE_FILE = os.path.join(REPO, 'logs', 'markers', 'deadline')
PRIORITY = os.path.join(REPO, 'logs', 'markers', 'priority_cells')
POST_TASKS = os.path.join(REPO, 'logs', 'markers', 'post_tasks')
VEC_EXCLUDE = os.path.join(REPO, 'logs', 'markers', 'vectorized_exclude')
PARKED = os.path.join(REPO, 'logs', 'markers', 'parked')
HEARTBEAT = os.path.join(REPO, 'PROGRESS.jsonl')


def log(qlog, msg):
    line = f'[queue] {time.strftime("%H:%M:%S")} {msg}'
    with open(qlog, 'a') as f:
        f.write(line + '\n')
    print(line, flush=True)


def read_deadline(fallback):
    try:
        with open(DEADLINE_FILE) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return fallback


def remaining(args):
    return read_deadline(args.deadline) - int(time.time())


def budget(args, cap):
    """min(cap, remaining - bench guard), floored at 0."""
    rem = remaining(args) - args.bench_guard
    return max(0, min(cap, rem))


def extend_once(args, qlog):
    """One deadline-extension check.  Returns False once the hard cap is
    reached (extender thread should stop)."""
    now = int(time.time())
    if now >= args.hard_cap:
        log(qlog, 'extender: hard cap reached; no more extensions')
        return False
    try:
        hb = os.stat(HEARTBEAT).st_mtime
    except OSError:
        hb = 0
    if now - hb < args.stale_s:
        new = now + args.extend_step
        if new > read_deadline(0):
            with open(DEADLINE_FILE, 'w') as f:
                f.write(str(new))
    else:
        log(qlog, f'extender: heartbeat stale ({int(now - hb)}s); '
                  'not extending')
    return True


def extender(args, qlog, stop):
    """Roll the deadline forward (+step) while the driver heartbeat is
    fresh; stop at the hard cap.  Replaces tools/deadline_extender.sh."""
    while not stop.wait(300):
        if not extend_once(args, qlog):
            return


def run_stage(cmd, t, qlog):
    """Run `cmd` (list) under `timeout t`, own process group, output to
    qlog.  Returns the exit code (124 = timeout)."""
    with open(qlog, 'a') as out:
        proc = subprocess.Popen(['timeout', str(t)] + cmd, cwd=REPO,
                                stdout=out, stderr=subprocess.STDOUT,
                                start_new_session=True)
    _CHILDREN.add(proc)
    try:
        return proc.wait()
    finally:
        _CHILDREN.discard(proc)


_CHILDREN = set()


def _kill_children(*_):
    for proc in list(_CHILDREN):
        try:
            os.killpg(proc.pid, signal.SIGTERM)
        except (ProcessLookupError, PermissionError):
            pass
    raise SystemExit(143)


def next_cell():
    out = subprocess.run([sys.executable, 'tools/seed_gaps.py',
                          '--next-cell'], cwd=REPO, capture_output=True,
                         text=True)
    return out.stdout.strip()


def count_cell(method, ds):
    code = (
        'import sys, importlib.util\n'
        "spec = importlib.util.spec_from_file_location('sg', 'tools/seed_gaps.py')\n"
        'sg = importlib.util.module_from_spec(spec); spec.loader.exec_module(sg)\n'
        'df = sg.protocol_df()\n'
        f"m, ds = {method!r}, {ds!r}\n"
        'print(0 if df.empty else int(df[(df.method_name == m) & '
        '(df.dataset_name == ds)].seed.nunique()))\n')
    out = subprocess.run([sys.executable, '-c', code], cwd=REPO,
                         capture_output=True, text=True)
    try:
        return int(out.stdout.strip())
    except ValueError:
        return -1


def pop_post_task():
    """Pop the first line of logs/markers/post_tasks:
    '<budget_cap>\\t<shell command>' -> (cap, command) or None."""
    try:
        with open(POST_TASKS) as f:
            lines = [l.rstrip('\n') for l in f if l.strip()]
    except OSError:
        return None
    if not lines:
        return None
    with open(POST_TASKS, 'w') as f:
        f.write('\n'.join(lines[1:]) + ('\n' if lines[1:] else ''))
    cap, _, cmd = lines[0].partition('\t')
    try:
        return int(cap), cmd
    except ValueError:
        return 2100, lines[0]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--deadline', type=int,
                   default=int(time.time()) + 2700,
                   help='fallback deadline epoch when the deadline marker '
                        'is absent (extender rolls the marker forward '
                        'while the driver heartbeat stays fresh)')
    p.add_argument('--hard-cap', type=int,
                   default=int(time.time()) + 11 * 3600,
                   help='absolute extension stop (epoch)')
    p.add_argument('--wait-pids', default='',
                   help='space-separated PIDs of prior TPU-lane processes '
                        'to wait out before the first dispatch')
    p.add_argument('--log', default='logs/queue_r5.log')
    p.add_argument('--vec-cap', type=int, default=2700)
    p.add_argument('--vec-chunk', type=int, default=5,
                   help='max seeds per vectorized dispatch (neural vec '
                        'columns honor --seed-start; the EDCT decoder fit '
                        'is seed-serial on device, so halving the seeds '
                        'halves the fit time and keeps each dispatch '
                        'inside the ~2100 s budget the rolling deadline '
                        'allows). ODE vec columns ignore seed_start and '
                        'run the full column regardless.')
    p.add_argument('--std-cap', type=int, default=2100)
    p.add_argument('--std-chunk', type=int, default=8)
    p.add_argument('--min-budget', type=int, default=600)
    p.add_argument('--bench-guard', type=int, default=600)
    p.add_argument('--extend-step', type=int, default=2700)
    p.add_argument('--stale-s', type=int, default=1500)
    p.add_argument('--epochs', type=int, default=100)
    args = p.parse_args()
    qlog = os.path.join(REPO, args.log)
    os.makedirs(os.path.join(REPO, 'logs', 'markers'), exist_ok=True)

    # single-instance lock, held for the WHOLE run (incl. post-gap tasks)
    try:
        os.mkdir(LOCK)
    except FileExistsError:
        print(f'another queue holds {LOCK}; refusing to double-dispatch',
              file=sys.stderr)
        return 75
    signal.signal(signal.SIGTERM, _kill_children)
    signal.signal(signal.SIGINT, _kill_children)
    stop = threading.Event()
    try:
        # synchronous first extension: a stale deadline marker left by a
        # prior round must not make the very first budget() check bail
        # before the extender thread's first 300 s tick
        extend_once(args, qlog)
        threading.Thread(target=extender, args=(args, qlog, stop),
                         daemon=True).start()
        log(qlog, f'start (remaining {remaining(args)}s, pid {os.getpid()})')

        for pid in args.wait_pids.split():
            pid = int(pid)
            while os.path.exists(f'/proc/{pid}'):
                log(qlog, f'waiting for prior TPU lane pid {pid}')
                time.sleep(20)
            log(qlog, f'prior TPU lane pid {pid} exited')

        vec_timeouts = {}   # method -> consecutive no-progress timeouts
        while True:
            if budget(args, args.min_budget) < args.min_budget:
                log(qlog, 'deadline window reached')
                break
            line = next_cell()
            if not line:
                task = pop_post_task()
                if task is None:
                    log(qlog, 'ALL CELLS AT n=10 and no post tasks left')
                    break
                cap, cmd = task
                t = budget(args, cap)
                if t < args.min_budget:
                    # put it back; too little window to start it
                    prev = ''
                    if os.path.exists(POST_TASKS):
                        with open(POST_TASKS) as f:
                            prev = f.read()
                    with open(POST_TASKS, 'w') as f:
                        f.write(f'{cap}\t{cmd}\n' + prev)
                    log(qlog, 'post task deferred (window too small)')
                    break
                log(qlog, f'post task (budget {t}s): {cmd}')
                rc = run_stage(['bash', '-c', cmd], t, qlog)
                log(qlog, f'post task exit={rc}')
                continue
            m, ds, n, mode, start, k = line.split()
            n, start, k = int(n), int(start), int(k)
            if mode == 'vec':
                t = budget(args, args.vec_cap)
                if t < args.min_budget:
                    log(qlog, 'window too small for a vec column; stopping')
                    break
                if m in ('ct', 'crn', 'edct', 'rmsn', 'gnet'):
                    # neural vec columns honor seed_start: dispatch the
                    # first missing consecutive range, chunked
                    vstart, vk = start, min(k, args.vec_chunk)
                else:
                    # ODE vec columns always run seeds 0..S-1
                    vstart, vk = 0, 10
                log(qlog, f'vec {m} {ds} seeds {vstart}+{vk} (n={n}, '
                          f'budget {t}s)')
                rc = run_stage([sys.executable, 'run.py', '--vectorized',
                                '--isolate', '--methods', m,
                                '--datasets', ds,
                                '--seed-start', str(vstart),
                                '--seeds', str(vk),
                                '--epochs', str(args.epochs), '--no-debug'],
                               t, qlog)
                after = count_cell(m, ds)
                log(qlog, f'vec {m} {ds} exit={rc} n: {n} -> {after}')
                # rc=124 exempt from QUARANTINE (budget exhaustion is not a
                # fault) — but a vec column is all-or-nothing, so two
                # consecutive no-progress timeouts mean the column cannot
                # fit the cap; fall back to the incremental std path rather
                # than looping the same cell forever
                if after <= n and rc not in (124,):
                    with open(VEC_EXCLUDE, 'a') as f:
                        f.write(m + '\n')
                    log(qlog, f'QUARANTINE {m}: vectorized column landed '
                              f'nothing (exit {rc}); switching to standard')
                elif after <= n and rc == 124:
                    vec_timeouts[m] = vec_timeouts.get(m, 0) + 1
                    if vec_timeouts[m] >= 2:
                        with open(VEC_EXCLUDE, 'a') as f:
                            f.write(m + '\n')
                        log(qlog, f'EXCLUDE {m}: vec column timed out '
                                  f'{vec_timeouts[m]}x with no progress; '
                                  'switching to standard (not a fault)')
                else:
                    vec_timeouts.pop(m, None)
            else:
                k = min(k, args.std_chunk)
                t = budget(args, args.std_cap)
                if t < args.min_budget:
                    log(qlog, 'window too small for a std chunk; stopping')
                    break
                log(qlog, f'std {m} {ds} seeds {start}+{k} (n={n}, '
                          f'budget {t}s)')
                # no --isolate: the tunnel charges a 50-300 s stall to every
                # fresh process's first heavy transfer; --no-debug is the
                # fault wall (a crashed seed -> errored row, chunk continues)
                rc = run_stage([sys.executable, 'run.py', '--methods', m,
                                '--datasets', ds, '--seed-start', str(start),
                                '--seeds', str(k), '--epochs',
                                str(args.epochs), '--no-debug'], t, qlog)
                after = count_cell(m, ds)
                log(qlog, f'std {m} {ds} exit={rc} n: {n} -> {after}')
                # park only on real no-progress, never on timeout (124)
                if after <= n and rc not in (124,):
                    os.makedirs(PARKED, exist_ok=True)
                    open(os.path.join(PARKED, f'{m}.{ds}'), 'w').close()
                    log(qlog, f'cell {m}/{ds} parked (no progress, '
                              f'exit {rc})')
        log(qlog, f'DONE (remaining {remaining(args)}s)')
        return 0
    finally:
        stop.set()
        try:
            os.rmdir(LOCK)
        except OSError:
            pass


if __name__ == '__main__':
    sys.exit(main())
