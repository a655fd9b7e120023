#!/usr/bin/env python
"""Batch-size x in-flight-bound sweep of the headline streaming path.

The headline is transport-bound on this rig (true device compute
~0.18 ms/frame vs a fixed 10s-of-ms per-batch transport cost), so fps
rises with batch size until HBM limits queue depth: past batch 128 the
async dispatch stream keeps several multi-GB f16 outputs in flight and
OOMs. ``iter_batches(max_inflight=k)`` bounds the queue with a
corner-probe fetch per batch (overlapped with compute), making
batch >= 192 measurable.

Each cell is health-gated and cold (plan cache off). Run when the
tunnel is healthy; a 100x collapse between cells is the tunnel, not
the code.

Usage: python scripts/batch_sweep.py [--frames-mult 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

if os.environ.get('CANVAS_FORCE_CPU'):
    import jax

    jax.config.update('jax_platforms', 'cpu')


def run_cell(batch, inflight, frames_mult):
    """One health-gated cold measurement; prints one JSON row.

    A fully-down tunnel hangs the first device op with no in-process
    recovery; bound the cell so it can't hang the driving sweep
    (CANVAS_SWEEP_WATCHDOG seconds, default 30 min, 0 disables —
    bench.py's watchdog is now internal to bench.main()'s budget)."""
    import threading

    limit = float(os.environ.get('CANVAS_SWEEP_WATCHDOG', '1800'))
    done = threading.Event()
    if limit > 0:
        def watch():
            if not done.wait(limit):
                print(json.dumps({'batch': batch, 'inflight': inflight,
                                  'fps': 0.0,
                                  'error': 'watchdog_%ds' % int(limit)}),
                      flush=True)
                os._exit(2)
        threading.Thread(target=watch, daemon=True,
                         name='sweep-watchdog').start()

    from benchmarks import health_gate, timeit_batches
    from bench import build_timeline
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i

    health_gate()
    planner = render.RenderPlanner(build_timeline(4096),
                                   box2i(0, 0, 1919, 1079))
    t0 = time.perf_counter()
    fps = timeit_batches(planner, batch, frames_mult * batch,
                         max_inflight=inflight or None)
    row = {'batch': batch, 'inflight': inflight,
           'fps': round(fps, 1),
           'wall_s': round(time.perf_counter() - t0, 1)}
    done.set()
    print(json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames-mult', type=int, default=3,
                    help='timed frames = mult * batch')
    ap.add_argument('--cells', default='64:0,128:0,128:3,192:3,256:3,256:2',
                    help='comma list of batch:inflight (0 = unbounded)')
    ap.add_argument('--one-cell', default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.one_cell:
        batch_s, inflight_s = args.one_cell.split(':')
        run_cell(int(batch_s), int(inflight_s), args.frames_mult)
        return

    # Each cell runs in its OWN subprocess: a big-batch cell that OOMs
    # poisons that client's HBM beyond in-process recovery (observed
    # twice on 256:3 — even a 256 KB ones() stayed RESOURCE_EXHAUSTED
    # through 10 min of drain retries); the client disconnect on process
    # exit is the only reliable release.
    import subprocess
    results = []
    for cell in args.cells.split(','):
        batch_s, inflight_s = cell.split(':')
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             '--one-cell', cell, '--frames-mult', str(args.frames_mult)],
            capture_output=True, text=True)
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith('{'):
                # A cell's watchdog can os._exit mid-print, leaving a
                # truncated JSON line; treat it as a failed cell, don't
                # lose the completed cells.
                try:
                    row = json.loads(line)
                except ValueError:
                    pass
        if row is None:  # OOM rows are data, not failures
            tail = (proc.stderr or proc.stdout).strip().splitlines()
            row = {'batch': int(batch_s), 'inflight': int(inflight_s),
                   'error': 'cell_failed_rc%d' % proc.returncode,
                   'detail': (tail[-1][:200] if tail else '')}
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({'sweep': results}))


if __name__ == '__main__':
    main()
