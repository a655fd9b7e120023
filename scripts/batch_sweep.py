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


def main():
    import threading

    # A fully-down tunnel hangs the first device op with no in-process
    # recovery; bound the sweep so it can't hang a driving session
    # (CANVAS_BENCH_WATCHDOG seconds, 0 disables).
    from bench import _start_watchdog
    done = threading.Event()
    _start_watchdog(done)
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames-mult', type=int, default=3,
                    help='timed frames = mult * batch')
    ap.add_argument('--cells', default='64:0,128:0,128:3,192:3,256:3,256:2',
                    help='comma list of batch:inflight (0 = unbounded)')
    args = ap.parse_args()

    from benchmarks import health_gate, timeit_batches
    from bench import build_timeline
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i

    win = box2i(0, 0, 1919, 1079)
    results = []
    for cell in args.cells.split(','):
        batch_s, inflight_s = cell.split(':')
        batch, inflight = int(batch_s), int(inflight_s) or None
        health_gate()
        planner = render.RenderPlanner(build_timeline(4096), win)
        t0 = time.perf_counter()
        try:
            fps = timeit_batches(planner, batch, args.frames_mult * batch,
                                 max_inflight=inflight)
        except Exception as e:  # OOM rows are data, not failures
            results.append({'batch': batch, 'inflight': inflight or 0,
                            'error': type(e).__name__,
                            'detail': str(e)[:200]})
            print(json.dumps(results[-1]), flush=True)
            continue
        finally:
            # Release this cell's device buffers (staged stacks, program
            # cache) BEFORE the next cell's health gate: an OOM'd cell
            # otherwise leaves HBM full and even the gate's 256x256 ones
            # fails (observed after the 256:3 row).
            planner.close()
            del planner
            import gc
            gc.collect()
        results.append({'batch': batch, 'inflight': inflight or 0,
                        'fps': round(fps, 1),
                        'wall_s': round(time.perf_counter() - t0, 1)})
        print(json.dumps(results[-1]), flush=True)
    done.set()
    print(json.dumps({'sweep': results}))


if __name__ == '__main__':
    main()
