#!/usr/bin/env python
"""Tunnel-independent device timing of the headline program.

The axon tunnel's per-dispatch marshaling cost drifts by phase (1 ms
healthy, ~10 ms degraded), so frozen-params dispatch loops (the
stream_overhead_probe recipe) confound device compute with transport.
This probe evaluates R REAL batches (distinct animated params — no CSE)
inside ONE jitted dispatch returning one scalar, and reports
(t(R2) - t(R1)) / (R2 - R1): per-batch device time with the dispatch +
fetch transport cost cancelled by the difference.

(A lax.fori_loop variant with a serial carry was tried first and
measured 57 ms/b32 vs ~14 dispatch-streamed — the loop-carried
dependence blocks XLA's cross-iteration buffer overlap and distorts
the number; unrolled independent copies match streamed dispatch.)

Usage: python scripts/device_loop_probe.py [--r1 2] [--r2 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--r1', type=int, default=2)
    ap.add_argument('--r2', type=int, default=22)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--length', type=int, default=8192)
    ap.add_argument('--sig-filter', default='',
                    help='time the largest signature group whose repr '
                         'contains this substring (e.g. scale_solid)')
    ap.add_argument('--quality', type=int, default=10,
                    help='planner quality hint (<=9 enables the bf16 '
                         'accumulator fast path; 10 = bit-exact)')
    ap.add_argument('--pin-start', type=int, default=None,
                    help='probe batches from this EXACT frame onward '
                         '(all must share one signature) instead of '
                         'the largest signature group — REQUIRED for '
                         'cross-graph ablation comparisons: the '
                         'largest group lands on different animation '
                         'phases for different graphs, which swamps '
                         'the ablation deltas')
    ap.add_argument('--graph', default='full',
                    choices=('bg', 'solids', 'scalers', 'full'),
                    help='ablate the headline timeline to derive the '
                         'per-pass accounting from the REAL program: '
                         'bg (background only), solids (+5 gain solids '
                         '+ overlay strip), scalers (+2 factored '
                         'scaled solids), full (+the crossfade layer). '
                         'Differences between levels isolate the fold, '
                         'region_over_sep x2, and the materialized mix '
                         'region passes.')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_timeline
    from canvas_tpu.basetypes import box2i
    from canvas_tpu import render

    a = jnp.ones((256, 256), jnp.float32)
    mm = jax.jit(lambda x: jnp.sum(x @ x))
    float(mm(a))
    t0 = time.perf_counter()
    float(mm(a))
    print('health rtt %.1f ms' % ((time.perf_counter() - t0) * 1e3))

    ws = build_timeline(args.length)
    drop_z = {'bg': (1, 2, 3, 4, 5, 6, 7, 8, 9),
              'solids': (6, 7, 8),
              'scalers': (8,),
              'full': ()}[args.graph]
    for item in [it for it in ws if it.z in drop_z]:
        ws.remove(item)
    win = box2i(0, 0, 1919, 1079)
    planner = render.RenderPlanner(ws, win, quality=args.quality)
    planner.plan_cache_segments = 0
    B = args.batch

    from canvas_tpu.render import _eval

    # R2 REAL batches (distinct animated params, so XLA cannot CSE two
    # copies into one), all evaluated inside ONE jitted dispatch that
    # returns one scalar. Timing t(R2) - t(R1) cancels the dispatch +
    # fetch transport cost entirely — only device compute scales with R.
    # Collect batches grouped by program signature and time the most
    # common one (moving placed boxes re-quantize the geometry every
    # few batches, so no single signature may cover the whole range).
    by_sig = {}
    pin = args.pin_start
    n_batches = (args.r2 if pin is not None
                 else max(args.r2 * 4, (args.length - B) // B))
    for r in range(n_batches):
        lo = (pin or 0) + r * B
        if lo + B > args.length:
            break
        ctx = render.PlanContext(planner, np.arange(lo, lo + B), win)
        planner._stage_cache = {}
        planner._frame_hints = {}
        node = ctx.plan(ws)
        by_sig.setdefault(node.signature(), []).append(
            [dict(p) for p in node.flat_params([])])
    if pin is not None and len(by_sig) > 1:
        raise RuntimeError(
            'pinned range [%d, %d) spans %d signatures — pick a '
            'pin-start inside one geometry phase'
            % (pin, pin + n_batches * B, len(by_sig)))
    candidates = by_sig
    if args.sig_filter:
        candidates = {s: p for s, p in by_sig.items()
                      if args.sig_filter in repr(s)}
        if not candidates:
            raise RuntimeError('no signature matches %r (ops seen: %s)'
                               % (args.sig_filter,
                                  sorted({s[0] for s in by_sig})))
    sig, plists = max(candidates.items(), key=lambda kv: len(kv[1]))
    print('sig group: %d batches, ops=%s' % (
        len(plists), sorted(set(
            m for m in repr(sig).split("'") if m.isidentifier()))[:12]))
    if len(plists) < args.r2:
        raise RuntimeError(
            'largest signature group has %d < %d batches '
            '(geometry re-quantizes too often; try --length larger)'
            % (len(plists), args.r2))
    plists = jax.device_put(plists[:args.r2])

    def run_many(batches):
        acc = jnp.float32(0.0)
        for params in batches:
            out = _eval(sig, iter(params), jnp, jax)
            # Probe must consume EVERY output element: for a fused
            # elementwise chain XLA computes only the elements the
            # consumer reads, so a sliced probe would skip most of the
            # frame. A contiguous full sum re-reads the output
            # (~0.7 ms/b32 of HBM) — small, and it biases every R
            # equally. (A strided out[::97,::97] probe was the first
            # attempt: stride-97 lane gathers cost ~40 ms/b32 on TPU
            # and dominated the measurement.)
            acc = acc + jnp.sum(out.astype(jnp.float32))
        return acc

    times = {}
    for R in (args.r1, args.r2):
        fn = jax.jit(run_many)
        float(fn(plists[:R]))                 # compile + first run
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(fn(plists[:R]))
            best = min(best, time.perf_counter() - t0)
        times[R] = best
        print('R=%-3d total %8.2f ms   (probe %.3e)'
              % (R, best * 1e3, v))

    per = (times[args.r2] - times[args.r1]) / (args.r2 - args.r1)
    print('device-only: %.2f ms/b%d  (%.0f fps)'
          % (per * 1e3, B, B / per))
    planner.close()
    return 0


if __name__ == '__main__':
    sys.exit(main())
