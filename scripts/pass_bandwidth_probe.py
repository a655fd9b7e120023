#!/usr/bin/env python
"""Per-pass HBM-bandwidth accounting of the headline program
(round-4 VERDICT item 2b).

The headline 10-layer 1080p program compiles into a handful of
full-frame/region passes separated by Pallas-call fusion boundaries:

  P1  mid-stack solid fold (Pallas, bg+5 gain solids)  -> write P+A f32
  P2  region_over_sep x2 (rank-1 scaled solids)        -> region P+A r/w
  P3  materialized crossfade layer + region_over       -> layer w+r, region P+A r/w
  P4  finalize fold (XLA chain: last solid + un-premul + f16 convert)
                                                       -> read P+A f32, write f16

This probe times each pass IN ISOLATION at the exact headline shapes
with the R-difference recipe (R real param sets inside ONE dispatch;
(t(R2)-t(R1))/(R2-R1) cancels dispatch+fetch transport), divides the
pass's unavoidable HBM bytes by its time, and prints achieved GB/s vs
the chip's ~819 GB/s peak — the "is each pass >=60% of peak, and if
not, what is the deficit" table docs/performance.md cites. It also
times the FULL program (device_loop_probe recipe inline) so the sum of
passes can be compared against the real thing, at quality 10 (f32
accumulators) and quality 9 (bf16 accumulator fast path).

Usage: python scripts/pass_bandwidth_probe.py [--batch 32] [--acc16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

import numpy as np

PEAK_GBPS = 819.0


def timed_pair(builder, payloads, r1, r2, label, bytes_per_copy):
    """R-difference timing with per-pass failure isolation: the remote
    compile endpoint on this rig drops connections under load, so one
    pass's failed/hung compile must not lose the rows already
    measured (every print flushes immediately)."""
    import jax
    try:
        times = {}
        for R in (r1, r2):
            fn = jax.jit(lambda ps: builder(ps))
            v = float(fn(payloads[:R]))
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                v = float(fn(payloads[:R]))
                best = min(best, time.perf_counter() - t0)
            times[R] = best
    except Exception as e:
        print('%-40s SKIPPED (%s)' % (label, type(e).__name__),
              flush=True)
        return None
    per = (times[r2] - times[r1]) / (r2 - r1)
    gbps = bytes_per_copy / 1e9 / per if per > 0 else float('inf')
    print('%-40s %7.3f ms  %7.2f GB  %6.0f GB/s  %4.0f%% of peak'
          % (label, per * 1e3, bytes_per_copy / 1e9, gbps,
             100.0 * gbps / PEAK_GBPS), flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--r1', type=int, default=1)
    ap.add_argument('--r2', type=int, default=4)
    ap.add_argument('--acc16', action='store_true',
                    help='bf16 accumulators (the quality<=9 fast path)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from canvas_tpu.ops import pallas_ops as po

    B, H, W = args.batch, 1088, 1920
    acc_dt = jnp.bfloat16 if args.acc16 else jnp.float32
    acc_bytes = 2 if args.acc16 else 4

    a = jnp.ones((256, 256), jnp.float32)
    mm = jax.jit(lambda x: jnp.sum(x @ x))
    float(mm(a))
    t0 = time.perf_counter()
    float(mm(a))
    print('health rtt %.1f ms' % ((time.perf_counter() - t0) * 1e3))
    print('acc dtype: %s' % ('bfloat16' if args.acc16 else 'float32'))
    print('%-40s %10s %9s %11s' % ('pass', 'ms/copy', 'bytes', 'achieved'))

    rng = np.random.default_rng(0)
    R = args.r2
    consts = jax.device_put(rng.standard_normal((R, 64), np.float32))

    frame_px = B * H * W

    # ---- P1: mid-stack solid fold, 6 layers, no base -> write P+A ----
    L = 6
    boxes = np.zeros((L, B, 4), np.int32)
    for l in range(L):
        boxes[l, :, :] = (40 * l, 600 + 40 * l, 60 * l, 900 + 60 * l)
    boxes_j = jax.device_put(boxes)

    def p1(cs):
        acc = jnp.float32(0.0)
        for r in range(cs.shape[0]):
            color = (cs[r, :L * 4].reshape(L, 1, 4) * 0.1 + 0.5
                     ) * jnp.ones((L, B, 4), jnp.float32)
            gain = jnp.ones((L, B), jnp.float32) * (0.9 + 0.01 * cs[r, 0])
            off = jnp.zeros((L, B), jnp.float32)
            P, A = po.solid_fold(jnp, jax, None, None, color, boxes_j,
                                 gain, off, H, W, acc_dtype=acc_dt)
            acc = (acc + jnp.sum(P.astype(jnp.float32))
                   + jnp.sum(A.astype(jnp.float32)))
        return acc

    p1_bytes = frame_px * 4 * acc_bytes          # write P(3)+A(1)
    t1 = timed_pair(p1, consts, args.r1, args.r2,
                    'P1 solid_fold 6L (write P+A)', p1_bytes)

    # ---- P2: region_over_sep at headline region (512 x 896) ----------
    h_r, w_r = 512, 896
    P0 = jax.device_put(
        rng.random((B, 3, H, W), np.float32).astype(
            np.float32)).astype(acc_dt)
    A0 = jax.device_put(
        rng.random((B, 1, H, W), np.float32).astype(
            np.float32)).astype(acc_dt)

    def p2(cs):
        acc = jnp.float32(0.0)
        for r in range(cs.shape[0]):
            color = cs[r, :4][None, :] * 0.1 + jnp.full((B, 4), 0.5)
            ry = jnp.broadcast_to(cs[r, 4:4 + 1], (B, h_r)) * 0.0 + 0.8
            rx = jnp.broadcast_to(cs[r, 5:6], (B, w_r)) * 0.0 + 0.8
            P, A = po.region_over_sep(jnp, jax, P0, A0, color, ry, rx,
                                      jnp.int32(256), jnp.int32(512))
            acc = (acc + jnp.sum(P.astype(jnp.float32))
                   + jnp.sum(A.astype(jnp.float32)))
        return acc

    region_px = B * h_r * w_r
    # NOTE the probe's full-output sum forces a read of the whole
    # accumulator (4 full planes) per copy ON TOP of the pass's own
    # region traffic — subtract nothing, report both so the reader can:
    # the pass's own bytes are the region r/w.
    p2_bytes = region_px * 4 * acc_bytes * 2
    t2 = timed_pair(p2, consts, args.r1, args.r2,
                    'P2 region_over_sep 512x896 (r/w P+A)', p2_bytes)

    # ---- P3: materialized layer + region_over at 640 x 1152 ---------
    h_m, w_m = 640, 1152

    def p3(cs):
        acc = jnp.float32(0.0)
        for r in range(cs.shape[0]):
            # crossfade of two solids at region size fuses into the
            # layer materialization (one write), then region_over
            layer_rgb = (jnp.full((B, 3, h_m, w_m), 0.4)
                         * (1.0 + 0.01 * cs[r, 0]))
            layer_a = jnp.full((B, 1, h_m, w_m), 0.6)
            layer = jnp.concatenate([layer_rgb, layer_a], 1).astype(acc_dt)
            P, A = po.region_over(jnp, jax, P0, A0, layer,
                                  jnp.int32(192), jnp.int32(384))
            acc = (acc + jnp.sum(P.astype(jnp.float32))
                   + jnp.sum(A.astype(jnp.float32)))
        return acc

    mix_px = B * h_m * w_m
    p3_bytes = (mix_px * 4 * acc_bytes          # layer write
                + mix_px * 4 * acc_bytes       # layer read by kernel
                + mix_px * 4 * acc_bytes * 2)  # region P+A r/w
    t3 = timed_pair(p3, consts, args.r1, args.r2,
                    'P3 layer mat + region_over 640x1152', p3_bytes)

    # ---- P4: finalize (read P+A, last solid, un-premul, f16 out) ----
    Lf = 1
    fbox = np.zeros((Lf, B, 4), np.int32)
    fbox[0, :, :] = (980, 1079, 0, 1919)
    fbox_j = jax.device_put(fbox)

    def p4(cs):
        acc = jnp.float32(0.0)
        for r in range(cs.shape[0]):
            color = (cs[r, :4].reshape(1, 1, 4) * 0.1 + 0.5
                     ) * jnp.ones((Lf, B, 4), jnp.float32)
            gain = jnp.ones((Lf, B), jnp.float32)
            off = jnp.zeros((Lf, B), jnp.float32)
            out = po.solid_fold(jnp, jax, P0, A0, color, fbox_j, gain,
                                off, H, W, finalize=True,
                                out_dtype=jnp.float16, prefer_xla=True)
            acc = acc + jnp.sum(out.astype(jnp.float32))
        return acc

    p4_bytes = (frame_px * 4 * acc_bytes       # read P+A
                + frame_px * 4 * 2)            # write f16 rgba
    t4 = timed_pair(p4, consts, args.r1, args.r2,
                    'P4 finalize fold -> f16', p4_bytes)

    parts = [t for t in (t1, t2, t2, t3, t4) if t is not None]
    if all(t is not None for t in (t1, t2, t3, t4)):
        print('sum of passes (P2 x2): %.3f ms/copy'
              % ((t1 + 2 * t2 + t3 + t4) * 1e3), flush=True)
    else:
        print('partial sum (%d/5 rows): %.3f ms/copy'
              % (len(parts), sum(parts) * 1e3), flush=True)
    print('(compare: device_loop_probe full program, same batch — '
          'run separately; residual = planner structure the synthetic '
          'passes do not model)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
