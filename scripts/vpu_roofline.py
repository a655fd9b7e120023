#!/usr/bin/env python
"""VPU roofline for the solid-fold kernel: is ~1 ms/layer/b32 at
speed-of-light, or is there headroom?

Measures, all with the device_loop_probe R-difference recipe (R real
copies with distinct params inside ONE dispatch; (t(R2)-t(R1))/(R2-R1)
cancels dispatch/fetch transport):

1. FMA slope — a Pallas kernel running k chained FMAs per pixel on a
   (B, 4, 1088, 1920) f32 tile, k in {k1, k2}: the per-FMA-per-pixel
   cost = measured VPU elementwise throughput ceiling.
2. The same chain as pure jitted XLA (fusion emitter ceiling).
3. select-vs-multiply — the fold's per-layer tile math written with
   jnp.where (shipped) vs multiplicative f32 indicators (bit-exact
   alternative), isolated from compositing structure.
4. The shipped solid_fold (Pallas, 6 synthetic layers) for reference.

Interpretation: fold per-layer cost ~= 14 full-tile ops; if measured
fold time ~= 14 x FMA-slope the kernel is op-bound at the VPU ceiling
and further fold micro-opts are dead; if far above, there is headroom.

Usage: python scripts/vpu_roofline.py [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

import numpy as np


def timed_pair(fn_builder, payloads, r1, r2, label):
    """R-difference timing: build fn over R payload copies, report
    per-copy ms."""
    import jax
    times = {}
    for R in (r1, r2):
        fn = jax.jit(lambda ps: fn_builder(ps))
        v = float(fn(payloads[:R]))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(fn(payloads[:R]))
            best = min(best, time.perf_counter() - t0)
        times[R] = best
    per = (times[r2] - times[r1]) / (r2 - r1)
    print('%-34s %8.3f ms/copy   (probe %.3e)' % (label, per * 1e3, v))
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--r1', type=int, default=2)
    ap.add_argument('--r2', type=int, default=8)
    ap.add_argument('--k1', type=int, default=8)
    ap.add_argument('--k2', type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W = args.batch, 1088, 1920
    a = jnp.ones((256, 256), jnp.float32)
    mm = jax.jit(lambda x: jnp.sum(x @ x))
    float(mm(a))
    t0 = time.perf_counter()
    float(mm(a))
    print('health rtt %.1f ms' % ((time.perf_counter() - t0) * 1e3))

    rng = np.random.default_rng(0)
    # R distinct scalar param sets (FMA constants / layer colors); ONE
    # shared image input (read traffic identical across variants).
    R = args.r2
    img = jax.device_put(
        rng.standard_normal((B, 4, H, W), np.float32) * 0.1)
    consts = jax.device_put(rng.standard_normal((R, 64), np.float32))

    bytes_rw = B * 4 * H * W * 4 * 2 / 1e9
    print('tile (B,4,%d,%d): %.2f GB read+write per copy -> %.2f ms at '
          '819 GB/s HBM' % (H, W, bytes_rw, bytes_rw / 819 * 1e3))

    TH, TW = 256, 512

    def fma_kernel_factory(k):
        def kernel(c_ref, x_ref, o_ref):
            x = x_ref[0, 0]
            acc = x
            for i in range(k):
                acc = acc * c_ref[i] + x
            o_ref[0, 0] = acc
        return kernel

    def pallas_fma(k):
        def run(cs):
            acc = jnp.float32(0.0)
            for r in range(cs.shape[0]):
                out = pl.pallas_call(
                    fma_kernel_factory(k),
                    grid=(B, 4, H // TH, W // TW),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec((1, 1, TH, TW),
                                           lambda b, c, h, w: (b, c, h, w))],
                    out_specs=pl.BlockSpec((1, 1, TH, TW),
                                           lambda b, c, h, w: (b, c, h, w)),
                    out_shape=jax.ShapeDtypeStruct((B, 4, H, W),
                                                   jnp.float32),
                )(cs[r], img)
                acc = acc + jnp.sum(out)
            return acc
        return run

    def xla_fma(k):
        def run(cs):
            acc = jnp.float32(0.0)
            for r in range(cs.shape[0]):
                x = img
                out = x
                for i in range(k):
                    out = out * cs[r, i] + x
                acc = acc + jnp.sum(out)
            return acc
        return run

    t_p1 = timed_pair(pallas_fma(args.k1), consts, args.r1, args.r2,
                      'pallas %d-FMA chain' % args.k1)
    t_p2 = timed_pair(pallas_fma(args.k2), consts, args.r1, args.r2,
                      'pallas %d-FMA chain' % args.k2)
    fma_slope = (t_p2 - t_p1) / (args.k2 - args.k1)
    px = B * 4 * H * W
    print('  -> pallas FMA slope %.4f ms/FMA/frame-tile = %.2f T FMA/s'
          % (fma_slope * 1e3, px / fma_slope / 1e12))

    t_x1 = timed_pair(xla_fma(args.k1), consts, args.r1, args.r2,
                      'XLA %d-FMA chain' % args.k1)
    t_x2 = timed_pair(xla_fma(args.k2), consts, args.r1, args.r2,
                      'XLA %d-FMA chain' % args.k2)
    xslope = (t_x2 - t_x1) / (args.k2 - args.k1)
    print('  -> XLA FMA slope %.4f ms/FMA/frame-tile = %.2f T FMA/s'
          % (xslope * 1e3, px / xslope / 1e12))

    # --- select vs multiply per-layer fold math, 6 layers, Pallas ----
    L = 6

    def fold_kernel(mult):
        def kernel(col_ref, box_ref, x_ref, o_ref):
            hi = pl.program_id(1)
            wi = pl.program_id(2)
            rows = (jax.lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
                    + hi * TH)
            cols = (jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
                    + wi * TW)
            accP = [x_ref[0, c] for c in range(3)]
            accA = x_ref[0, 3]
            for l in range(L):
                a_s = col_ref[l, 3]
                if mult:
                    rm = jnp.where(
                        (rows >= box_ref[l, 0]) & (rows <= box_ref[l, 1]),
                        1.0, 0.0)
                    cm = jnp.where(
                        (cols >= box_ref[l, 2]) & (cols <= box_ref[l, 3]),
                        1.0, 0.0)
                    wt = rm * cm
                    av = a_s * wt
                    keep = 1.0 - av
                    for c in range(3):
                        accP[c] = (col_ref[l, c] * a_s) * wt + accP[c] * keep
                    accA = av + accA * keep
                else:
                    rm = ((rows >= box_ref[l, 0]) &
                          (rows <= box_ref[l, 1]))
                    cm = ((cols >= box_ref[l, 2]) &
                          (cols <= box_ref[l, 3]))
                    m = rm & cm
                    av = jnp.where(m, a_s, 0.0)
                    keep = 1.0 - av
                    for c in range(3):
                        accP[c] = (jnp.where(m, col_ref[l, c] * a_s, 0.0)
                                   + accP[c] * keep)
                    accA = av + accA * keep
            for c in range(3):
                o_ref[0, c] = accP[c]
            o_ref[0, 3] = accA
        return kernel

    boxes = jnp.asarray(
        rng.integers(0, 500, size=(L, 4)).astype(np.int32))
    boxes = boxes.at[:, 1].add(500).at[:, 3].add(1200)

    def fold_run(mult):
        def run(cs):
            acc = jnp.float32(0.0)
            for r in range(cs.shape[0]):
                col = cs[r, :L * 4].reshape(L, 4) * 0.1 + 0.4
                out = pl.pallas_call(
                    fold_kernel(mult),
                    grid=(B, H // TH, W // TW),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec((1, 4, TH, TW),
                                           lambda b, h, w: (b, 0, h, w))],
                    out_specs=pl.BlockSpec((1, 4, TH, TW),
                                           lambda b, h, w: (b, 0, h, w)),
                    out_shape=jax.ShapeDtypeStruct((B, 4, H, W),
                                                   jnp.float32),
                )(col, boxes, img)
                acc = acc + jnp.sum(out)
            return acc
        return run

    t_sel = timed_pair(fold_run(False), consts, args.r1, args.r2,
                       'fold %dL select (shipped style)' % L)
    t_mul = timed_pair(fold_run(True), consts, args.r1, args.r2,
                       'fold %dL multiplicative' % L)
    ops_per_layer = 14
    print('  -> per-layer: select %.3f / mult %.3f ms; FMA-roofline for '
          '~%d ops: %.3f ms'
          % ((t_sel - bytes_rw / 819) / L * 1e3,
             (t_mul - bytes_rw / 819) / L * 1e3,
             ops_per_layer,
             ops_per_layer * fma_slope * 3 / 4 * 1e3))
    return 0


if __name__ == '__main__':
    sys.exit(main())
