#!/usr/bin/env python
"""Output-write floor: how fast CAN a (B, 4, 1088, 1920) f16 batch be
produced on this chip?

The headline ablation's smallest program ("background solid only":
write + f16 convert) measured 2.5 ms/b32 — ~4x the 0.65 ms it takes to
move 530 MB at v5e's ~819 GB/s HBM peak. This probe separates how much
of that is physics (HBM write+read of the probe's forced
materialization) from program overhead, with the device_loop_probe
R-difference recipe (distinct scalars per copy, one dispatch, one
scalar fetch):

1. full-f16: jnp.full + optimization_barrier + whole-sum. Traffic =
   write 530 MB + read 530 MB -> >= 1.3 ms/copy at peak.
2. full-f32: same at f32 (2.1 GB traffic) — scales linearly if
   HBM-bound.
3. masked solid: the fold chain's per-pixel math (iota row/col masks,
   one layer) + barrier + sum — measures the VPU cost the real
   background program adds over a raw write.
4. no-barrier sum: jnp.full summed WITHOUT materialization — XLA folds
   it; confirms the barrier is doing its job (should be ~0).

Usage: python scripts/write_floor_probe.py [--batch 32] [--r1 2 --r2 8]
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
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--r1', type=int, default=2)
    ap.add_argument('--r2', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    B, H, W = args.batch, 1088, 1920
    shape = (B, 4, H, W)
    bytes_out = B * 4 * H * W * 2 / 1e9

    a = jnp.ones((256, 256), jnp.float32)
    mm = jax.jit(lambda x: jnp.sum(x @ x))
    float(mm(a))
    t0 = time.perf_counter()
    float(mm(a))
    print('health rtt %.1f ms; %.2f GB f16 out/copy' %
          ((time.perf_counter() - t0) * 1e3, bytes_out))

    def timed(build, label):
        """R-difference timing of R copies of build(scalar_i)."""
        def run(R):
            cs = jnp.arange(1, R + 1, dtype=jnp.float32) / (R + 1)

            @jax.jit
            def fn(cs):
                acc = jnp.float32(0)
                for i in range(R):
                    acc = acc + build(cs[i])
                return acc

            v = float(fn(cs))
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                v = float(fn(cs))
                best = min(best, time.perf_counter() - t0)
            return best, v

        t1, _ = run(args.r1)
        t2, v = run(args.r2)
        per = (t2 - t1) / (args.r2 - args.r1)
        print('%-28s %8.3f ms/copy  (probe %.3e)' % (label, per * 1e3, v))
        return per

    def full_f16(c):
        t = jnp.full(shape, c, jnp.float16)
        t = lax.optimization_barrier(t)
        return jnp.sum(t.astype(jnp.float32))

    def full_f32(c):
        t = jnp.full(shape, c, jnp.float32)
        t = lax.optimization_barrier(t)
        return jnp.sum(t)

    def masked_solid(c):
        rows = lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
        cols = lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
        m = ((rows >= 8) & (rows <= H - 9) & (cols >= 16)
             & (cols <= W - 17))
        px = jnp.where(m, c, 0.0).astype(jnp.float16)
        t = jnp.broadcast_to(px[None], shape)
        t = lax.optimization_barrier(t)
        return jnp.sum(t.astype(jnp.float32))

    def folded_sum(c):
        return jnp.sum(jnp.full(shape, c, jnp.float16).astype(jnp.float32))

    t16 = timed(full_f16, 'full f16 (wr+rd)')
    timed(full_f32, 'full f32 (wr+rd)')
    timed(masked_solid, 'masked solid f16 (wr+rd)')
    timed(folded_sum, 'no-barrier sum (folded)')
    print('implied HBM BW (f16 arm, wr+rd): %.0f GB/s'
          % (2 * bytes_out / t16))


if __name__ == '__main__':
    main()
