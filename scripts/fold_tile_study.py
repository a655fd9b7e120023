#!/usr/bin/env python
"""Per-tile layer-list solid fold study.

The shipped Pallas solid fold (ops/pallas_ops.py) runs every layer's
masked over on every tile: ~15 VPU ops/pixel/LAYER, making the fold the
largest device-time term in the headline graph (~7 ms/b32). But a
typical timeline layer covers a fraction of the frame — a tile outside
a layer's box multiplies by exactly (1-0) and adds exactly 0, so
SKIPPING non-covering layers per tile is bit-exact in f32.

This variant prefetches a per-(frame, tile) layer list (z-order
preserved) and runs a dynamic-trip fori_loop over just the covering
layers. Distinct from the recorded dead end (a per-tile lax.cond
classifier — Mosaic spilled the vector carries of the BRANCHES); here
the loop body is uniform and only the trip count varies.

Usage:
  CANVAS_FORCE_CPU=1 python scripts/fold_tile_study.py --check   # parity
  python scripts/fold_tile_study.py --time                       # on-chip
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

import numpy as np


def tile_fold(jnp, jax, P, A, color, box, gain, offset, H, W,
              finalize=False, out_dtype=None, interpret=False):
    """solid_fold with per-tile layer lists (same semantics/op order)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if out_dtype is None:
        out_dtype = jnp.float32
    L, B = color.shape[0], color.shape[1]
    TH = max(8, (min(H, 256) // 8) * 8)
    TW = max(128, (min(W, 512) // 128) * 128)
    nH = pl.cdiv(H, TH)
    nW = pl.cdiv(W, TW)

    # Per-(frame, tile) covering-layer lists, z-order preserved: key =
    # l for covering layers, L + l otherwise — strictly increasing and
    # unique, so a plain argsort yields covered-in-z-order first
    # (stability not required).
    ty0 = jnp.arange(nH, dtype=jnp.int32) * TH
    ty1 = ty0 + (TH - 1)
    tx0 = jnp.arange(nW, dtype=jnp.int32) * TW
    tx1 = tx0 + (TW - 1)
    cov_y = ((box[:, :, 0, None] <= ty1[None, None, :]) &
             (box[:, :, 1, None] >= ty0[None, None, :]))     # (L, B, nH)
    cov_x = ((box[:, :, 2, None] <= tx1[None, None, :]) &
             (box[:, :, 3, None] >= tx0[None, None, :]))     # (L, B, nW)
    cov = cov_y[:, :, :, None] & cov_x[:, :, None, :]        # (L,B,nH,nW)
    lidx = jnp.arange(L, dtype=jnp.int32)[:, None, None, None]
    key = jnp.where(cov, lidx, lidx + L)
    perm = jnp.argsort(key, axis=0).astype(jnp.int32)        # (L,B,nH,nW)
    perm = jnp.moveaxis(perm, 0, -1)                         # (B,nH,nW,L)
    cnt = jnp.sum(cov.astype(jnp.int32), axis=0)             # (B,nH,nW)
    cnt = jnp.moveaxis(cnt, 0, 0)
    with_base = P is not None

    def kernel(perm_ref, cnt_ref, color_ref, box_ref, gain_ref,
               offset_ref, *refs):
        if finalize:
            if with_base:
                baseP_ref, baseA_ref, out_ref = refs
            else:
                (out_ref,) = refs
        elif with_base:
            baseP_ref, baseA_ref, outP_ref, outA_ref = refs
        else:
            outP_ref, outA_ref = refs
        b = pl.program_id(0)
        hi = pl.program_id(1)
        wi = pl.program_id(2)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
                + hi * TH)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
                + wi * TW)
        if with_base:
            acc0 = (baseP_ref[0, 0], baseP_ref[0, 1], baseP_ref[0, 2],
                    baseA_ref[0, 0])
        else:
            zero = jnp.zeros((TH, TW), jnp.float32)
            acc0 = (zero, zero, zero, zero)

        def body(k, acc):
            p0, p1, p2, aA = acc
            l = perm_ref[b, hi, wi, k]
            rm = (rows >= box_ref[l, b, 0]) & (rows <= box_ref[l, b, 1])
            cm = (cols >= box_ref[l, b, 2]) & (cols <= box_ref[l, b, 3])
            m = rm & cm
            a_s = color_ref[l, b, 3]
            g = gain_ref[l, b]
            o = offset_ref[l, b]
            a = jnp.where(m, a_s, 0.0)
            keep = 1.0 - a
            outc = []
            for c, pc in enumerate((p0, p1, p2)):
                pa = (color_ref[l, b, c] * g + o) * a_s
                outc.append(jnp.where(m, pa, 0.0) + pc * keep)
            return (outc[0], outc[1], outc[2], a + aA * keep)

        n = cnt_ref[b, hi, wi]
        p0, p1, p2, aA = jax.lax.fori_loop(0, n, body, acc0)
        if finalize:
            nonzero = aA != 0.0
            safe = jnp.where(nonzero, aA, 1.0)
            for c, pc in enumerate((p0, p1, p2)):
                out_ref[0, c] = jnp.where(nonzero, pc / safe,
                                          0.0).astype(out_ref.dtype)
            out_ref[0, 3] = aA.astype(out_ref.dtype)
        else:
            for c, pc in enumerate((p0, p1, p2)):
                outP_ref[0, c] = pc
            outA_ref[0, 0] = aA

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem, smem, smem, smem]
    args = [color, box, gain, offset]
    if with_base:
        in_specs.append(pl.BlockSpec((1, 3, TH, TW),
                                     lambda b, h, w, p, c: (b, 0, h, w)))
        in_specs.append(pl.BlockSpec((1, 1, TH, TW),
                                     lambda b, h, w, p, c: (b, 0, h, w)))
        args += [P, A]
    if finalize:
        out_specs = pl.BlockSpec((1, 4, TH, TW),
                                 lambda b, h, w, p, c: (b, 0, h, w))
        out_shape = jax.ShapeDtypeStruct((B, 4, H, W), out_dtype)
    else:
        out_specs = [pl.BlockSpec((1, 3, TH, TW),
                                  lambda b, h, w, p, c: (b, 0, h, w)),
                     pl.BlockSpec((1, 1, TH, TW),
                                  lambda b, h, w, p, c: (b, 0, h, w))]
        out_shape = [jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32),
                     jax.ShapeDtypeStruct((B, 1, H, W), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nH, nW),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(perm, cnt, *args)


def make_case(rng, L, B, H, W, coverage='mixed'):
    color = rng.rand(L, B, 4).astype(np.float32)
    gain = rng.uniform(0.2, 1.2, (L, B)).astype(np.float32)
    offset = rng.uniform(-0.1, 0.1, (L, B)).astype(np.float32)
    box = np.zeros((L, B, 4), np.int32)
    for l in range(L):
        for b in range(B):
            if coverage == 'full' or (l == 0 and coverage == 'mixed'):
                box[l, b] = [0, H - 1, 0, W - 1]
            elif coverage == 'empty' and l % 2:
                box[l, b] = [5, 1, 5, 1]        # empty (y1 < y0)
            else:
                y0 = rng.randint(0, H // 2)
                x0 = rng.randint(0, W // 2)
                box[l, b] = [y0, y0 + rng.randint(1, H // 2),
                             x0, x0 + rng.randint(1, W // 2)]
    return color, box, gain, offset


def check(jax, jnp, interpret):
    from canvas_tpu.ops import pallas_ops
    rng = np.random.RandomState(7)
    ok = True
    for (L, B, H, W, cover, base, fin) in [
            (6, 3, 96, 256, 'mixed', False, False),
            (6, 3, 96, 256, 'mixed', True, True),
            (4, 2, 64, 128, 'full', False, True),
            (5, 2, 72, 384, 'empty', True, False),
            (1, 1, 8, 128, 'mixed', False, False)]:
        color, box, gain, offset = make_case(rng, L, B, H, W, cover)
        if base:
            P = jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32))
            A = jnp.asarray(rng.rand(B, 1, H, W).astype(np.float32))
        else:
            P = A = None
        Pc, Ac = pallas_ops._fold_jnp(
            jnp, jax, P, A, jnp.asarray(color), jnp.asarray(box),
            jnp.asarray(gain), jnp.asarray(offset), H, W)
        got = tile_fold(jnp, jax, P, A, jnp.asarray(color),
                        jnp.asarray(box), jnp.asarray(gain),
                        jnp.asarray(offset), H, W, finalize=fin,
                        interpret=interpret)
        if fin:
            nonzero = np.asarray(Ac) != 0.0
            safe = np.where(nonzero, np.asarray(Ac), 1.0)
            ref = np.stack([np.where(nonzero, np.asarray(Pc[c]) / safe, 0.0)
                            for c in range(3)] + [np.asarray(Ac)], axis=1)
            diff = np.abs(np.asarray(got) - ref).max()
        else:
            gP, gA = got
            ref = np.stack([np.asarray(Pc[c]) for c in range(3)], axis=1)
            diff = max(np.abs(np.asarray(gP) - ref).max(),
                       np.abs(np.asarray(gA)[:, 0] - np.asarray(Ac)).max())
        exact = diff == 0.0
        ok = ok and exact
        print('L=%d B=%d %dx%d %-5s base=%d fin=%d  maxdiff=%.3e %s'
              % (L, B, H, W, cover, base, fin, diff,
                 'BIT-EXACT' if exact else 'DIFFERS'))
    return ok


def timeit(jax, jnp, reps=30):
    from canvas_tpu.ops import pallas_ops
    os.environ['CANVAS_FOLD_MODE'] = 'pallas'

    @jax.jit
    def probe(x):
        x = x.reshape(x.shape[0], -1)
        return jnp.sum(x[:, ::997].astype(jnp.float32))

    a = jnp.ones((256, 256), jnp.float32)
    mm = jax.jit(lambda x: jnp.sum(x @ x))
    float(mm(a))
    t0 = time.perf_counter()
    float(mm(a))
    print('health rtt %.1f ms' % ((time.perf_counter() - t0) * 1e3))

    rng = np.random.RandomState(7)
    B, H, W = 32, 1088, 1920
    for L, cover in [(6, 'mixed'), (6, 'full')]:
        color, box, gain, offset = make_case(rng, L, B, H, W, cover)
        color, box, gain, offset = map(jnp.asarray,
                                       (color, box, gain, offset))

        base_fn = jax.jit(lambda c, bx, g, o: pallas_ops.solid_fold(
            jnp, jax, None, None, c, bx, g, o, H, W))
        tile_fn = jax.jit(lambda c, bx, g, o: tile_fold(
            jnp, jax, None, None, c, bx, g, o, H, W))
        for name, fn in [('shipped_pallas', base_fn),
                         ('tile_list', tile_fn)]:
            out = fn(color, box, gain, offset)
            float(probe(out[0]))
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(color, box, gain, offset)
            float(probe(out[0]))
            dt = (time.perf_counter() - t0) / reps
            print('%-6s %-14s %7.2f ms/b32' % (cover, name, dt * 1e3))
        ref = base_fn(color, box, gain, offset)
        got = tile_fn(color, box, gain, offset)
        d = max(float(jnp.abs(ref[0] - got[0]).max()),
                float(jnp.abs(ref[1] - got[1]).max()))
        print('%-6s maxdiff vs shipped: %.3e' % (cover, d))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true')
    ap.add_argument('--time', action='store_true')
    ap.add_argument('--reps', type=int, default=30)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    if args.check:
        interpret = jax.default_backend() != 'tpu'
        return 0 if check(jax, jnp, interpret) else 1
    if args.time:
        timeit(jax, jnp, args.reps)
    return 0


if __name__ == '__main__':
    sys.exit(main())
