#!/usr/bin/env python
"""Decompose the dense scale_taps_dyn cost: tap build vs densify vs
einsum contractions, plus contraction-order and fusion variants.

Round-3 follow-up to scripts/scaler_study.py (which established dense
one-hot + einsum 'highest' beats K-tap gathers and banded einsums).
This probe answers: of the ~3.3 ms/b32 per scaler, how much is weight
BUILDING (the (B,T,K,S) one-hot densify) vs the MXU contractions —
and whether contraction order or a 3-operand einsum helps.

Timing: honest recipe (CLAUDE.md) — dispatch R times, probe last
output with a jitted device reduction, fetch one scalar.

Usage: python scripts/scaler_decomp_probe.py [--reps N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

import numpy as np


def timed(fn, args, probe, reps, jax):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(probe(x)), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(probe(leaves[-1]))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # health
    a = jnp.ones((256, 256), jnp.float32)
    mm = jax.jit(lambda x: jnp.sum(x @ x))
    float(mm(a))
    t0 = time.perf_counter()
    float(mm(a))
    rtt = time.perf_counter() - t0
    print('health: rtt=%.1f ms' % (rtt * 1e3))

    B, C = 32, 4
    Sy, Sx = 320, 512
    Ty, Tx = 448, 704
    Ky = Kx = 3
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(B, C, Sy, Sx).astype(np.float32))

    # per-frame scalar params like the real node ships
    fy = jnp.asarray(rng.uniform(1.2, 1.6, B).astype(np.float32))
    fx = jnp.asarray(rng.uniform(1.2, 1.6, B).astype(np.float32))
    tp = jnp.asarray(rng.uniform(0, 4, B).astype(np.float32))
    sp = jnp.zeros((B,), jnp.float32)
    lo = jnp.zeros((B,), jnp.float32)
    hiy = jnp.full((B,), Sy - 1.0, jnp.float32)
    hix = jnp.full((B,), Sx - 1.0, jnp.float32)

    def axis(fv, tpv, spv, lov, hiv, T, K, S):
        t = jax.lax.broadcasted_iota(jnp.float32, (1, T), 1)
        f = fv[:, None]
        width = jnp.where(f > 1.0, 1.0, 1.0 / f)
        g = (t - tpv[:, None]) / f + spv[:, None]
        left = jnp.floor(g - width) + 1.0
        k = jax.lax.broadcasted_iota(jnp.float32, (1, 1, K), 2)
        pos = left[:, :, None] + k
        dist = jnp.abs(pos - g[:, :, None]) / width[:, :, None]
        w = jnp.maximum(0.0, 1.0 - dist)
        sums = jnp.sum(w, axis=2, keepdims=True)
        w = jnp.where((f <= 1.0)[:, :, None] & (sums != 0.0),
                      w / jnp.where(sums != 0.0, sums, 1.0), w)
        in_window = ((pos >= lov[:, None, None]) & (pos <= hiv[:, None, None]))
        w = jnp.where(in_window, w, 0.0)
        idx = jnp.clip(pos, 0, S - 1).astype(jnp.int32)
        return idx, w

    def densify(idx, w, S):
        s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)
        terms = jnp.where(idx[:, :, :, None] == s, w[:, :, :, None], 0.0)
        return jnp.sum(terms, axis=2)

    @jax.jit
    def probe(x):
        x = x.reshape(x.shape[0], -1)
        return jnp.sum(x[:, ::997].astype(jnp.float32))

    results = {}

    # --- full shipped path ---
    @jax.jit
    def full(src, fy, fx, tp, sp, lo, hiy, hix):
        iy, wy = axis(fy, tp, sp, lo, hiy, Ty, Ky, Sy)
        ix, wx = axis(fx, tp, sp, lo, hix, Tx, Kx, Sx)
        Wy = densify(iy, wy, Sy)
        Wx = densify(ix, wx, Sx)
        mid = jnp.einsum('bts,bcsw->bctw', Wy, src, precision='highest',
                         preferred_element_type=jnp.float32)
        return jnp.einsum('bxw,bctw->bctx', Wx, mid, precision='highest',
                          preferred_element_type=jnp.float32)

    results['full_dense_highest'] = timed(
        full, (src, fy, fx, tp, sp, lo, hiy, hix), probe, args.reps, jax)

    # --- weights build only (taps + densify) ---
    @jax.jit
    def weights_only(fy, fx, tp, sp, lo, hiy, hix):
        iy, wy = axis(fy, tp, sp, lo, hiy, Ty, Ky, Sy)
        ix, wx = axis(fx, tp, sp, lo, hix, Tx, Kx, Sx)
        return densify(iy, wy, Sy), densify(ix, wx, Sx)

    results['weights_build_only'] = timed(
        weights_only, (fy, fx, tp, sp, lo, hiy, hix), probe, args.reps, jax)

    Wy, Wx = weights_only(fy, fx, tp, sp, lo, hiy, hix)
    Wy = jax.device_put(np.asarray(Wy))
    Wx = jax.device_put(np.asarray(Wx))

    # --- einsums only, precomputed W ---
    @jax.jit
    def einsums_only(Wy, Wx, src):
        mid = jnp.einsum('bts,bcsw->bctw', Wy, src, precision='highest',
                         preferred_element_type=jnp.float32)
        return jnp.einsum('bxw,bctw->bctx', Wx, mid, precision='highest',
                          preferred_element_type=jnp.float32)

    results['einsums_only_highest'] = timed(
        einsums_only, (Wy, Wx, src), probe, args.reps, jax)

    # --- einsums only, default precision (bf16 MXU) ---
    @jax.jit
    def einsums_default(Wy, Wx, src):
        mid = jnp.einsum('bts,bcsw->bctw', Wy, src,
                         preferred_element_type=jnp.float32)
        return jnp.einsum('bxw,bctw->bctx', Wx, mid,
                          preferred_element_type=jnp.float32)

    results['einsums_only_default'] = timed(
        einsums_default, (Wy, Wx, src), probe, args.reps, jax)

    # --- einsums horizontal-first ---
    @jax.jit
    def einsums_hfirst(Wy, Wx, src):
        mid = jnp.einsum('bxw,bcsw->bcsx', Wx, src, precision='highest',
                         preferred_element_type=jnp.float32)
        return jnp.einsum('bts,bcsx->bctx', Wy, mid, precision='highest',
                          preferred_element_type=jnp.float32)

    results['einsums_hfirst_highest'] = timed(
        einsums_hfirst, (Wy, Wx, src), probe, args.reps, jax)

    # --- 3-operand einsum (XLA chooses) ---
    @jax.jit
    def einsum3(Wy, Wx, src):
        return jnp.einsum('bts,bcsw,bxw->bctx', Wy, src, Wx,
                          precision='highest',
                          preferred_element_type=jnp.float32)

    results['einsum3_highest'] = timed(
        einsum3, (Wy, Wx, src), probe, args.reps, jax)

    # --- merged channel axis: (B, C*S?, ...) no — fold C into batch of
    #     the matmul by reshaping src to (B*C, S, W) and repeating W ---
    @jax.jit
    def einsums_bc(Wy, Wx, src):
        s2 = src.reshape(B * C, Sy, Sx)
        Wy2 = jnp.repeat(Wy, C, axis=0)
        Wx2 = jnp.repeat(Wx, C, axis=0)
        mid = jnp.einsum('bts,bsw->btw', Wy2, s2, precision='highest',
                         preferred_element_type=jnp.float32)
        out = jnp.einsum('bxw,btw->btx', Wx2, mid, precision='highest',
                         preferred_element_type=jnp.float32)
        return out.reshape(B, C, Ty, Tx)

    results['einsums_bc_merged'] = timed(
        einsums_bc, (Wy, Wx, src), probe, args.reps, jax)

    # --- direct (T,S) weight formula (no K axis): interior-exact,
    #     border clip handled by accumulating clipped taps into edge
    #     columns via two small corrections ---
    @jax.jit
    def weights_direct(fy, fx, tp, sp, lo, hiy, hix):
        def direct(fv, tpv, spv, lov, hiv, T, S):
            f = fv[:, None, None]
            width = jnp.where(f > 1.0, 1.0, 1.0 / f)
            t = jax.lax.broadcasted_iota(jnp.float32, (1, T, 1), 1)
            s = jax.lax.broadcasted_iota(jnp.float32, (1, 1, S), 2)
            g = (t - tpv[:, None, None]) / f + spv[:, None, None]
            dist = jnp.abs(s - g) / width
            w = jnp.maximum(0.0, 1.0 - dist)
            in_win = (s >= lov[:, None, None]) & (s <= hiv[:, None, None])
            return jnp.where(in_win, w, 0.0)
        return (direct(fy, tp, sp, lo, hiy, Ty, Sy),
                direct(fx, tp, sp, lo, hix, Tx, Sx))

    results['weights_direct_TS'] = timed(
        weights_direct, (fy, fx, tp, sp, lo, hiy, hix), probe,
        args.reps, jax)

    for k, v in results.items():
        print('%-26s %7.2f ms/b32  (%.3f ms/frame)'
              % (k, v * 1e3, v * 1e3 / 32))

    # sanity: merged-bc equals baseline
    ref = np.asarray(einsums_only(Wy, Wx, src))
    got = np.asarray(einsums_bc(Wy, Wx, src))
    print('bc_merged maxerr %.3e' % np.abs(got - ref).max())
    got3 = np.asarray(einsum3(Wy, Wx, src))
    print('einsum3 maxerr   %.3e' % np.abs(got3 - ref).max())
    return 0


if __name__ == '__main__':
    sys.exit(main())
