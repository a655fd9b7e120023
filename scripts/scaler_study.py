#!/usr/bin/env python
"""On-chip study: scaler formulations + batch-size dispatch amortization.

Round-3 VERDICT item 1: the headline's dense (T,S)x(S,W) resample
einsums do ~S/K times the FLOPs of the K-tap FIR they encode
(/root/reference/src/cprocess/video_scale.c:63-122 touches K source
rows per output row). This script measures, on the real chip:

  1. candidate scaler formulations at the bench's shapes
     (dense one-hot einsum / banded einsum / K-tap gather+FMA);
  2. the full headline graph at batch 32/64/128 (dispatch amortization).

Timing uses the rig's honest recipe (CLAUDE.md): dispatch R times,
probe ONLY the last output with a jitted reduction, fetch one scalar.

Usage: python scripts/scaler_study.py [--reps N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

import numpy as np


def health_check(jax, jnp):
    """Small matmul + scalar fetch: returns (rtt_s, ok)."""
    a = jnp.ones((256, 256), jnp.float32)

    @jax.jit
    def mm(x):
        return jnp.sum(x @ x)

    float(mm(a))          # compile
    t0 = time.perf_counter()
    float(mm(a))
    rtt = time.perf_counter() - t0
    return rtt, rtt < 0.5


def timed(fn, args, probe, reps, jax):
    """Dispatch `reps` times, probe last, fetch one scalar. Returns
    seconds per rep."""
    out = fn(*args)
    float(probe(out))     # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(probe(out))
    return (time.perf_counter() - t0) / reps


def build_taps(B, T, S, K, f, rng):
    """Per-frame gather-form taps like scale_taps_dyn builds: idx
    (B, T, K) i32 monotonic, w (B, T, K) f32."""
    tp = rng.uniform(0, 4, size=(B,))
    t = np.arange(T, dtype=np.float64)[None, :]
    g = (t - tp[:, None]) / f
    width = max(1.0, 1.0 / f)
    left = np.floor(g - width).astype(np.int64) + 1
    pos = left[:, :, None] + np.arange(K)[None, None, :]
    dist = np.abs(pos - g[:, :, None]) / width
    w = np.maximum(0.0, 1.0 - dist).astype(np.float32)
    if f < 1.0:
        s = w.sum(axis=2, keepdims=True)
        w = np.where(s != 0, w / np.where(s != 0, s, 1), 0).astype(np.float32)
    idx = np.clip(pos, 0, S - 1).astype(np.int32)
    return idx, w


def study_formulations(jax, jnp, reps):
    """Vertical+horizontal resample of a (B, 4, Sy, Sx) batch to
    (B, 4, Ty, Tx), factor 1.4 both axes (the bench's animated zoom
    midpoint)."""
    B, C = 32, 4
    Sy, Sx = 320, 512            # quantized fetch window
    f = 1.4
    Ty, Tx = 448, 704            # ~S*f quantized
    K = 3
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(B, C, Sy, Sx).astype(np.float32))
    iy, wy = build_taps(B, Ty, Sy, K, f, rng)
    ix, wx = build_taps(B, Tx, Sx, K, f, rng)
    iy, wy, ix, wx = map(jnp.asarray, (iy, wy, ix, wx))

    @jax.jit
    def probe(x):
        return jnp.sum(x[:, :, ::101, ::97].astype(jnp.float32))

    results = {}

    # --- A: dense one-hot densify + einsum (current scale_taps_dyn) ---
    @jax.jit
    def dense(src, iy, wy, ix, wx):
        def densify(idx, w, S):
            s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)
            terms = jnp.where(idx[:, :, :, None] == s, w[:, :, :, None], 0.0)
            return jnp.sum(terms, axis=2)
        Wy = densify(iy, wy, Sy)
        Wx = densify(ix, wx, Sx)
        mid = jnp.einsum('bts,bcsw->bctw', Wy, src, precision='highest',
                         preferred_element_type=jnp.float32)
        return jnp.einsum('bxw,bctw->bctx', Wx, mid, precision='highest',
                          preferred_element_type=jnp.float32)

    results['dense_highest'] = timed(dense, (src, iy, wy, ix, wx),
                                     probe, reps, jax)

    # --- B: K-tap gather + FMA (VPU; rows via take_along_axis,
    #        columns via transpose + row gather) ---
    @jax.jit
    def ktap(src, iy, wy, ix, wx):
        # vertical: out[b,c,t,w] = sum_k wy[b,t,k] * src[b,c,iy[b,t,k],w]
        acc = None
        for k in range(K):
            g = jnp.take_along_axis(src, iy[:, None, :, k, None], axis=2)
            term = g * wy[:, None, :, k, None]
            acc = term if acc is None else acc + term
        mid = acc                                  # (B, C, Ty, Sx)
        midT = jnp.swapaxes(mid, 2, 3)             # (B, C, Sx, Ty)
        acc = None
        for k in range(K):
            g = jnp.take_along_axis(midT, ix[:, None, :, k, None], axis=2)
            term = g * wx[:, None, :, k, None]
            acc = term if acc is None else acc + term
        return jnp.swapaxes(acc, 2, 3)             # (B, C, Ty, Tx)

    results['ktap_gather'] = timed(ktap, (src, iy, wy, ix, wx),
                                   probe, reps, jax)

    # --- B2: K-tap with column gather directly on the lane axis ---
    @jax.jit
    def ktap_lane(src, iy, wy, ix, wx):
        acc = None
        for k in range(K):
            g = jnp.take_along_axis(src, iy[:, None, :, k, None], axis=2)
            term = g * wy[:, None, :, k, None]
            acc = term if acc is None else acc + term
        mid = acc
        acc = None
        for k in range(K):
            g = jnp.take_along_axis(mid, ix[:, None, None, :, k], axis=3)
            term = g * wx[:, None, None, :, k]
            acc = term if acc is None else acc + term
        return acc

    results['ktap_lane_gather'] = timed(ktap_lane, (src, iy, wy, ix, wx),
                                        probe, reps, jax)

    # --- C: banded einsum (block rows, gather band, small matmul) ---
    for Tb in (128, 256):
        nb_y = -(-Ty // Tb)
        nb_x = -(-Tx // Tb)
        Sb_y = int(np.ceil(Tb / f + K + 2))
        Sb_y = -(-Sb_y // 32) * 32
        Sb_x = Sb_y

        def band_params(idx, w, T, S, nb, Sb):
            # s0 per (frame, block); weights re-based into the band
            Tpad = nb * Tb
            pad = Tpad - T
            idxp = np.pad(np.asarray(idx), ((0, 0), (0, pad), (0, 0)),
                          mode='edge')
            wp = np.pad(np.asarray(w), ((0, 0), (0, pad), (0, 0)))
            s0 = idxp[:, ::Tb, 0]                      # (B, nb)
            s0 = np.minimum(s0, max(0, S - Sb))
            Wb = np.zeros((B, nb, Tb, Sb), np.float32)
            for b in range(B):
                for j in range(nb):
                    for tt in range(Tb):
                        for k in range(K):
                            p = idxp[b, j * Tb + tt, k] - s0[b, j]
                            if 0 <= p < Sb:
                                Wb[b, j, tt, p] += wp[b, j * Tb + tt, k]
            gidx = s0[:, :, None] + np.arange(Sb)[None, None, :]
            gidx = np.clip(gidx, 0, S - 1).astype(np.int32)
            return jnp.asarray(Wb), jnp.asarray(gidx.reshape(B, nb * Sb))

        Wby, gy = band_params(iy, wy, Ty, Sy, nb_y, Sb_y)
        Wbx, gx = band_params(ix, wx, Tx, Sx, nb_x, Sb_x)

        def banded(src, Wby, gy, Wbx, gx,
                   nb_y=nb_y, Sb_y=Sb_y, nb_x=nb_x, Sb_x=Sb_x):
            g = jnp.take_along_axis(src, gy[:, None, :, None], axis=2)
            g = g.reshape(B, C, nb_y, Sb_y, Sx)
            mid = jnp.einsum('bjts,bcjsw->bcjtw', Wby, g,
                             precision='highest',
                             preferred_element_type=jnp.float32)
            mid = mid.reshape(B, C, nb_y * Tb, Sx)[:, :, :Ty]
            midT = jnp.swapaxes(mid, 2, 3)
            g = jnp.take_along_axis(midT, gx[:, None, :, None], axis=2)
            g = g.reshape(B, C, nb_x, Sb_x, Ty)
            out = jnp.einsum('bjts,bcjsw->bcjtw', Wbx, g,
                             precision='highest',
                             preferred_element_type=jnp.float32)
            out = out.reshape(B, C, nb_x * Tb, Ty)[:, :, :Tx]
            return jnp.swapaxes(out, 2, 3)

        fn = jax.jit(banded)
        results['banded_Tb%d' % Tb] = timed(
            fn, (src, Wby, gy, Wbx, gx), probe, reps, jax)

    # numerical agreement vs dense
    ref = np.asarray(dense(src, iy, wy, ix, wx))
    for name, f_ in (('ktap', ktap),):
        got = np.asarray(f_(src, iy, wy, ix, wx))
        results[name + '_maxerr'] = float(np.abs(got - ref).max())
    return results


def study_batches(jax, jnp):
    """Headline graph fps at batch 32/64/128 (dispatch amortization)."""
    import bench
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i

    ws = bench.build_timeline()
    window = box2i(0, 0, 1919, 1079)

    @jax.jit
    def probe(x):
        return jnp.sum(x[:, :, ::101, ::97].astype(jnp.float32))

    out = {}
    for batch in (32, 64, 128):
        planner = render.RenderPlanner(ws, window)
        # pipeline_chunk caps segment length; raise it so big batches
        # really compile at their size
        planner.pipeline_chunk = max(64, batch)
        planner.max_plan_frames = max(256, batch)
        frames = batch * max(4, 256 // batch)
        for (_s, _n, o) in planner.iter_batches(0, batch, batch=batch):
            float(probe(o))
        best = 0.0
        for _rep in range(2):
            t0 = time.perf_counter()
            last = None
            for (_s, _n, o) in planner.iter_batches(
                    batch, batch + frames, batch=batch):
                last = o
            float(probe(last))
            best = max(best, frames / (time.perf_counter() - t0))
        out['batch%d_fps' % batch] = round(best, 1)

        # device-only ceiling: dispatch ONE planned batch program R
        # times with frozen params (no host planning/slicing at all)
        np_mod = np
        frames_arr = np_mod.arange(0, batch, dtype=np_mod.int64)
        planner._stage_cache = {}
        planner._frame_hints = {}
        planner._plan_mesh = None
        ctx = render.PlanContext(planner, frames_arr, planner.window)
        node = ctx.plan(ws)
        sig = node.signature()
        fn = render._get_program(sig)
        params = node.flat_params([])
        o = fn(params)
        float(probe(o))
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(params)
        float(probe(o))
        dt = (time.perf_counter() - t0) / reps
        out['batch%d_deviceonly_fps' % batch] = round(batch / dt, 1)
        out['batch%d_deviceonly_ms' % batch] = round(dt * 1e3, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=30)
    ap.add_argument('--skip-batches', action='store_true')
    ap.add_argument('--skip-forms', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rtt, ok = health_check(jax, jnp)
    print('health: rtt=%.1f ms ok=%s' % (rtt * 1e3, ok))
    if not ok:
        print('tunnel degraded; aborting')
        return 1

    if not args.skip_forms:
        forms = study_formulations(jax, jnp, args.reps)
        for k, v in forms.items():
            if k.endswith('_maxerr'):
                print('%-20s %.3e' % (k, v))
            else:
                print('%-20s %7.2f ms/batch32  (%.3f ms/frame)'
                      % (k, v * 1e3, v * 1e3 / 32))

    if not args.skip_batches:
        batches = study_batches(jax, jnp)
        for k, v in batches.items():
            print('%-20s %s' % (k, v))
    return 0


if __name__ == '__main__':
    sys.exit(main())
