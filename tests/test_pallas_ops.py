"""Direct unit tests for the compositing kernel wrappers.

On CPU these exercise the jnp/slice fallbacks (the Pallas TPU paths
run under CANVAS_TEST_TPU=1 through the same wrappers); the render
fuzz suite covers them end-to-end differentially vs the pull path.
"""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from canvas_tpu.ops import pallas_ops  # noqa: E402


def _case(rng, B, H, W, h, w):
    P = jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32))
    A = jnp.asarray(rng.rand(B, 1, H, W).astype(np.float32))
    color = jnp.asarray(rng.rand(B, 4).astype(np.float32))
    ry = jnp.asarray(rng.rand(B, h).astype(np.float32))
    rx = jnp.asarray(rng.rand(B, w).astype(np.float32))
    return P, A, color, ry, rx


def test_region_over_sep_matches_materialized():
    """region_over_sep(color, ry, rx) == region_over on the explicit
    outer-product layer (within f32 reassociation ulps)."""
    rng = np.random.RandomState(11)
    for (B, H, W, h, w, dy, dx) in [(3, 192, 384, 64, 128, 64, 128),
                                    (2, 256, 512, 128, 256, 0, 256),
                                    (1, 128, 256, 128, 256, 0, 0)]:
        P, A, color, ry, rx = _case(rng, B, H, W, h, w)
        dy0 = jnp.int32(dy)
        dx0 = jnp.int32(dx)
        gP, gA = pallas_ops.region_over_sep(jnp, jax, P, A, color,
                                            ry, rx, dy0, dx0)
        layer = (color[:, :, None, None] * ry[:, None, :, None]
                 * rx[:, None, None, :])
        rP, rA = pallas_ops.region_over(jnp, jax, P, A, layer, dy0, dx0)
        np.testing.assert_allclose(np.asarray(gP), np.asarray(rP),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gA), np.asarray(rA),
                                   atol=1e-5)
        # outside the region the accumulator is untouched
        mask = np.zeros((H, W), bool)
        mask[dy:dy + h, dx:dx + w] = True
        np.testing.assert_array_equal(np.asarray(gP)[:, :, ~mask],
                                      np.asarray(P)[:, :, ~mask])


def test_region_over_sep_rejects_unaligned():
    rng = np.random.RandomState(1)
    P, A, color, ry, rx = _case(rng, 1, 128, 256, 60, 128)
    with pytest.raises(ValueError):
        pallas_ops.region_over_sep(jnp, jax, P, A, color, ry, rx,
                                   jnp.int32(0), jnp.int32(0))


def test_solid_fold_big_batch_smem_fallback():
    """Past the SMEM scalar budget the fold silently takes the XLA
    chain; results must match the jnp reference regardless of path."""
    rng = np.random.RandomState(2)
    L, B, H, W = 6, 192, 32, 128             # 46 KB of scalars
    color = jnp.asarray(rng.rand(L, B, 4).astype(np.float32))
    box = np.zeros((L, B, 4), np.int32)
    for l in range(L):
        for b in range(B):
            y0 = rng.randint(0, H // 2)
            x0 = rng.randint(0, W // 2)
            box[l, b] = [y0, y0 + rng.randint(1, H // 2),
                         x0, x0 + rng.randint(1, W // 2)]
    box = jnp.asarray(box)
    gain = jnp.asarray(rng.uniform(0.5, 1.2, (L, B)).astype(np.float32))
    off = jnp.asarray(rng.uniform(-0.1, 0.1, (L, B)).astype(np.float32))
    gotP, gotA = pallas_ops.solid_fold(jnp, jax, None, None, color,
                                       box, gain, off, H, W)
    Pc, Ac = pallas_ops._fold_jnp(jnp, jax, None, None, color, box,
                                  gain, off, H, W)
    ref = np.stack([np.asarray(c) for c in Pc], axis=1)
    ref = np.broadcast_to(ref, (B, 3, H, W))
    np.testing.assert_array_equal(np.asarray(gotP), ref)
    np.testing.assert_array_equal(np.asarray(gotA)[:, 0],
                                  np.broadcast_to(np.asarray(Ac),
                                                  (B, H, W)))
