"""Execute the ACTUAL Pallas kernel bodies on CPU via the Pallas
interpreter and diff them against the jnp fallback paths.

Normal CPU test runs exercise only the fallbacks (solid_fold's fused
XLA chain, region_over's pad+dynamic-slice form) — the kernel bodies in
`_kernel_factory` / `region_over` / `region_over_sep` otherwise only
ever run on a real chip. CANVAS_PALLAS_INTERPRET=1 routes the same
calls through `pl.pallas_call(..., interpret=True)` so CI covers the
kernel logic itself: box masking from SMEM scalars, premultiplied fold
order, scalar-prefetched block offsets, io-aliased accumulators, edge
clipping of overhanging blocks, and the rank-1 tile rebuild.

The fold chain and the kernel are written in the same op order
(pallas_ops.py docstring) and compare bit-identically ON CHIP
(tests/test_render.py fold-mode A/Bs); under the CPU interpreter the
kernel compiles through CPU XLA, which contracts a*b+c into fma where
the fallback chain does not, so these diffs allow ~1 f32 ulp
(atol=1e-6 against values in [0, 2]). region_over_sep additionally
reassociates the rank-1 product.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from canvas_tpu.ops import pallas_ops as po


@pytest.fixture
def interp(monkeypatch):
    """Force the Pallas kernels (interpreted) for calls under test."""
    def on():
        monkeypatch.setenv('CANVAS_PALLAS_INTERPRET', '1')
        monkeypatch.setenv('CANVAS_FOLD_MODE', 'pallas')

    def off():
        monkeypatch.delenv('CANVAS_PALLAS_INTERPRET', raising=False)
        monkeypatch.delenv('CANVAS_FOLD_MODE', raising=False)

    off()
    return on, off


def _solid_layers(rng, L, B, H, W, empties=()):
    color = rng.uniform(0.0, 1.0, size=(L, B, 4)).astype(np.float32)
    gain = rng.uniform(0.5, 1.5, size=(L, B)).astype(np.float32)
    offset = rng.uniform(-0.2, 0.2, size=(L, B)).astype(np.float32)
    box = np.zeros((L, B, 4), np.int32)
    for l in range(L):
        for b in range(B):
            if (l, b) in empties:
                box[l, b] = (5, 4, 5, 4)          # y1 < y0: empty
                continue
            y0 = rng.integers(0, H - 1)
            y1 = rng.integers(y0, H)
            x0 = rng.integers(0, W - 1)
            x1 = rng.integers(x0, W)
            box[l, b] = (y0, y1, x0, x1)
    return (jnp.asarray(color), jnp.asarray(box), jnp.asarray(gain),
            jnp.asarray(offset))


def test_solid_fold_kernel_matches_jnp_chain(interp):
    """Mid-stack fold (finalize=False), no base, multi-tile grid with
    edge-clipped blocks (H=300 -> TH=256 grid 2; W=640 -> TW=512)."""
    on, off = interp
    rng = np.random.default_rng(7)
    L, B, H, W = 3, 2, 300, 640
    color, box, gain, offset = _solid_layers(
        rng, L, B, H, W, empties={(1, 0)})

    off()
    expP, expA = po.solid_fold(jnp, jax, None, None, color, box, gain,
                               offset, H, W)
    on()
    gotP, gotA = po.solid_fold(jnp, jax, None, None, color, box, gain,
                               offset, H, W)
    np.testing.assert_allclose(np.asarray(gotP), np.asarray(expP),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gotA), np.asarray(expA),
                               rtol=0, atol=1e-6)
    # the fold actually wrote content (guards against an all-zero pass)
    assert float(jnp.abs(gotA).max()) > 0.0


def test_solid_fold_kernel_base_and_finalize(interp):
    """Fold over an existing premultiplied base, finalize=True
    un-premultiplies in-kernel and casts to the requested dtype."""
    on, off = interp
    rng = np.random.default_rng(11)
    L, B, H, W = 2, 2, 64, 256
    color, box, gain, offset = _solid_layers(rng, L, B, H, W)
    P = jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32))
    A = jnp.asarray(rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32))

    off()
    exp = po.solid_fold(jnp, jax, P, A, color, box, gain, offset, H, W,
                        finalize=True, out_dtype=jnp.float16)
    on()
    got = po.solid_fold(jnp, jax, P, A, color, box, gain, offset, H, W,
                        finalize=True, out_dtype=jnp.float16)
    assert got.dtype == jnp.float16
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_solid_fold_kernel_all_empty_boxes(interp):
    """All-empty layers leave the base untouched through the kernel."""
    on, off = interp
    rng = np.random.default_rng(13)
    L, B, H, W = 2, 1, 64, 128
    color, box, gain, offset = _solid_layers(
        rng, L, B, H, W, empties={(0, 0), (1, 0)})
    P = jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32))
    A = jnp.asarray(rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32))
    on()
    gotP, gotA = po.solid_fold(jnp, jax, P, A, color, box, gain, offset,
                               H, W)
    np.testing.assert_array_equal(np.asarray(gotP), np.asarray(P))
    np.testing.assert_array_equal(np.asarray(gotA), np.asarray(A))


def test_region_over_kernel_matches_fallback(interp):
    """Scalar-prefetched block offsets + io-aliased accumulator: the
    interpreted kernel matches the pad+dynamic-slice fallback,
    including an overhanging edge block (frame H=150 inside its
    192-row aligned envelope; the region's last row-block is clipped
    on store)."""
    on, off = interp
    rng = np.random.default_rng(17)
    B, H, W = 2, 150, 384
    h, w = 128, 256
    dy0, dx0 = jnp.int32(64), jnp.int32(128)   # rows 64..191 overhang
    P = jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32))
    A = jnp.asarray(rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32))
    layer = jnp.asarray(rng.uniform(0, 1, (B, 4, h, w)).astype(np.float32))

    off()
    expP, expA = po.region_over(jnp, jax, P, A, layer, dy0, dx0)
    on()
    gotP, gotA = po.region_over(jnp, jax, P, A, layer, dy0, dx0)
    np.testing.assert_allclose(np.asarray(gotP), np.asarray(expP),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gotA), np.asarray(expA),
                               rtol=0, atol=1e-6)
    # untouched outside the region
    np.testing.assert_array_equal(np.asarray(gotP)[:, :, :64, :],
                                  np.asarray(P)[:, :, :64, :])


def test_region_over_kernel_rejects_unaligned(interp):
    on, off = interp
    on()
    P = jnp.zeros((1, 3, 128, 256), jnp.float32)
    A = jnp.zeros((1, 1, 128, 256), jnp.float32)
    layer = jnp.zeros((1, 4, 60, 128), jnp.float32)
    with pytest.raises(ValueError):
        po.region_over(jnp, jax, P, A, layer, jnp.int32(0), jnp.int32(0))


def test_region_over_sep_kernel_matches_materialized(interp):
    """The rank-1 kernel rebuilds each tile from the per-axis vectors;
    compare against materializing the outer product and compositing
    with the region_over fallback (within f32 reassociation ulps)."""
    on, off = interp
    rng = np.random.default_rng(19)
    B, H, W = 2, 256, 512
    h, w = 128, 256
    dy0, dx0 = jnp.int32(64), jnp.int32(128)
    P = jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32))
    A = jnp.asarray(rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 1, (B, 4)).astype(np.float32))
    ry = jnp.asarray(rng.uniform(0, 1, (B, h)).astype(np.float32))
    rx = jnp.asarray(rng.uniform(0, 1, (B, w)).astype(np.float32))

    off()
    expP, expA = po.region_over_sep(jnp, jax, P, A, color, ry, rx,
                                    dy0, dx0)
    on()
    gotP, gotA = po.region_over_sep(jnp, jax, P, A, color, ry, rx,
                                    dy0, dx0)
    np.testing.assert_allclose(np.asarray(gotP), np.asarray(expP),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gotA), np.asarray(expA),
                               rtol=0, atol=1e-6)
    # untouched outside the region
    np.testing.assert_array_equal(np.asarray(gotP)[:, :, :, :128],
                                  np.asarray(P)[:, :, :, :128])


def test_planner_end_to_end_interpreted_kernels(interp):
    """Full batched planner with the kernels interpreted: a graph that
    folds solids (Pallas mid-fold), places a rank-1 scaled solid
    (region_over_sep) and a materialized placed layer (region_over),
    matches the eager pull path — the same differential contract the
    on-chip suite enforces, now with the kernel bodies in the loop."""
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.framefuncs import LerpFunc
    from canvas_tpu.sources import (SolidColorVideoSource,
                                    VideoGainOffsetFilter, VideoScaler,
                                    VideoWorkspace)

    on, off = interp
    window = box2i(0, 0, 639, 383)
    ws = VideoWorkspace()
    ws.add(source=SolidColorVideoSource((0.1, 0.1, 0.12, 1.0)),
           x=0, length=8, z=0)
    ws.add(source=SolidColorVideoSource(
        LerpFunc((0.9, 0.2, 0.1, 0.8), (0.1, 0.9, 0.4, 0.4), 8),
        window=box2i(10, 10, 500, 300)), x=0, length=8, z=1)
    rank1 = SolidColorVideoSource(
        LerpFunc((0.8, 0.3, 0.2, 0.9), (0.2, 0.7, 0.9, 0.5), 8),
        window=box2i(0, 0, 95, 63))
    ws.add(source=VideoScaler(
        rank1,
        target_point=LerpFunc((40, 30), (300, 200), 8),
        source_point=(0.0, 0.0),
        scale_factors=LerpFunc((1.0, 1.0), (1.6, 1.6), 8),
        source_rect=box2i(0, 0, 95, 63)), x=0, length=8, z=2)
    # gain over the scaled solid breaks rank-1 factoring: materialized
    # placed region -> region_over
    ws.add(source=VideoGainOffsetFilter(
        VideoScaler(
            SolidColorVideoSource((0.3, 0.6, 0.9, 0.7),
                                  window=box2i(0, 0, 63, 63)),
            target_point=(420.0, 80.0), source_point=(0.0, 0.0),
            scale_factors=LerpFunc((1.0, 1.0), (2.1, 2.1), 8),
            source_rect=box2i(0, 0, 63, 63)),
        gain=0.8, offset=0.05), x=0, length=8, z=3)

    want = []
    for i in range(8):
        frame = ws.get_frame_f16(i, window)
        want.append(np.asarray(frame.data, np.float16))
    want = np.stack(want)

    on()
    got = render.render_frames(ws, window, 0, 8)
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=4e-3)
