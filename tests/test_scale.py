"""Scale kernels vs a direct port of the reference's scalar algorithm
(/root/reference/src/cprocess/video_scale.c, filter.c)."""

import math

import numpy as np
import pytest

from canvas_tpu import backend
from canvas_tpu.basetypes import box2i
from canvas_tpu.frames import RgbaFrameF32
from canvas_tpu.ops import scale
from canvas_tpu.sources import SolidColorVideoSource, VideoScaler


def ref_triangle(sub, offset):
    """Literal transcription of filter_createTriangle's loop for testing."""
    width = (1.0 / sub) if sub < 1.0 else sub
    left = math.ceil(offset - width)
    right = math.floor(offset + width)
    if left == offset - width:
        left += 1
    if right == offset + width:
        right -= 1
    n = int(right) - int(left) + 1
    center = -int(left)
    coeff = np.zeros(n, dtype=np.float32)
    for i in range(n):
        coeff[i] = 1.0 - abs((1.0 / width) * ((i - center) - offset))
    if sub < 1.0 and coeff.sum() != 0.0:
        coeff /= coeff.sum()
    return coeff, center


def ref_scale_axis(src, factor, t_lo, t_hi, s_lo, s_hi, t_point, s_point):
    """C scalar algorithm along axis 0 of (S, ...) src -> (T, ...)."""
    T = t_hi - t_lo + 1
    out = np.zeros((T,) + src.shape[1:], dtype=np.float32)
    touched = np.zeros(T, dtype=bool)
    if factor > 1.0:
        for s in range(s_lo, s_hi + 1):
            c = (s - s_point) * factor + t_point
            base = math.floor(c)
            coeff, center = ref_triangle(factor, c - base)
            for i, w in enumerate(coeff):
                t = base - center + i
                if t_lo <= t <= t_hi:
                    out[t - t_lo] += src[s - s_lo] * w
                    touched[t - t_lo] = True
    else:
        for t in range(t_lo, t_hi + 1):
            c = (t - t_point) / factor + s_point
            base = math.floor(c)
            coeff, center = ref_triangle(factor, c - base)
            for i, w in enumerate(coeff):
                s = base - center + i
                if s_lo <= s <= s_hi:
                    out[t - t_lo] += src[s - s_lo] * w
                    touched[t - t_lo] = True
    return out, touched


@pytest.mark.parametrize('sub,offset', [
    (2.0, 0.0), (2.0, 0.25), (0.5, 0.0), (0.5, 0.75), (1.5, 0.5),
    (0.333, 0.1), (4.0, 0.9)])
def test_triangle_weights_match_reference(sub, offset):
    want, want_center = ref_triangle(sub, offset)
    got, got_center = scale.triangle_weights(sub, offset)
    assert got_center == want_center
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize('factor,t_rng,s_rng,t_pt,s_pt', [
    (2.0, (0, 19), (0, 9), 0.0, 0.0),
    (0.5, (0, 9), (0, 19), 0.0, 0.0),
    (1.7, (0, 16), (0, 9), 2.0, 1.0),
    (0.3, (-5, 5), (0, 30), 0.25, 3.5),
    (3.0, (0, 29), (2, 11), -1.0, 2.0),
])
def test_axis_matrix_matches_scalar_reference(factor, t_rng, s_rng, t_pt, s_pt):
    rng = np.random.RandomState(42)
    S = s_rng[1] - s_rng[0] + 1
    src = rng.rand(S, 3).astype(np.float32)
    want, want_touched = ref_scale_axis(src, factor, t_rng[0], t_rng[1],
                                        s_rng[0], s_rng[1], t_pt, s_pt)
    W, touched = scale.axis_matrix(factor, t_rng[0], t_rng[1],
                                   s_rng[0], s_rng[1], t_pt, s_pt)
    got = W @ src
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(touched, want_touched)


def test_scale_bilinear_identity():
    full = box2i(0, 0, 7, 7)
    data = np.random.RandomState(0).rand(4, 8, 8).astype(np.float32)
    out, win = scale.scale_bilinear(data, full, full, full,
                                    (0.0, 0.0), (0.0, 0.0), (1.0, 1.0))
    np.testing.assert_allclose(out, data, rtol=1e-6)
    assert win == full


def test_scale_bilinear_2x_up(any_backend):
    """2x upsample of a solid region: interior must stay the solid color."""
    full = box2i(0, 0, 15, 15)
    src_full = box2i(0, 0, 7, 7)
    data = np.zeros((4, 8, 8), dtype=np.float32)
    data[:, :, :] = 0.5
    out, win = scale.scale_bilinear(data, src_full, src_full, full,
                                    (0.0, 0.0), (0.0, 0.0), (2.0, 2.0))
    out = backend.asnumpy(out)
    # interior of the upscaled region
    np.testing.assert_allclose(out[:, 2:13, 2:13], 0.5, atol=1e-5)
    assert not win.empty()


def test_scale_bilinear_down_preserves_mean():
    """0.5x downsample with unit-sum filters preserves a constant field."""
    src_full = box2i(0, 0, 15, 15)
    full = box2i(0, 0, 7, 7)
    data = np.full((4, 16, 16), 0.25, dtype=np.float32)
    out, win = scale.scale_bilinear(data, src_full, src_full, full,
                                    (0.0, 0.0), (0.0, 0.0), (0.5, 0.5))
    # away from the border, downsampling a constant gives the constant
    np.testing.assert_allclose(out[:, 2:6, 2:6], 0.25, atol=1e-5)


def test_scale_jax_matches_numpy():
    jnp = backend.jnp
    src_full = box2i(0, 0, 15, 15)
    full = box2i(0, 0, 23, 23)
    data = np.random.RandomState(7).rand(4, 16, 16).astype(np.float32)
    want, want_win = scale.scale_bilinear(
        data, src_full, src_full, full, (1.0, 2.0), (0.5, 0.0), (1.5, 1.5))
    got, got_win = scale.scale_bilinear(
        jnp.asarray(data), src_full, src_full, full,
        (1.0, 2.0), (0.5, 0.0), (1.5, 1.5))
    assert got_win == want_win
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_video_scaler_source(any_backend):
    """VideoScaler pulls only source_rect and scales it
    (VideoScaler.c:62-79 + video_scale.c:288-319)."""
    solid = SolidColorVideoSource((1.0, 0.0, 0.0, 1.0),
                                  window=box2i(0, 0, 3, 3))
    scaler = VideoScaler(solid, target_point=(0.0, 0.0),
                         source_point=(0.0, 0.0),
                         scale_factors=(2.0, 2.0),
                         source_rect=box2i(0, 0, 3, 3))
    frame = scaler.get_frame_f32(0, box2i(0, 0, 15, 15))
    assert not frame.current_window.empty()
    px = frame.pixel(2, 2)
    assert abs(px.r - 1.0) < 1e-4
    assert abs(px.a - 1.0) < 1e-4
    # well outside the scaled 8x8 region
    assert frame.pixel(12, 12) is None


def test_video_scaler_identity_passthrough():
    solid = SolidColorVideoSource((0.0, 1.0, 0.0, 1.0),
                                  window=box2i(1, 1, 4, 4))
    scaler = VideoScaler(solid, (0.0, 0.0), (0.0, 0.0), (1.0, 1.0),
                         box2i(-100, -100, 100, 100))
    frame = scaler.get_frame_f32(0, box2i(0, 0, 7, 7))
    assert frame.current_window == box2i(1, 1, 4, 4)
    assert abs(frame.pixel(2, 2).g - 1.0) < 1e-6


def test_video_scaler_zero_factor_empty():
    solid = SolidColorVideoSource((1.0, 1.0, 1.0, 1.0))
    scaler = VideoScaler(solid, (0.0, 0.0), (0.0, 0.0), (0.0, 1.0),
                         box2i(0, 0, 10, 10))
    frame = scaler.get_frame_f32(0, box2i(0, 0, 7, 7))
    assert frame.current_window.empty()


def test_lanczos_weights_basic():
    # symmetric at offset 0, peak 1 at center
    coeff, center = scale.lanczos_weights(1.0, 2, 0.0)
    assert coeff[center] == pytest.approx(1.0)
    np.testing.assert_allclose(coeff, coeff[::-1], atol=1e-6)
    # downsampling normalizes to unit sum
    coeff, _ = scale.lanczos_weights(0.5, 2, 0.3)
    assert coeff.sum() == pytest.approx(1.0, abs=1e-6)


def test_axis_matrix_empty_ranges_return_empty():
    """Negative-extent ranges (intersections of disjoint boxes) return
    the documented empty result instead of raising from np.zeros."""
    from canvas_tpu.ops import scale

    W, touched = scale.axis_matrix(2.0, 5, 0, 0, 9, 0.0, 0.0)
    assert W.shape == (0, 10) and touched.shape == (0,)
    pos, w, t = scale.axis_taps(2.0, 5, 0, 0, 9, 0.0, 0.0)
    assert pos.shape[0] == 0 and w.shape[0] == 0 and t.shape == (0,)
    W2, t2 = scale.axis_matrix(2.0, 0, 5, 9, 0, 0.0, 0.0)
    assert W2.shape == (6, 0) and not t2.any()
