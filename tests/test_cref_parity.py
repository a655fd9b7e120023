"""Differential parity against the reference's OWN compiled C kernels.

cbaseline's ``parity`` target compiles the reference cprocess sources
(/root/reference/src/cprocess — read in place, never copied) into
``cbaseline/build/parity/libcref.so`` with IEEE semantics
(-O2 -fPIC, no -ffast-math, -ffp-contract=off). These tests drive that
binary through ctypes and compare its outputs against canvas_tpu's
kernels on the same inputs — so parity claims are checked against the
reference's *compiled arithmetic*, not a re-derivation of it.

Exactness tiers (each test says which and why):

* BIT-EXACT — half conversion, the four transfer LUTs, the gamma45
  ramp, FIR coefficients, f32 mix blends, audio kernels, frame/time
  conversion. These have no rounding ambiguity: we reproduce the same
  operations in the same order.
* LAST-ULP — kernels whose intermediate f32->f16 conversions use a
  different rounding mode (the C truncates via half_convert_from_float;
  our frame paths round-to-nearest) or whose FIR/matrix accumulation
  order differs (einsum vs sequential adds). Bounded and asserted
  tightly (<=1 f16 ulp, or <=1 u8 step on a tiny fraction of pixels).
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from canvas_tpu import backend
from canvas_tpu.basetypes import box2i
from canvas_tpu.ops import color as color_ops

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CBASE = os.path.join(REPO, 'cbaseline')
LIB = os.path.join(CBASE, 'build', 'parity', 'libcref.so')
REF = '/root/reference'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, 'src', 'cprocess')),
    reason='reference tree not present')


# --- ctypes surface ----------------------------------------------------------

class V2i(ctypes.Structure):
    _fields_ = [('x', ctypes.c_int32), ('y', ctypes.c_int32)]


class Box2i(ctypes.Structure):
    _fields_ = [('min', V2i), ('max', V2i)]


class V2f(ctypes.Structure):
    _fields_ = [('x', ctypes.c_float), ('y', ctypes.c_float)]


class FrameF16(ctypes.Structure):
    _fields_ = [('data', ctypes.POINTER(ctypes.c_uint16)),
                ('full_window', Box2i), ('current_window', Box2i)]


class FrameF32(ctypes.Structure):
    _fields_ = [('data', ctypes.POINTER(ctypes.c_float)),
                ('full_window', Box2i), ('current_window', Box2i)]


class AudioFrameC(ctypes.Structure):
    _fields_ = [('data', ctypes.POINTER(ctypes.c_float)),
                ('channels', ctypes.c_int),
                ('full_min_sample', ctypes.c_int),
                ('full_max_sample', ctypes.c_int),
                ('current_min_sample', ctypes.c_int),
                ('current_max_sample', ctypes.c_int)]


class FirFilter(ctypes.Structure):
    _fields_ = [('coeff', ctypes.POINTER(ctypes.c_float)),
                ('width', ctypes.c_int), ('center', ctypes.c_int)]


class CodedImage(ctypes.Structure):
    _fields_ = [('data', ctypes.c_void_p * 4),
                ('stride', ctypes.c_int * 4),
                ('line_count', ctypes.c_int * 4),
                ('free_func', ctypes.c_void_p)]


class Rational(ctypes.Structure):
    _fields_ = [('n', ctypes.c_int32), ('d', ctypes.c_uint32)]


def _cbox(b):
    out = Box2i()
    out.min.x, out.min.y, out.max.x, out.max.y = b.min.x, b.min.y, b.max.x, b.max.y
    return out


def _make_frame_f16(data_4hw, full, current):
    """(4,H,W) f16 -> interleaved C frame over *full*. Returns (frame,
    backing array) — keep the array alive while the frame is in use."""
    h = full.max.y - full.min.y + 1
    w = full.max.x - full.min.x + 1
    assert data_4hw.shape == (4, h, w)
    inter = np.ascontiguousarray(
        np.moveaxis(data_4hw.astype(np.float16), 0, -1)).reshape(-1)
    bits = inter.view(np.uint16)
    frame = FrameF16()
    frame.data = bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    frame.full_window = _cbox(full)
    frame.current_window = _cbox(current)
    return frame, bits


def _make_frame_f32(data_4hw, full, current):
    h = full.max.y - full.min.y + 1
    w = full.max.x - full.min.x + 1
    assert data_4hw.shape == (4, h, w)
    inter = np.ascontiguousarray(
        np.moveaxis(data_4hw.astype(np.float32), 0, -1)).reshape(-1)
    frame = FrameF32()
    frame.data = inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    frame.full_window = _cbox(full)
    frame.current_window = _cbox(current)
    return frame, inter


def _frame_to_4hw(inter, full, dtype):
    h = full.max.y - full.min.y + 1
    w = full.max.x - full.min.x + 1
    return np.moveaxis(inter.astype(dtype).reshape(h, w, 4), -1, 0)


@pytest.fixture(scope='session')
def cref():
    """Build (incrementally — always invoked, so shim/source edits
    rebuild instead of silently validating a stale binary) and load the
    reference parity library."""
    try:
        subprocess.run(['make', '-C', CBASE, 'parity'], check=True,
                       capture_output=True, text=True, timeout=300)
    except (subprocess.CalledProcessError, OSError,
            subprocess.TimeoutExpired) as e:
        if not os.path.exists(LIB):
            pytest.skip('could not build parity lib: %s' % (e,))
    lib = ctypes.CDLL(LIB)
    lib.init_half()

    lib.video_transfer_rec709_to_linear_scene.argtypes = \
        lib.video_transfer_rec709_to_linear_display.argtypes = \
        lib.video_transfer_linear_to_rec709.argtypes = \
        lib.video_transfer_linear_to_sRGB.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_size_t]
    lib.video_get_gamma45_ramp.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.filter_createTriangle.argtypes = [
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(FirFilter)]
    lib.filter_createLanczos.argtypes = [
        ctypes.c_float, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(FirFilter)]
    lib.filter_free.argtypes = [ctypes.POINTER(FirFilter)]
    lib.video_mix_cross_f32.argtypes = [
        ctypes.POINTER(FrameF32), ctypes.POINTER(FrameF32),
        ctypes.POINTER(FrameF32), ctypes.c_float]
    lib.video_mix_over_f32.argtypes = [
        ctypes.POINTER(FrameF32), ctypes.POINTER(FrameF32), ctypes.c_float]
    lib.video_copy_frame_alpha_f32.argtypes = [
        ctypes.POINTER(FrameF32), ctypes.POINTER(FrameF32), ctypes.c_float]
    lib.video_color_rgb_to_xyz_sdtv.argtypes = [ctypes.POINTER(FrameF16)]
    lib.video_color_xyz_to_srgb.argtypes = [ctypes.POINTER(FrameF16)]
    lib.video_reconstruct_dv.argtypes = [
        ctypes.POINTER(FrameF16), ctypes.POINTER(CodedImage)]
    lib.video_subsample_dv.argtypes = [ctypes.POINTER(FrameF16)]
    lib.video_subsample_dv.restype = ctypes.POINTER(CodedImage)
    lib.audio_copy_frame.argtypes = [
        ctypes.POINTER(AudioFrameC), ctypes.POINTER(AudioFrameC),
        ctypes.c_int]
    lib.audio_copy_frame_attenuate.argtypes = [
        ctypes.POINTER(AudioFrameC), ctypes.POINTER(AudioFrameC),
        ctypes.c_float, ctypes.c_int]
    lib.audio_attenuate.argtypes = [
        ctypes.POINTER(AudioFrameC), ctypes.c_float]
    lib.audio_mix_add.argtypes = [
        ctypes.POINTER(AudioFrameC), ctypes.POINTER(AudioFrameC),
        ctypes.c_float, ctypes.c_int]
    lib.get_frame_time.argtypes = [ctypes.POINTER(Rational), ctypes.c_int]
    lib.get_frame_time.restype = ctypes.c_int64
    lib.get_time_frame.argtypes = [ctypes.POINTER(Rational), ctypes.c_int64]
    lib.get_time_frame.restype = ctypes.c_int
    return lib


CONV = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_uint16),
                        ctypes.POINTER(ctypes.c_float), ctypes.c_int)
CONV_BACK = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_uint16), ctypes.c_int)


def _all_half_bits():
    return np.arange(65536, dtype=np.uint16)


def _finite_halves():
    h = _all_half_bits().view(np.float16)
    return h[np.isfinite(h)]


# --- half conversion ---------------------------------------------------------

def test_half_convert_from_float_exhaustive(cref):
    """BIT-EXACT: float_to_half_trunc vs the binary's
    half_convert_from_float (half.c van der Zijp tables) on every finite
    half value, the surrounding f32 neighbours, subnormals, and overflow."""
    fn = CONV.in_dll(cref, 'half_convert_from_float')
    f = _finite_halves().astype(np.float32)
    # neighbours exercise truncation (values strictly between grid points)
    up = np.nextafter(f, np.float32(np.inf)).astype(np.float32)
    dn = np.nextafter(f, np.float32(-np.inf)).astype(np.float32)
    rng = np.random.default_rng(42)
    rand = rng.standard_normal(65536).astype(np.float32) * \
        np.exp2(rng.integers(-30, 20, 65536)).astype(np.float32)
    special = np.array([0.0, -0.0, 65504.0, 65520.0, 65536.0, -65536.0,
                        1e9, -1e9, 6e-8, -6e-8, 5.96e-8 / 4,
                        np.inf, -np.inf], np.float32)
    x = np.ascontiguousarray(np.concatenate([f, up, dn, rand, special]))
    out = np.empty(x.size, np.uint16)
    fn(out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
       x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size)
    ours = color_ops.float_to_half_trunc(x).view(np.uint16)
    np.testing.assert_array_equal(ours, out)


def test_half_convert_to_float_exhaustive(cref):
    """BIT-EXACT: the binary's half->float vs numpy's f16->f32 cast on
    all 65536 bit patterns (NaNs compared as bits-preserved-or-NaN)."""
    fn = CONV_BACK.in_dll(cref, 'half_convert_to_float')
    bits = np.ascontiguousarray(_all_half_bits())
    out = np.empty(65536, np.float32)
    fn(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), 65536)
    ours = bits.view(np.float16).astype(np.float32)
    nan = np.isnan(ours)
    assert np.isnan(out[nan]).all()
    np.testing.assert_array_equal(ours[~nan], out[~nan])


# --- transfer curves + gamma ramp ---------------------------------------------

@pytest.mark.parametrize('cname,ours', [
    ('video_transfer_rec709_to_linear_scene',
     color_ops.transfer_rec709_to_linear_scene),
    ('video_transfer_rec709_to_linear_display',
     color_ops.transfer_rec709_to_linear_display),
    ('video_transfer_linear_to_rec709',
     color_ops.transfer_linear_to_rec709),
    ('video_transfer_linear_to_sRGB',
     color_ops.transfer_linear_to_srgb),
])
def test_transfer_curve_exhaustive(cref, cname, ours):
    """BIT-EXACT on all 65536 half inputs: our 64K LUTs are built with
    libm powf + truncating f16 conversion precisely so they reproduce
    the reference binary's tables (gammatab.c)."""
    bits = np.ascontiguousarray(_all_half_bits())
    out = np.empty(65536, np.uint16)
    getattr(cref, cname)(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), 65536)
    got = ours(bits.view(np.float16)).view(np.uint16)
    mismatch = np.nonzero(got != out)[0]
    assert mismatch.size == 0, (
        '%d/65536 entries differ; first at bits=0x%04x: ours=0x%04x '
        'ref=0x%04x' % (mismatch.size, mismatch[0], got[mismatch[0]],
                        out[mismatch[0]]))


def test_gamma45_ramp_exhaustive(cref):
    """BIT-EXACT: the 65536-entry f16->u8 display ramp (gammatab.c:12-37)."""
    ptr = cref.video_get_gamma45_ramp()
    ref = np.ctypeslib.as_array(ptr, shape=(65536,)).copy()
    np.testing.assert_array_equal(color_ops.gamma45_ramp_u8(), ref)


# --- FIR filters --------------------------------------------------------------

@pytest.mark.parametrize('sub', [0.25, 1.0 / 3.0, 0.5, 1.0, 1.5, 2.0, 4.0])
@pytest.mark.parametrize('offset', [0.0, 0.25, -0.37, 0.5])
def test_triangle_filter(cref, sub, offset):
    """BIT-EXACT coefficients vs filter_createTriangle (filter.c:24-77)."""
    from canvas_tpu.ops import scale as scale_ops
    filt = FirFilter()
    cref.filter_createTriangle(ctypes.c_float(sub), ctypes.c_float(offset),
                               ctypes.byref(filt))
    try:
        ref = np.ctypeslib.as_array(filt.coeff, shape=(filt.width,)).copy()
        coeff, center = scale_ops.triangle_weights(
            np.float32(sub), np.float32(offset))
        assert center == filt.center
        np.testing.assert_array_equal(coeff.astype(np.float32), ref)
    finally:
        cref.filter_free(ctypes.byref(filt))


@pytest.mark.parametrize('sub,size', [(1.0, 2), (1.0, 3), (0.5, 2),
                                      (2.0, 4), (1.0 / 3.0, 3)])
@pytest.mark.parametrize('offset', [0.0, 0.3, -0.45])
def test_lanczos_filter(cref, sub, size, offset):
    """BIT-EXACT coefficients vs filter_createLanczos (filter.c:80-141):
    f32 edges, double sinc, sequential-f32 normalization."""
    from canvas_tpu.ops import scale as scale_ops
    filt = FirFilter()
    cref.filter_createLanczos(ctypes.c_float(sub), size,
                              ctypes.c_float(offset), ctypes.byref(filt))
    try:
        ref = np.ctypeslib.as_array(filt.coeff, shape=(filt.width,)).copy()
        coeff, center = scale_ops.lanczos_weights(
            np.float32(sub), size, np.float32(offset))
        assert center == filt.center
        np.testing.assert_array_equal(coeff.astype(np.float32), ref)
    finally:
        cref.filter_free(ctypes.byref(filt))


# --- video mix ----------------------------------------------------------------

def _rand_rgba_f32(rng, h, w):
    d = rng.random((4, h, w), np.float32) * np.float32(1.5)
    # exercise zero and full alpha (the divide-by-out_a guard)
    a = d[3]
    a[rng.random((h, w)) < 0.1] = 0.0
    a[rng.random((h, w)) < 0.1] = 1.0
    return d


@pytest.mark.parametrize('mix_b', [0.0, 0.25, 0.6180034, 1.0])
def test_mix_cross_f32(cref, mix_b):
    """BIT-EXACT vs video_mix_cross_f32 (video_mix.c:108-235) on
    co-extensive windows (every pixel through the blend formula)."""
    from canvas_tpu.ops import mix as mix_ops
    rng = np.random.default_rng(7)
    full = box2i(0, 0, 63, 31)
    a = _rand_rgba_f32(rng, 32, 64)
    b = _rand_rgba_f32(rng, 32, 64)
    fa, _ba = _make_frame_f32(a, full, full)
    fb, _bb = _make_frame_f32(b, full, full)
    out = np.zeros((4, 32, 64), np.float32)
    fo, bo = _make_frame_f32(out, full, full)
    cref.video_mix_cross_f32(ctypes.byref(fo), ctypes.byref(fa),
                             ctypes.byref(fb), ctypes.c_float(mix_b))
    ref = _frame_to_4hw(bo, full, np.float32)
    with backend.force_backend('numpy'):
        got = mix_ops.cross(a, b, np.float32(mix_b))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize('mix_b', [0.3, 1.0])
def test_mix_over_f32(cref, mix_b):
    """BIT-EXACT vs video_mix_over_f32 (video_mix.c:238-370), same-window
    case (b composited over the accumulated frame in place)."""
    from canvas_tpu.ops import mix as mix_ops
    rng = np.random.default_rng(11)
    full = box2i(0, 0, 47, 23)
    under = _rand_rgba_f32(rng, 24, 48)
    b = _rand_rgba_f32(rng, 24, 48)
    fo, bo = _make_frame_f32(under, full, full)
    fb, _bb = _make_frame_f32(b, full, full)
    cref.video_mix_over_f32(ctypes.byref(fo), ctypes.byref(fb),
                            ctypes.c_float(mix_b))
    ref = _frame_to_4hw(bo, full, np.float32)
    with backend.force_backend('numpy'):
        got = mix_ops.over(under, b, np.float32(mix_b))
    np.testing.assert_array_equal(got, ref)


def test_mix_over_f32_zero_mix(cref):
    """mix_b == 0 is an early-out in the C (the frame is left untouched,
    video_mix.c:247-249); our branch-free formula computes
    (rgb*a)/a instead, which is within one f32 ulp of rgb."""
    from canvas_tpu.ops import mix as mix_ops
    rng = np.random.default_rng(11)
    full = box2i(0, 0, 47, 23)
    under = _rand_rgba_f32(rng, 24, 48)
    b = _rand_rgba_f32(rng, 24, 48)
    fo, bo = _make_frame_f32(under, full, full)
    fb, _bb = _make_frame_f32(b, full, full)
    cref.video_mix_over_f32(ctypes.byref(fo), ctypes.byref(fb),
                            ctypes.c_float(0.0))
    ref = _frame_to_4hw(bo, full, np.float32)
    with backend.force_backend('numpy'):
        got = mix_ops.over(under, b, np.float32(0.0))
    np.testing.assert_array_equal(got[3], ref[3])
    # rgb is don't-care where alpha is zero (C leaves stale bytes there,
    # the blend formula writes zero)
    care = ref[3] != 0.0
    rb = ref[:3].view(np.uint32).astype(np.int64)[:, care]
    gb = got[:3].view(np.uint32).astype(np.int64)[:, care]
    assert np.abs(rb - gb).max() <= 1


def test_attenuate_f32(cref):
    """BIT-EXACT vs video_copy_frame_alpha_f32 (alpha scaled, rgb
    copied)."""
    from canvas_tpu.ops import mix as mix_ops
    rng = np.random.default_rng(13)
    full = box2i(0, 0, 31, 15)
    a = _rand_rgba_f32(rng, 16, 32)
    out = np.zeros_like(a)
    fo, bo = _make_frame_f32(out, full, full)
    fa, _ba = _make_frame_f32(a, full, full)
    cref.video_copy_frame_alpha_f32(ctypes.byref(fo), ctypes.byref(fa),
                                    ctypes.c_float(0.7))
    ref = _frame_to_4hw(bo, full, np.float32)
    with backend.force_backend('numpy'):
        got = mix_ops.attenuate(a, np.float32(0.7))
    np.testing.assert_array_equal(got, ref)


def _windowed_rgba_f32(rng, full, win):
    """(4,H,W) over *full*: random inside *win*, zero outside — our
    frames' zero-outside invariant, and deterministic padding for the C
    (whose frames malloc the full window and only write current)."""
    h = full.max.y - full.min.y + 1
    w = full.max.x - full.min.x + 1
    d = np.zeros((4, h, w), np.float32)
    d[:, win.min.y - full.min.y:win.max.y - full.min.y + 1,
         win.min.x - full.min.x:win.max.x - full.min.x + 1] = \
        _rand_rgba_f32(rng, win.max.y - win.min.y + 1,
                       win.max.x - win.min.x + 1)
    return d


def _rgb_ulp32_ok(got, ref, care):
    """rgb within one f32 ulp where *care*; zero where not (values are
    non-negative here, so raw-bit distance is monotone)."""
    rb = ref[:3].view(np.uint32).astype(np.int64)[:, care]
    gb = got[:3].view(np.uint32).astype(np.int64)[:, care]
    assert np.abs(rb - gb).max(initial=0) <= 1
    assert not got[:3][:, ~care].any()


def test_mix_cross_f32_y_mismatch(cref):
    """video_mix_cross_f32 with windows differing in y
    (video_mix.c:143-158,218-232): the C walks top/overlap/bottom
    strips, copying the lone frame and scaling alpha in the strips;
    our branch-free blend computes (rgb*alpha)/alpha there. Overlap
    band and all alphas BIT-EXACT; strip rgb within 1 f32 ulp (where
    the C's copied-then-zeroed-alpha rgb is defined at all)."""
    from canvas_tpu.ops import mix as mix_ops
    rng = np.random.default_rng(17)
    full = box2i(0, 0, 31, 23)
    awin = box2i(0, 0, 31, 15)
    bwin = box2i(0, 8, 31, 23)
    a = _windowed_rgba_f32(rng, full, awin)
    b = _windowed_rgba_f32(rng, full, bwin)
    fa, _ba = _make_frame_f32(a, full, awin)
    fb, _bb = _make_frame_f32(b, full, bwin)
    out = np.zeros_like(a)
    fo, bo = _make_frame_f32(out, full, full)
    cref.video_mix_cross_f32(ctypes.byref(fo), ctypes.byref(fa),
                             ctypes.byref(fb), ctypes.c_float(0.25))
    assert (fo.current_window.min.y, fo.current_window.max.y) == (0, 23)
    ref = _frame_to_4hw(bo, full, np.float32)
    with backend.force_backend('numpy'):
        got = mix_ops.cross(a, b, np.float32(0.25))
    np.testing.assert_array_equal(got[3], ref[3])
    # overlap band runs the identical blend formula
    np.testing.assert_array_equal(got[:, 8:16], ref[:, 8:16])
    _rgb_ulp32_ok(got, ref, ref[3] != 0.0)


def test_mix_cross_f32_x_mismatch_reference_artifact(cref):
    """Windows differing in x hit a bug in the reference ITSELF:
    video_mix.c:137 picks the 'left' frame by comparing awin->min.x
    against bwin->min.*y* (x against y), so whenever A is genuinely the
    left frame the C renders B's out-of-window (uninitialized) pixels
    into the A-only strip. With zeroed padding the compiled C emits
    zero there; we implement the evident intent — the lone frame scaled
    by its mix weight, exactly what the C does for y-only mismatches.
    This test PINS both behaviors so the divergence is a recorded
    decision, not an accident (docs/api.md fidelity contract)."""
    from canvas_tpu.ops import mix as mix_ops
    rng = np.random.default_rng(19)
    full = box2i(0, 0, 31, 15)
    awin = box2i(0, 0, 19, 15)
    bwin = box2i(12, 0, 31, 15)
    a = _windowed_rgba_f32(rng, full, awin)
    b = _windowed_rgba_f32(rng, full, bwin)
    # make the artifact observable: A has solid alpha in its strip
    a[3, :, :12] = np.maximum(a[3, :, :12], np.float32(0.5))
    fa, _ba = _make_frame_f32(a, full, awin)
    fb, _bb = _make_frame_f32(b, full, bwin)
    out = np.zeros_like(a)
    fo, bo = _make_frame_f32(out, full, full)
    cref.video_mix_cross_f32(ctypes.byref(fo), ctypes.byref(fa),
                             ctypes.byref(fb), ctypes.c_float(0.25))
    ref = _frame_to_4hw(bo, full, np.float32)
    with backend.force_backend('numpy'):
        got = mix_ops.cross(a, b, np.float32(0.25))
    # the reference's artifact: left resolves to B, so the A-only strip
    # (x 0..11) reads B's padding -> zero alpha despite A's coverage
    assert not ref[3, :, :12].any()
    # our intent-preserving result: A scaled by mix_a = 0.75 (exact)
    np.testing.assert_array_equal(got[3, :, :12],
                                  a[3, :, :12] * np.float32(0.75))
    # overlap band (both frames defined): identical blend, BIT-EXACT
    np.testing.assert_array_equal(got[:, :, 12:20], ref[:, :, 12:20])
    # right strip (B only): the C's 'right' pick is correct here
    np.testing.assert_array_equal(got[3, :, 20:], ref[3, :, 20:])
    care = ref[3, :, 20:] != 0.0
    rb = ref[:3, :, 20:].view(np.uint32).astype(np.int64)[:, care]
    gb = got[:3, :, 20:].view(np.uint32).astype(np.int64)[:, care]
    assert np.abs(rb - gb).max(initial=0) <= 1


def test_mix_over_f32_x_mismatch_reference_artifact(cref):
    """video_mix_over_f32 carries the IDENTICAL x-vs-y bug in its own
    left-frame pick: video_mix.c:265 compares outwin->min.x against
    bwin->min.*y*, so whenever the accumulated frame is genuinely the
    left one the C renders B's out-of-window (uninitialized) pixels
    into the out-only strip. With zeroed padding the compiled C emits
    zero there; we render the evident intent — the accumulated frame
    unchanged where B has no coverage (what the C does for y-only
    mismatches). PINS both behaviors (docs/api.md fidelity contract;
    mirrors test_mix_cross_f32_x_mismatch_reference_artifact)."""
    from canvas_tpu.ops import mix as mix_ops
    rng = np.random.default_rng(23)
    full = box2i(0, 0, 31, 15)
    outwin = box2i(0, 0, 19, 15)
    bwin = box2i(12, 0, 31, 15)
    under = _windowed_rgba_f32(rng, full, outwin)
    b = _windowed_rgba_f32(rng, full, bwin)
    # make the artifact observable: out has solid alpha in its strip
    under[3, :, :12] = np.maximum(under[3, :, :12], np.float32(0.5))
    fo, bo = _make_frame_f32(under, full, outwin)
    fb, _bb = _make_frame_f32(b, full, bwin)
    cref.video_mix_over_f32(ctypes.byref(fo), ctypes.byref(fb),
                            ctypes.c_float(0.3))
    ref = _frame_to_4hw(bo, full, np.float32)
    with backend.force_backend('numpy'):
        got = mix_ops.over(under, b, np.float32(0.3))
    # the reference's artifact: 'left' resolves to B, so the out-only
    # strip (x 0..11) reads B's padding -> zero alpha despite coverage
    assert not ref[3, :, :12].any()
    # our intent-preserving result: the accumulated frame is unchanged
    # where B has no coverage (alpha exact, rgb = (rgb*a)/a <= 1 ulp)
    np.testing.assert_array_equal(got[3, :, :12], under[3, :, :12])
    care = under[3, :, :12] != 0.0
    ub = under[:3, :, :12].view(np.uint32).astype(np.int64)[:, care]
    gb = got[:3, :, :12].view(np.uint32).astype(np.int64)[:, care]
    assert np.abs(ub - gb).max(initial=0) <= 1
    # overlap band (both frames defined): identical blend, BIT-EXACT
    np.testing.assert_array_equal(got[:, :, 12:20], ref[:, :, 12:20])
    # right strip (B only): the C's 'right' pick is correct here
    np.testing.assert_array_equal(got[3, :, 20:], ref[3, :, 20:])
    care = ref[3, :, 20:] != 0.0
    rb = ref[:3, :, 20:].view(np.uint32).astype(np.int64)[:, care]
    gb = got[:3, :, 20:].view(np.uint32).astype(np.int64)[:, care]
    assert np.abs(rb - gb).max(initial=0) <= 1


# --- color matrices -----------------------------------------------------------

def _ulp16_diff(a, b):
    ab = a.view(np.uint16).astype(np.int32)
    bb = b.view(np.uint16).astype(np.int32)
    # signed-magnitude -> monotonic int mapping
    am = np.where(ab & 0x8000, 0x8000 - (ab & 0x7fff), 0x8000 + (ab & 0x7fff))
    bm = np.where(bb & 0x8000, 0x8000 - (bb & 0x7fff), 0x8000 + (bb & 0x7fff))
    return np.abs(am - bm)


def test_color_rgb_to_xyz_sdtv(cref):
    """LAST-ULP vs video_color_rgb_to_xyz_sdtv (color.c:104-142): the
    transfer step is the same LUT bits; the matrix runs in f32 but the C
    truncates back to f16 where we round-to-nearest."""
    rng = np.random.default_rng(17)
    full = box2i(0, 0, 63, 15)
    data = (rng.random((4, 16, 64), np.float32) * 1.2).astype(np.float16)
    fr, bits = _make_frame_f16(data, full, full)
    cref.video_color_rgb_to_xyz_sdtv(ctypes.byref(fr))
    ref = _frame_to_4hw(bits.view(np.float16), full, np.float16)
    with backend.force_backend('numpy'):
        got = color_ops.rgb_to_xyz_sdtv_frame(data)
    assert _ulp16_diff(got, ref).max() <= 1


def test_color_xyz_to_srgb(cref):
    """LAST-ULP vs video_color_xyz_to_srgb (color.c:145-168): the C
    truncates the matrix result to f16 before the sRGB LUT; we round,
    so the LUT input — and hence output — can sit one entry over."""
    rng = np.random.default_rng(19)
    full = box2i(0, 0, 63, 15)
    data = (rng.random((4, 16, 64), np.float32) * 1.1).astype(np.float16)
    fr, bits = _make_frame_f16(data, full, full)
    cref.video_color_xyz_to_srgb(ctypes.byref(fr))
    ref = _frame_to_4hw(bits.view(np.float16), full, np.float16)
    with backend.force_backend('numpy'):
        got = color_ops.xyz_to_srgb_frame(data)
    d = _ulp16_diff(got, ref)
    assert d.max() <= 2
    assert (d > 1).mean() < 0.02


# --- DV reconstruction / subsampling -------------------------------------------

def _dv_planes(rng):
    y = rng.integers(16, 236, (480, 720), dtype=np.uint8)
    cb = rng.integers(16, 241, (480, 180), dtype=np.uint8)
    cr = rng.integers(16, 241, (480, 180), dtype=np.uint8)
    return y, cb, cr


def _coded_image_from_planes(y, cb, cr):
    img = CodedImage()
    keep = []
    for i, (plane, stride) in enumerate([(y, 720), (cb, 180), (cr, 180)]):
        c = np.ascontiguousarray(plane)
        keep.append(c)
        img.data[i] = c.ctypes.data
        img.stride[i] = stride
        img.line_count[i] = 480
    return img, keep


def test_reconstruct_dv(cref):
    """LAST-ULP vs video_reconstruct_dv (video_reconstruct.c:50-137):
    identical LUT bits, matrix constants, triangle taps, and truncating
    pre-LUT f16 conversion; the only slack left is einsum accumulation
    order vs the C's sequential tap adds (a last-f32-ulp effect that
    flips the f16 grid choice on isolated pixels)."""
    from canvas_tpu.ops import chroma as chroma_ops
    rng = np.random.default_rng(23)
    y, cb, cr = _dv_planes(rng)
    img, keep = _coded_image_from_planes(y, cb, cr)
    full = box2i(0, -1, 719, 478)
    out = np.zeros((4, 480, 720), np.float16)
    fr, bits = _make_frame_f16(out, full, full)
    cref.video_reconstruct_dv(ctypes.byref(fr), ctypes.byref(img))
    ref = _frame_to_4hw(bits.view(np.float16), full, np.float16)
    assert (fr.current_window.min.x, fr.current_window.min.y,
            fr.current_window.max.x, fr.current_window.max.y) == \
        (0, -1, 719, 478)
    with backend.force_backend('numpy'):
        got, cur = chroma_ops.reconstruct_dv((y, cb, cr), full)
    assert cur == box2i(0, -1, 719, 478)
    d = _ulp16_diff(got, ref)
    # measured: ~1e-5 of pixels differ at all; a LUT-boundary straddle in
    # a steep curve region can cost a few output ulps on one pixel
    assert d.max() <= 4
    assert (d > 0).mean() < 1e-4


def test_subsample_dv(cref):
    """Round-trip vs video_subsample_dv (video_subsample.c:99-187): both
    sides truncate to u8 after f32 math whose accumulation order differs
    (einsum vs sequential taps), so isolated boundary-straddling values
    may land one code apart."""
    from canvas_tpu.ops import chroma as chroma_ops
    rng = np.random.default_rng(29)
    full = box2i(0, -1, 719, 478)
    data = (rng.random((4, 480, 720), np.float32) * 1.1).astype(np.float16)
    data[3] = np.float16(1.0)
    fr, bits = _make_frame_f16(data, full, full)  # C mutates in place
    planar = cref.video_subsample_dv(ctypes.byref(fr))
    try:
        c = planar.contents
        ref_y = np.ctypeslib.as_array(
            ctypes.cast(c.data[0], ctypes.POINTER(ctypes.c_uint8)),
            shape=(480, 720)).copy()
        ref_cb = np.ctypeslib.as_array(
            ctypes.cast(c.data[1], ctypes.POINTER(ctypes.c_uint8)),
            shape=(480, 180)).copy()
        ref_cr = np.ctypeslib.as_array(
            ctypes.cast(c.data[2], ctypes.POINTER(ctypes.c_uint8)),
            shape=(480, 180)).copy()
    finally:
        pass  # leak the coded image; its free_func frees plane storage too
    with backend.force_backend('numpy'):
        got_y, got_cb, got_cr = chroma_ops.subsample_dv(data, full, full)
    for got, ref in [(got_y, ref_y), (got_cb, ref_cb), (got_cr, ref_cr)]:
        d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert d.max() <= 1
        assert (d > 0).mean() < 0.02


# --- audio ---------------------------------------------------------------------

def _make_audio_c(frame):
    c = AudioFrameC()
    data = np.ascontiguousarray(frame.data, np.float32)
    c.data = data.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    c.channels = frame.channels
    c.full_min_sample = frame.full_min_sample
    c.full_max_sample = frame.full_max_sample
    c.current_min_sample = frame.current_min_sample
    c.current_max_sample = frame.current_max_sample
    return c, data


def _rand_audio(rng, full_min, full_max, channels, cur=None):
    from canvas_tpu.audio import AudioFrame
    n = full_max - full_min + 1
    f = AudioFrame(full_min, full_max, channels,
                   rng.standard_normal((n, channels)).astype(np.float32))
    if cur is not None:
        f.current_min_sample, f.current_max_sample = cur
    return f


def _assert_audio_match(got_frame, c_frame, buf):
    """Window metadata must match exactly; sample data is compared over
    the RESULT window only (the C leaves bytes outside it untouched,
    we zero them — both are don't-care under the frame contract)."""
    assert (got_frame.current_min_sample, got_frame.current_max_sample) == \
        (c_frame.current_min_sample, c_frame.current_max_sample)
    lo = c_frame.current_min_sample
    hi = c_frame.current_max_sample
    if hi < lo:
        return
    rows = slice(lo - c_frame.full_min_sample,
                 hi - c_frame.full_min_sample + 1)
    np.testing.assert_array_equal(got_frame.data[rows], buf[rows])


@pytest.mark.parametrize('offset', [0, 13, -7])
def test_audio_copy_frame(cref, offset):
    """BIT-EXACT (over the result window) vs audio_copy_frame
    (audio_mix.c:24-51)."""
    from canvas_tpu import audio as audio_ops
    rng = np.random.default_rng(31)
    src = _rand_audio(rng, 0, 99, 2, cur=(10, 89))
    out_ref = _rand_audio(rng, -20, 129, 2)
    out_got = _rand_audio(rng, -20, 129, 2)
    out_got.data[:] = out_ref.data
    c_out, buf = _make_audio_c(out_ref)
    c_src, _sb = _make_audio_c(src)
    cref.audio_copy_frame(ctypes.byref(c_out), ctypes.byref(c_src), offset)
    audio_ops.copy_frame(out_got, src, offset)
    _assert_audio_match(out_got, c_out, buf)


@pytest.mark.parametrize('factor', [0.0, 0.5, 1.0, 1.7])
def test_audio_copy_frame_attenuate(cref, factor):
    """BIT-EXACT (over the result window) vs audio_copy_frame_attenuate
    (audio_mix.c:53-84), including the 0/1 factor fast paths."""
    from canvas_tpu import audio as audio_ops
    rng = np.random.default_rng(37)
    src = _rand_audio(rng, 5, 80, 3, cur=(5, 80))
    out_ref = _rand_audio(rng, 0, 99, 3)
    out_got = _rand_audio(rng, 0, 99, 3)
    out_got.data[:] = out_ref.data
    c_out, buf = _make_audio_c(out_ref)
    c_src, _sb = _make_audio_c(src)
    cref.audio_copy_frame_attenuate(ctypes.byref(c_out), ctypes.byref(c_src),
                                    ctypes.c_float(factor), 4)
    audio_ops.copy_frame_attenuate(out_got, src, np.float32(factor), 4)
    _assert_audio_match(out_got, c_out, buf)


def test_audio_attenuate(cref):
    """BIT-EXACT vs audio_attenuate."""
    from canvas_tpu import audio as audio_ops
    rng = np.random.default_rng(41)
    f_ref = _rand_audio(rng, 0, 63, 2, cur=(8, 55))
    f_got = _rand_audio(rng, 0, 63, 2, cur=(8, 55))
    f_got.data[:] = f_ref.data
    c_f, buf = _make_audio_c(f_ref)
    cref.audio_attenuate(ctypes.byref(c_f), ctypes.c_float(0.35))
    audio_ops.attenuate(f_got, np.float32(0.35))
    np.testing.assert_array_equal(f_got.data, buf)


@pytest.mark.parametrize('mix_a,offset', [(1.0, 0), (0.42, 9), (0.0, -5)])
def test_audio_mix_add(cref, mix_a, offset):
    """BIT-EXACT vs audio_mix_add: same single-multiply-add per sample."""
    from canvas_tpu import audio as audio_ops
    rng = np.random.default_rng(43)
    a = _rand_audio(rng, 0, 79, 2, cur=(0, 79))
    out_ref = _rand_audio(rng, -10, 109, 2, cur=(-10, 109))
    out_got = _rand_audio(rng, -10, 109, 2, cur=(-10, 109))
    out_got.data[:] = out_ref.data
    c_out, buf = _make_audio_c(out_ref)
    c_a, _ab = _make_audio_c(a)
    cref.audio_mix_add(ctypes.byref(c_out), ctypes.byref(c_a),
                       ctypes.c_float(mix_a), offset)
    audio_ops.mix_add(out_got, a, np.float32(mix_a), offset)
    np.testing.assert_array_equal(out_got.data, buf)
    assert (out_got.current_min_sample, out_got.current_max_sample) == \
        (c_out.current_min_sample, c_out.current_max_sample)


# --- frame/time conversion -----------------------------------------------------

def test_frame_time_conversion(cref):
    """BIT-EXACT vs get_frame_time/get_time_frame (main.c:22-31),
    including the +1 ns bias and negative frames."""
    from canvas_tpu import process
    from fractions import Fraction
    for (n, d) in [(30000, 1001), (25, 1), (24000, 1001), (60, 1)]:
        rate = Rational(n, d)
        fr = Fraction(n, d)
        for frame in [-100, -1, 0, 1, 29, 30, 1000, 123456]:
            t_ref = cref.get_frame_time(ctypes.byref(rate), frame)
            t_got = process.get_frame_time(fr, frame)
            assert t_got == t_ref, (n, d, frame)
            f_ref = cref.get_time_frame(ctypes.byref(rate), t_ref)
            f_got = process.get_time_frame(fr, t_got)
            assert f_got == f_ref, (n, d, frame)


# --- bilinear scaler ------------------------------------------------------------

@pytest.mark.parametrize('factors,t_point,s_point', [
    ((1.0, 1.0), (0.0, 0.0), (0.0, 0.0)),      # identity -> C copy path
    ((2.0, 2.0), (0.0, 0.0), (0.0, 0.0)),      # 2x up
    ((0.5, 0.5), (16.0, 8.0), (32.0, 16.0)),   # 2x down, offset anchors
    ((1.7, 0.3), (10.3, 4.7), (20.0, 9.5)),    # mixed up/down, fractional
    ((0.25, 3.0), (0.0, 0.0), (5.25, 2.5)),
])
def test_scale_bilinear(cref, factors, t_point, s_point):
    """NEAR-EXACT vs video_scale_bilinear_f32 (video_scale.c:231-286):
    identical triangle taps (bit-exact, see test_triangle_filter) but the
    C applies the axes in two sequential passes with per-row scatter adds
    while we contract both axes as one fused matrix pair — f32
    accumulation order differs, so values agree to ~1e-5.

    Window: the C routes two-axis scales through a temp frame whose
    extent formula (video_scale.c:252-261) anchors on *source_point*
    with target offsets scaled *by* (not divided by) the factor — when
    anchors differ under downscale this clips rows/columns that the
    taps legitimately touch. Our fused pass has no temp buffer, so the
    un-clipped window is produced; the parity contract is therefore
    ours ⊇ C's window, values equal on the C's window."""
    from canvas_tpu.ops import scale as scale_ops
    rng = np.random.default_rng(47)
    s_full = box2i(0, 0, 63, 47)
    t_full = box2i(0, 0, 95, 71)
    src = (rng.random((4, 48, 64), np.float32) * np.float32(1.5))
    fs, _bs = _make_frame_f32(src, s_full, s_full)
    out = np.zeros((4, 72, 96), np.float32)
    ft, bt = _make_frame_f32(out, t_full, t_full)
    tp = V2f(*[np.float32(v) for v in t_point])
    sp = V2f(*[np.float32(v) for v in s_point])
    fv = V2f(*[np.float32(v) for v in factors])
    cref.video_scale_bilinear_f32(ctypes.byref(ft), tp, ctypes.byref(fs),
                                  sp, fv)
    ref = _frame_to_4hw(bt, t_full, np.float32)
    ref_win = (ft.current_window.min.x, ft.current_window.min.y,
               ft.current_window.max.x, ft.current_window.max.y)
    with backend.force_backend('numpy'):
        got, win = scale_ops.scale_bilinear(
            src, s_full, s_full, t_full,
            (np.float32(t_point[0]), np.float32(t_point[1])),
            (np.float32(s_point[0]), np.float32(s_point[1])),
            (np.float32(factors[0]), np.float32(factors[1])))
    # ours must cover the C's window (see docstring: the C's temp-frame
    # extent can clip valid output under mismatched anchors + downscale)
    assert win.min.x <= ref_win[0] and win.min.y <= ref_win[1]
    assert win.max.x >= ref_win[2] and win.max.y >= ref_win[3]
    # values equal on the C's (possibly clipped) window
    sl = (slice(None), slice(ref_win[1], ref_win[3] + 1),
          slice(ref_win[0], ref_win[2] + 1))
    np.testing.assert_allclose(got[sl], ref[sl], rtol=0, atol=2e-5)
    # and equal-anchor / upscale cases must match the window exactly
    if t_point == s_point or (factors[0] >= 1.0 and factors[1] >= 1.0):
        assert (win.min.x, win.min.y, win.max.x, win.max.y) == ref_win


# --- pull protocol (video_get_frame_f16/f32 dispatch) ---------------------------

GETFRAME16 = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_int,
                              ctypes.POINTER(FrameF16))
GETFRAME32 = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_int,
                              ctypes.POINTER(FrameF32))


class SourceFuncs(ctypes.Structure):
    _fields_ = [('flags', ctypes.c_int),
                ('get_frame', GETFRAME16),
                ('get_frame_32', GETFRAME32),
                ('get_frame_gl', ctypes.c_void_p)]


class CSource(ctypes.Structure):
    _fields_ = [('obj', ctypes.c_void_p),
                ('funcs', ctypes.POINTER(SourceFuncs))]


def _fill_frame_f16(frame_ptr, data_4hw, cur):
    """Write *data_4hw* (sized to the frame's full_window) into a C f16
    frame through its data pointer and set current_window."""
    fr = frame_ptr.contents
    full = fr.full_window
    h = full.max.y - full.min.y + 1
    w = full.max.x - full.min.x + 1
    inter = np.ascontiguousarray(
        np.moveaxis(data_4hw.astype(np.float16), 0, -1)).reshape(-1)
    ctypes.memmove(fr.data, inter.view(np.uint16).ctypes.data,
                   h * w * 8)
    fr.current_window = _cbox(cur)


def _fill_frame_f32(frame_ptr, data_4hw, cur):
    fr = frame_ptr.contents
    full = fr.full_window
    h = full.max.y - full.min.y + 1
    w = full.max.x - full.min.x + 1
    inter = np.ascontiguousarray(
        np.moveaxis(data_4hw.astype(np.float32), 0, -1)).reshape(-1)
    ctypes.memmove(fr.data, inter.ctypes.data, h * w * 16)
    fr.current_window = _cbox(cur)


def test_pull_f16_source_as_f32(cref):
    """BIT-EXACT (over the result window) vs video_get_frame_f32's
    f16->f32 promotion branch (main.c:106-140): the C converts only the
    source's current window; the f16->f32 cast is exact in both
    implementations. Window metadata must match exactly."""
    from canvas_tpu.frames import VideoSource

    rng = np.random.default_rng(53)
    full = box2i(-2, 3, 29, 34)
    cur = box2i(0, 5, 20, 30)
    h, w = full.height, full.width
    payload = np.zeros((4, h, w), np.float16)
    payload[:, cur.min.y - full.min.y:cur.max.y - full.min.y + 1,
            cur.min.x - full.min.x:cur.max.x - full.min.x + 1] = \
        (rng.random((4, cur.height, cur.width), np.float32)
         .astype(np.float16))

    @GETFRAME16
    def get16(obj, frame_index, frame_ptr):
        _fill_frame_f16(frame_ptr, payload, cur)

    funcs = SourceFuncs(0, get16, GETFRAME32(), None)
    src = CSource(None, ctypes.pointer(funcs))
    out = np.full((4, h, w), np.float32(7.0))
    fo, bo = _make_frame_f32(out, full, full)
    cref.video_get_frame_f32(ctypes.byref(src), 0, ctypes.byref(fo))
    ref = _frame_to_4hw(bo, full, np.float32)
    assert (fo.current_window.min.x, fo.current_window.min.y,
            fo.current_window.max.x, fo.current_window.max.y) == \
        (cur.min.x, cur.min.y, cur.max.x, cur.max.y)

    class PySource(VideoSource):
        def _render_f16(self, frame_index, frame):
            frame.data = payload.copy()
            frame.current_window = cur

    got = PySource().get_frame_f32(0, full)
    assert got.current_window == cur
    sl = (slice(None), slice(cur.min.y - full.min.y,
                             cur.max.y - full.min.y + 1),
          slice(cur.min.x - full.min.x, cur.max.x - full.min.x + 1))
    np.testing.assert_array_equal(np.asarray(got.data)[sl], ref[sl])


def test_pull_f32_source_as_f16(cref):
    """LAST-ULP vs video_get_frame_f16's f32->f16 demotion branch
    (main.c:34-76): the C demotes with rgba_f32_to_f16 (truncating),
    our dispatch rounds to nearest — window semantics exact, data
    within one f16 ulp."""
    from canvas_tpu.frames import VideoSource

    rng = np.random.default_rng(59)
    full = box2i(0, 0, 31, 23)
    cur = box2i(4, 2, 27, 21)
    h, w = full.height, full.width
    payload = np.zeros((4, h, w), np.float32)
    payload[:, cur.min.y:cur.max.y + 1, cur.min.x:cur.max.x + 1] = \
        rng.random((4, cur.height, cur.width), np.float32) * np.float32(1.3)

    @GETFRAME32
    def get32(obj, frame_index, frame_ptr):
        _fill_frame_f32(frame_ptr, payload, cur)

    funcs = SourceFuncs(0, GETFRAME16(), get32, None)
    src = CSource(None, ctypes.pointer(funcs))
    out = np.zeros((4, h, w), np.float16)
    fo, bo = _make_frame_f16(out, full, full)
    cref.video_get_frame_f16(ctypes.byref(src), 0, ctypes.byref(fo))
    ref = _frame_to_4hw(bo.view(np.float16), full, np.float16)
    assert (fo.current_window.min.x, fo.current_window.min.y,
            fo.current_window.max.x, fo.current_window.max.y) == \
        (cur.min.x, cur.min.y, cur.max.x, cur.max.y)

    class PySource(VideoSource):
        def _render_f32(self, frame_index, frame):
            frame.data = payload.copy()
            frame.current_window = cur

    got = PySource().get_frame_f16(0, full)
    assert got.current_window == cur
    sl = (slice(None), slice(cur.min.y, cur.max.y + 1),
          slice(cur.min.x, cur.max.x + 1))
    assert _ulp16_diff(np.asarray(got.data)[sl], ref[sl]).max() <= 1


def test_pull_null_source(cref):
    """BIT-EXACT: a source with no funcs yields an empty window in both
    (main.c:35-38 / frames.VideoSource default dispatch)."""
    from canvas_tpu.frames import VideoSource
    full = box2i(0, 0, 7, 7)
    src = CSource(None, None)
    out = np.zeros((4, 8, 8), np.float16)
    fo, _bo = _make_frame_f16(out, full, full)
    cref.video_get_frame_f16(ctypes.byref(src), 0, ctypes.byref(fo))
    assert fo.current_window.min.x > fo.current_window.max.x
    got = VideoSource().get_frame_f16(0, full)
    assert got.current_window.empty()


# --- compositing workspace (workspace.c) -----------------------------------------

AUDIOGETFRAME = ctypes.CFUNCTYPE(None, ctypes.c_void_p,
                                 ctypes.POINTER(AudioFrameC))


class AudioSourceFuncs(ctypes.Structure):
    _fields_ = [('flags', ctypes.c_int), ('getFrame', AUDIOGETFRAME)]


class CAudioSource(ctypes.Structure):
    _fields_ = [('obj', ctypes.c_void_p),
                ('funcs', ctypes.POINTER(AudioSourceFuncs))]


def _setup_workspace_api(cref):
    cref.workspace_create.restype = ctypes.c_void_p
    cref.workspace_add_item.restype = ctypes.c_void_p
    cref.workspace_add_item.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    cref.workspace_as_video_source.argtypes = [ctypes.c_void_p,
                                               ctypes.POINTER(CSource)]
    cref.workspace_as_audio_source.argtypes = [ctypes.c_void_p,
                                               ctypes.POINTER(CAudioSource)]
    cref.workspace_update_item.argtypes = [ctypes.c_void_p] + \
        [ctypes.c_void_p] * 6
    cref.workspace_remove_item.argtypes = [ctypes.c_void_p]
    cref.workspace_free.argtypes = [ctypes.c_void_p]
    cref.video_get_frame_f32.argtypes = [
        ctypes.POINTER(CSource), ctypes.c_int, ctypes.POINTER(FrameF32)]
    cref.audio_get_frame.argtypes = [
        ctypes.POINTER(CAudioSource), ctypes.POINTER(AudioFrameC)]


def _ulp32_diff(a, b):
    ab = a.view(np.uint32).astype(np.int64)
    bb = b.view(np.uint32).astype(np.int64)
    am = np.where(ab & 0x80000000, 0x80000000 - (ab & 0x7fffffff),
                  0x80000000 + (ab & 0x7fffffff))
    bm = np.where(bb & 0x80000000, 0x80000000 - (bb & 0x7fffffff),
                  0x80000000 + (bb & 0x7fffffff))
    return np.abs(am - bm)


class _VideoLayerSpec:
    """A synthetic layer: solid color (varying per pulled frame index)
    over a fixed current window; identical fill for the C callback and
    the Python source."""

    def __init__(self, window, color):
        self.window = window
        self.color = np.asarray(color, np.float32)

    def data_for(self, frame_index, full):
        h, w = full.height, full.width
        data = np.zeros((4, h, w), np.float32)
        c = self.color + np.float32(0.01) * np.float32(frame_index)
        cur = self.window
        from canvas_tpu.basetypes import box2i_intersect
        cur = box2i_intersect(cur, full)
        if not cur.empty():
            data[:, cur.min.y - full.min.y:cur.max.y - full.min.y + 1,
                 cur.min.x - full.min.x:cur.max.x - full.min.x + 1] = \
                c[:, None, None]
        return data, cur


def _make_c_video_layer(spec):
    from canvas_tpu.basetypes import box2i as _box

    @GETFRAME32
    def get32(obj, frame_index, frame_ptr):
        full = frame_ptr.contents.full_window
        fw = _box(full.min.x, full.min.y, full.max.x, full.max.y)
        data, cur = spec.data_for(frame_index, fw)
        if cur.empty():
            frame_ptr.contents.current_window.min.x = 0
            frame_ptr.contents.current_window.min.y = 0
            frame_ptr.contents.current_window.max.x = -1
            frame_ptr.contents.current_window.max.y = -1
            return
        _fill_frame_f32(frame_ptr, data, cur)

    funcs = SourceFuncs(0, GETFRAME16(), get32, None)
    src = CSource(None, ctypes.pointer(funcs))
    return src, (get32, funcs)


def _make_py_video_layer(spec):
    from canvas_tpu.frames import VideoSource

    class Layer(VideoSource):
        def _render_f32(self, frame_index, frame):
            data, cur = spec.data_for(frame_index, frame.full_window)
            frame.data = data
            frame.current_window = cur

    return Layer()


def test_workspace_video_composite(cref):
    """Differential vs workspace_get_frame_f32 (workspace.c:494-550):
    same items (x/length/offset/z), same per-frame layer content pulled
    through callback sources in the C and VideoSource subclasses here.
    Checks the composite ORDER (ascending z, later-added-below at equal
    z), the x/offset frame mapping, window unions, and blend values
    (alpha exact; rgb within 1 f32 ulp — the C copies single-layer
    border rows verbatim where our branch-free blend computes
    (rgb*a)/a)."""
    from canvas_tpu import process

    _setup_workspace_api(cref)
    full = box2i(0, 0, 63, 47)
    specs = [
        _VideoLayerSpec(box2i(0, 0, 63, 47), (0.2, 0.1, 0.3, 1.0)),
        _VideoLayerSpec(box2i(10, 5, 40, 30), (0.9, 0.2, 0.1, 0.5)),
        _VideoLayerSpec(box2i(30, 20, 80, 60), (0.1, 0.8, 0.4, 0.25)),
    ]
    # (x, length, offset, z) — staggered so different frames see
    # different subsets and source-frame mappings
    placements = [(0, 20, 0, 0), (2, 10, 3, 1), (5, 12, -2, 2)]

    ws_c = cref.workspace_create()
    keep = []
    for spec, (x, length, offset, z) in zip(specs, placements):
        src, refs = _make_c_video_layer(spec)
        keep.append((src, refs))
        cref.workspace_add_item(ws_c, ctypes.byref(src), x, length,
                                offset, z, None)
    c_src = CSource()
    cref.workspace_as_video_source(ws_c, ctypes.byref(c_src))

    ws_py = process.VideoWorkspace()
    for spec, (x, length, offset, z) in zip(specs, placements):
        ws_py.add(source=_make_py_video_layer(spec), x=x, length=length,
                  offset=offset, z=z)

    for frame_index in [0, 1, 3, 6, 11, 15, 19, 25]:
        out = np.zeros((4, 48, 64), np.float32)
        fo, bo = _make_frame_f32(out, full, full)
        cref.video_get_frame_f32(ctypes.byref(c_src), frame_index,
                                 ctypes.byref(fo))
        got = ws_py.get_frame_f32(frame_index, full)
        cw = fo.current_window
        if cw.min.x > cw.max.x or cw.min.y > cw.max.y:
            assert got.current_window.empty(), frame_index
            continue
        assert (got.current_window.min.x, got.current_window.min.y,
                got.current_window.max.x, got.current_window.max.y) == \
            (cw.min.x, cw.min.y, cw.max.x, cw.max.y), frame_index
        ref = _frame_to_4hw(bo, full, np.float32)
        gd = np.asarray(got.data)
        sl = (slice(None), slice(cw.min.y, cw.max.y + 1),
              slice(cw.min.x, cw.max.x + 1))
        np.testing.assert_array_equal(gd[3][sl[1:]], ref[3][sl[1:]],
                                      err_msg='frame %d' % frame_index)
        care = ref[3][sl[1:]] != 0.0
        d = _ulp32_diff(gd[sl][:, care], ref[sl][:, care])
        assert d.max() <= 1, frame_index
    cref.workspace_free(ws_c)


def test_workspace_video_item_update_remove(cref):
    """Differential item manipulation: workspace_update_item (move x,
    change z and offset) and workspace_remove_item against our
    WorkspaceItem.update()/remove, re-pulling after each step."""
    from canvas_tpu import process

    _setup_workspace_api(cref)
    full = box2i(0, 0, 31, 23)
    specs = [
        _VideoLayerSpec(box2i(0, 0, 31, 23), (0.3, 0.3, 0.3, 1.0)),
        _VideoLayerSpec(box2i(8, 4, 24, 18), (0.8, 0.1, 0.2, 1.0)),
    ]
    ws_c = cref.workspace_create()
    keep = []
    items_c = []
    for spec, (x, length, offset, z) in zip(specs,
                                            [(0, 10, 0, 0), (0, 10, 0, 1)]):
        src, refs = _make_c_video_layer(spec)
        keep.append((src, refs))
        items_c.append(cref.workspace_add_item(
            ws_c, ctypes.byref(src), x, length, offset, z, None))
    c_src = CSource()
    cref.workspace_as_video_source(ws_c, ctypes.byref(c_src))

    ws_py = process.VideoWorkspace()
    items_py = []
    for spec, (x, length, offset, z) in zip(specs,
                                            [(0, 10, 0, 0), (0, 10, 0, 1)]):
        items_py.append(ws_py.add(source=_make_py_video_layer(spec), x=x,
                                  length=length, offset=offset, z=z))

    def compare(frame_index):
        out = np.zeros((4, 24, 32), np.float32)
        fo, bo = _make_frame_f32(out, full, full)
        cref.video_get_frame_f32(ctypes.byref(c_src), frame_index,
                                 ctypes.byref(fo))
        got = ws_py.get_frame_f32(frame_index, full)
        cw = fo.current_window
        if cw.min.x > cw.max.x or cw.min.y > cw.max.y:
            assert got.current_window.empty()
            return
        assert (got.current_window.min.x, got.current_window.min.y,
                got.current_window.max.x, got.current_window.max.y) == \
            (cw.min.x, cw.min.y, cw.max.x, cw.max.y)
        ref = _frame_to_4hw(bo, full, np.float32)
        gd = np.asarray(got.data)
        care = ref[3] != 0.0
        assert _ulp32_diff(gd[:, care], ref[:, care]).max() <= 1

    compare(0)
    compare(5)

    # move item 1 in x (and stretch), via update
    x = ctypes.c_int64(4)
    ln = ctypes.c_int64(14)
    cref.workspace_update_item(items_c[1], ctypes.byref(x),
                               ctypes.byref(ln), None, None, None, None)
    items_py[1].update(x=4, length=14)
    for f in [0, 3, 4, 9, 17]:
        compare(f)

    # flip z below the background
    z = ctypes.c_int64(-1)
    cref.workspace_update_item(items_c[1], None, None, ctypes.byref(z),
                               None, None, None)
    items_py[1].update(z=-1)
    compare(5)

    # change offset (source frame mapping)
    off = ctypes.c_int64(7)
    cref.workspace_update_item(items_c[1], None, None, None,
                               ctypes.byref(off), None, None)
    items_py[1].update(offset=7)
    compare(6)

    # remove the background
    cref.workspace_remove_item(items_c[0])
    ws_py.remove(items_py[0])
    compare(5)
    cref.workspace_free(ws_c)


def _make_c_audio_layer(base):
    @AUDIOGETFRAME
    def getframe(obj, frame_ptr):
        fr = frame_ptr.contents
        n = fr.full_max_sample - fr.full_min_sample + 1
        ch = fr.channels
        buf = np.empty((n, ch), np.float32)
        idx = np.arange(fr.full_min_sample, fr.full_max_sample + 1,
                        dtype=np.float32)[:, None]
        buf[:] = np.float32(base) + idx * np.float32(0.001) + \
            np.arange(ch, dtype=np.float32)[None, :] * np.float32(0.1)
        ctypes.memmove(fr.data, buf.ctypes.data, buf.nbytes)
        fr.current_min_sample = fr.full_min_sample
        fr.current_max_sample = fr.full_max_sample

    funcs = AudioSourceFuncs(0, getframe)
    src = CAudioSource(None, ctypes.pointer(funcs))
    return src, (getframe, funcs)


def _make_py_audio_layer(base):
    from canvas_tpu.audio import AudioSource

    class Layer(AudioSource):
        def _render(self, frame):
            n = frame.full_max_sample - frame.full_min_sample + 1
            idx = np.arange(frame.full_min_sample,
                            frame.full_max_sample + 1,
                            dtype=np.float32)[:, None]
            frame.data[:] = np.float32(base) + idx * np.float32(0.001) + \
                np.arange(frame.channels,
                          dtype=np.float32)[None, :] * np.float32(0.1)
            frame.current_min_sample = frame.full_min_sample
            frame.current_max_sample = frame.full_max_sample

    return Layer()


def test_workspace_audio_composite(cref):
    """Differential vs workspace_audio_get_frame (workspace.c:615-676)
    with zero item offsets: overlapping items sum additively through
    ghost windows; window metadata must match exactly and samples to
    1 f32 ulp (the C iterates its composite list top-down, we
    bottom-up — addition order differs where 3+ items overlap).

    Nonzero offsets are intentionally NOT compared: the reference's
    audio path rebases by -(x + offset) (workspace.c:655) while its own
    video path uses frame - x + offset (workspace.c:530); we follow the
    video convention for both (see audio.AudioWorkspace._render)."""
    from canvas_tpu.audio import AudioWorkspace

    _setup_workspace_api(cref)
    ws_c = cref.workspace_create()
    keep = []
    for base, (x, length, z) in zip(
            [0.5, -0.25, 0.125],
            [(0, 100, 0), (40, 100, 1), (70, 50, 2)]):
        src, refs = _make_c_audio_layer(base)
        keep.append((src, refs))
        cref.workspace_add_item(ws_c, ctypes.byref(src), x, length, 0, z,
                                None)
    c_src = CAudioSource()
    cref.workspace_as_audio_source(ws_c, ctypes.byref(c_src))

    ws_py = AudioWorkspace()
    for base, (x, length, z) in zip(
            [0.5, -0.25, 0.125],
            [(0, 100, 0), (40, 100, 1), (70, 50, 2)]):
        ws_py.add(source=_make_py_audio_layer(base), x=x, length=length,
                  offset=0, z=z)

    for (lo, hi) in [(0, 159), (-20, 10), (45, 75), (90, 139),
                     (150, 220), (-50, -30)]:
        n = hi - lo + 1
        buf = np.full((n, 2), np.float32(9.0))
        c_fr = AudioFrameC(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 2,
            lo, hi, 0, -1)
        cref.audio_get_frame(ctypes.byref(c_src), ctypes.byref(c_fr))
        got = ws_py.get_frame(lo, hi, 2)
        if c_fr.current_max_sample < c_fr.current_min_sample:
            assert got.empty, (lo, hi)
            continue
        assert (got.current_min_sample, got.current_max_sample) == \
            (c_fr.current_min_sample, c_fr.current_max_sample), (lo, hi)
        rows = slice(c_fr.current_min_sample - lo,
                     c_fr.current_max_sample - lo + 1)
        d = _ulp32_diff(np.asarray(got.data)[rows], buf[rows])
        assert d.max() <= 1, (lo, hi)
    cref.workspace_free(ws_c)


@pytest.mark.parametrize('offset,out_cur', [
    (0, (20, 40)),        # overlap
    (5, (0, 9)),          # gap above out's window -> silence fill
    (-30, (90, 109)),     # gap below -> silence fill downward
    (0, None),            # empty out window
])
def test_audio_overwrite_frame(cref, offset, out_cur):
    """BIT-EXACT vs audio_overwrite_frame (audio_mix.c:86-146),
    including the silence laid between a disjoint existing window and
    the incoming one."""
    from canvas_tpu import audio as audio_ops
    rng = np.random.default_rng(61)
    src = _rand_audio(rng, 30, 69, 2, cur=(30, 69))
    out_ref = _rand_audio(rng, 0, 119, 2)
    if out_cur is not None:
        out_ref.current_min_sample, out_ref.current_max_sample = out_cur
    out_got = _rand_audio(rng, 0, 119, 2)
    out_got.data[:] = out_ref.data
    out_got.current_min_sample = out_ref.current_min_sample
    out_got.current_max_sample = out_ref.current_max_sample
    c_out, buf = _make_audio_c(out_ref)
    c_src, _sb = _make_audio_c(src)
    cref.audio_overwrite_frame(ctypes.byref(c_out), ctypes.byref(c_src),
                               offset)
    audio_ops.overwrite_frame(out_got, src, offset)
    _assert_audio_match(out_got, c_out, buf)


def test_audio_mix_add_pull(cref):
    """BIT-EXACT vs audio_mix_add_pull (audio_mix.c:242-284) through a
    callback source, both the empty-out shortcut (in-place pull +
    attenuate) and the temp-frame mix path."""
    from canvas_tpu import audio as audio_ops

    src_c, keep = _make_c_audio_layer(0.25)
    src_py = _make_py_audio_layer(0.25)
    cref.audio_mix_add_pull.argtypes = [
        ctypes.POINTER(AudioFrameC), ctypes.POINTER(CAudioSource),
        ctypes.c_float, ctypes.c_int]

    rng = np.random.default_rng(67)
    # arm 1: empty out window -> shortcut path
    out_ref = _rand_audio(rng, 0, 59, 2)
    out_got = _rand_audio(rng, 0, 59, 2)
    out_got.data[:] = out_ref.data
    c_out, buf = _make_audio_c(out_ref)
    cref.audio_mix_add_pull(ctypes.byref(c_out), ctypes.byref(src_c),
                            ctypes.c_float(0.6), 11)
    audio_ops.mix_add_pull(out_got, src_py, np.float32(0.6), 11)
    _assert_audio_match(out_got, c_out, buf)

    # arm 2: existing window -> temp-frame mix
    out_ref = _rand_audio(rng, 0, 59, 2, cur=(10, 39))
    out_got = _rand_audio(rng, 0, 59, 2, cur=(10, 39))
    out_got.data[:] = out_ref.data
    c_out, buf = _make_audio_c(out_ref)
    cref.audio_mix_add_pull(ctypes.byref(c_out), ctypes.byref(src_c),
                            ctypes.c_float(0.6), -7)
    audio_ops.mix_add_pull(out_got, src_py, np.float32(0.6), -7)
    _assert_audio_match(out_got, c_out, buf)
