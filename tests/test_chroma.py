"""Chroma reconstruction/subsample + pulldown vs reference semantics
(/root/reference/src/cprocess/video_reconstruct.c, video_subsample.c,
src/process/Pulldown23RemovalFilter.c)."""

import numpy as np
import pytest

from canvas_tpu import backend
from canvas_tpu.basetypes import box2i
from canvas_tpu.coded import (CodedImage, CodedImageSource,
                              DVReconstructionFilter, DVSubsampleFilter,
                              MPEG2SubsampleFilter, Pulldown23RemovalFilter)
from canvas_tpu.ops import chroma, color
from canvas_tpu.sources import SolidColorVideoSource

DV_WINDOW = box2i(0, -1, 719, 478)


def make_dv_image(y=128, cb=128, cr=128):
    return CodedImage([
        np.full((480, 720), y, np.uint8),
        np.full((480, 180), cb, np.uint8),
        np.full((480, 180), cr, np.uint8)])


class StaticImageSource(CodedImageSource):
    def __init__(self, image):
        self.image = image

    def get_frame(self, frame_index, quality=0):
        return self.image


def test_reconstruct_gray():
    """Neutral chroma (128) + mid luma: r == g == b, alpha 1."""
    data, window = chroma.reconstruct_dv(
        make_dv_image(y=126), DV_WINDOW, use_jax=False)
    assert window == DV_WINDOW
    # y = (126-16)/219 = 0.5022..., chroma 0 -> rgb all equal
    mid = data[:, 240, 360]
    assert abs(float(mid[0]) - float(mid[1])) < 1e-3
    assert abs(float(mid[1]) - float(mid[2])) < 1e-3
    assert float(mid[3]) == 1.0
    want = color.rec709_to_linear_scene(np.float32((126 - 16) / 219.0))
    assert abs(float(mid[0]) - float(want)) < 2e-3


def test_reconstruct_scalar_reference():
    """Spot-check one pixel against the C row loop done by hand."""
    rng = np.random.RandomState(0)
    y = rng.randint(16, 236, (480, 720)).astype(np.uint8)
    cb = rng.randint(16, 241, (480, 180)).astype(np.uint8)
    cr = rng.randint(16, 241, (480, 180)).astype(np.uint8)
    data, window = chroma.reconstruct_dv((y, cb, cr), DV_WINDOW,
                                         use_jax=False)

    # reference math at an interior pixel (x=100, image row=50):
    x_abs, y_abs = 100, 49  # image row = y_abs + 1
    row = y_abs + 1
    yv = (float(y[row, x_abs]) - 16.0) / 219.0
    # chroma: scatter from samples x s.t. |x_abs - 4s| < 4
    cbv = crv = 0.0
    for s in range(180):
        d = x_abs - 4 * s
        if abs(d) < 4:
            w = 1.0 - abs(d) / 4.0
            cbv += (float(cb[row, s]) - 128.0) / 224.0 * w
            crv += (float(cr[row, s]) - 128.0) / 224.0 * w
    M = chroma.YCBCR_TO_RGB_REC709
    rgb = M @ np.array([yv, cbv, crv])
    want = color.rec709_to_linear_scene(
        np.asarray(rgb, np.float32).astype(np.float16).astype(np.float32))
    got = data[:3, y_abs - DV_WINDOW.min.y, x_abs].astype(np.float32)
    np.testing.assert_allclose(got, want, atol=3e-3)


def test_reconstruct_jax_matches_numpy():
    rng = np.random.RandomState(1)
    planes = (rng.randint(0, 256, (480, 720)).astype(np.uint8),
              rng.randint(0, 256, (480, 180)).astype(np.uint8),
              rng.randint(0, 256, (480, 180)).astype(np.uint8))
    want, wwin = chroma.reconstruct_dv(planes, DV_WINDOW, use_jax=False)
    got, gwin = chroma.reconstruct_dv(planes, DV_WINDOW, use_jax=True)
    assert wwin == gwin
    got = backend.asnumpy(got)
    # f32 einsum then f16 round then identical LUT: tiny f32 differences
    # can flip one f16 ulp
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), rtol=1e-2, atol=1e-2)
    exact = np.mean(got.view(np.uint16) == want.view(np.uint16))
    assert exact > 0.99


def test_dv_round_trip():
    """subsample(reconstruct(x)) ~= x for smooth in-range data."""
    y = np.full((480, 720), 100, np.uint8)
    cb = np.full((480, 180), 140, np.uint8)
    cr = np.full((480, 180), 110, np.uint8)
    data, window = chroma.reconstruct_dv((y, cb, cr), DV_WINDOW,
                                         use_jax=False)
    y2, cb2, cr2 = chroma.subsample_dv(data, DV_WINDOW, window)
    # interior values round-trip within a couple of code values
    assert abs(int(y2[240, 360]) - 100) <= 2
    assert abs(int(cb2[240, 90]) - 140) <= 2
    assert abs(int(cr2[240, 90]) - 110) <= 2
    # untouched row 0 of the coded image (window starts at image row 0
    # for y=-1... row index = y+1, so row 0 IS covered); check columns
    # outside nothing — whole window covered. Instead check dtype/shape.
    assert y2.shape == (480, 720) and cb2.shape == (480, 180)


def test_subsample_window_clipping():
    """Pixels outside the frame's current_window produce zero bytes
    (the reference's alloc0 + windowed writes)."""
    full = DV_WINDOW
    data = np.zeros((4, 480, 720), np.float16)
    data[:, :, :] = 0.5
    window = box2i(100, 50, 299, 149)
    y, cb, cr = chroma.subsample_dv(data, full, window)
    # inside
    assert y[51 + 1 - 1, 150] > 0     # image row = y_abs+1 = 52+... row 51+1?
    assert y[100, 200] > 0            # row 100 = y_abs 99 in [50,149]
    # outside rows are zero
    assert y[0, :].max() == 0
    assert y[200, :].max() == 0
    assert cb[0, :].max() == 0
    # outside columns zero
    assert y[100, 0] == 0 and y[100, 719] == 0


def test_mpeg2_subsample_shapes_and_gray():
    data = np.zeros((4, 480, 720), np.float16)
    data[:3] = 0.5
    data[3] = 1.0
    y, cb, cr = chroma.subsample_mpeg2(data, box2i(0, 0, 719, 479))
    assert y.shape == (480, 720)
    assert cb.shape == (240, 360) and cr.shape == (240, 360)
    # gray: neutral chroma
    assert abs(int(cb[120, 180]) - 128) <= 1
    assert abs(int(cr[120, 180]) - 128) <= 1
    # luma: linear 0.5 -> rec709 ~0.7055 -> *219+16 ~ 170.5
    want = color.linear_to_rec709(np.float32(0.5)) * 219.0 + 16.0
    assert abs(int(y[240, 360]) - round(float(want))) <= 1


def test_dv_filters_end_to_end(any_backend):
    """SolidColor -> DVSubsampleFilter -> DVReconstructionFilter."""
    solid = SolidColorVideoSource((0.25, 0.25, 0.25, 1.0))
    sub = DVSubsampleFilter(solid)
    image = sub.get_frame(0)
    assert image is not None and len(image) == 3
    recon = DVReconstructionFilter(StaticImageSource(image))
    frame = recon.get_frame_f16(0, DV_WINDOW)
    assert frame.current_window == DV_WINDOW
    px = frame.pixel(360, 240)
    assert abs(px.r - 0.25) < 0.01
    assert px.a == 1.0


def test_mpeg2_filter():
    solid = SolidColorVideoSource((0.1, 0.2, 0.3, 1.0))
    filt = MPEG2SubsampleFilter(solid)
    image = filt.get_frame(0)
    assert image[0].shape == (480, 720)
    assert image[1].shape == (240, 360)


class FrameIndexSource(CodedImageSource):
    """Luma encodes the frame index so tests can see which frame was
    pulled."""

    def get_frame(self, frame_index, quality=0):
        return make_dv_image(y=16 + frame_index)


class TaggedVideoSource(SolidColorVideoSource):
    """Video source whose red channel = frame_index / 100, with even rows
    darker so field interleave is observable."""

    def __init__(self):
        super().__init__((0, 0, 0, 1))
        self.calls = []

    def _render_f16(self, frame_index, frame):
        self.calls.append(frame_index)
        import numpy as np
        full = frame.full_window
        data = np.zeros((4, full.height, full.width), np.float16)
        data[0] = frame_index / 100.0
        data[3] = 1.0
        frame.data = data
        frame.current_window = full


# Ground truth straight from the reference's cadence table
# (Pulldown23RemovalFilter.c:55-66), NOT re-derived from the code:
# per offset, the first group's four outputs as solid source index or
# a (mixed_a, mixed_b) pair; later groups shift by +5 per 4 outputs.
# For offset 4 the table's '(0->0, 1->1, 2->2), (3->3b4a)' corrects
# the reference C's own off-by-a-group bug (documented divergence).
CADENCE_GROUPS = {
    0: [0, 1, (2, 3), 4],
    1: [0, (1, 2), 3, 4],
    2: [(0, 1), 2, 3, 4],
    3: [1, 2, 3, (4, 5)],
    4: [0, 1, 2, (3, 4)],
}


@pytest.mark.parametrize('offset', [0, 1, 2, 3, 4])
def test_pulldown_frame_mapping(offset):
    """Solid frames map per the cadence table
    (Pulldown23RemovalFilter.c:55-66)."""
    src = TaggedVideoSource()
    filt = Pulldown23RemovalFilter(src, offset)
    window = box2i(0, 0, 3, 3)

    for out_frame in range(8):
        src.calls = []
        frame = filt.get_frame_f16(out_frame, window)
        want = CADENCE_GROUPS[offset][out_frame % 4]
        group_shift = (out_frame // 4) * 5
        if isinstance(want, tuple):
            a, b = (w + group_shift for w in want)
            assert src.calls == [a, b]
            # mixed frame: even rows from b, odd rows from a
            even = frame.pixel(0, 0).r
            odd = frame.pixel(0, 1).r
            assert abs(even - b / 100.0) < 1e-3
            assert abs(odd - a / 100.0) < 1e-3
        else:
            assert src.calls == [want + group_shift]


def test_pulldown_get_new_length():
    # 0 AA BB BC CD DD: 10 source frames -> 8; offsets shift the loss
    filt = Pulldown23RemovalFilter(TaggedVideoSource(), 0)
    assert filt.get_new_length(10) == 8
    assert filt.get_new_length(5) == 4
    assert filt.get_new_length(3) == 2   # partial 3 > 2 -> loses one
    assert filt.get_new_length(2) == 2   # partial 2 not > 2
    filt2 = Pulldown23RemovalFilter(TaggedVideoSource(), 2)
    assert filt2.get_new_length(1) == 0  # partial 1 > 0 -> loses one


@pytest.mark.parametrize('offset', [0, 1, 2, 3, 4])
@pytest.mark.parametrize('old_length', list(range(0, 12)))
def test_pulldown_new_length_never_pulls_past_source(offset, old_length):
    """get_new_length is EXACT: every output below it pulls only
    existing source frames, and the next output would pull past the
    end. (The reference's offset-3 branch is unreachable — partial
    can't exceed 4 — so it over-reported by one and its last output
    read past the source; documented divergence.)"""
    filt = Pulldown23RemovalFilter(TaggedVideoSource(), offset)
    n = filt.get_new_length(old_length)
    assert n >= 0

    def max_pull(f):
        a, b = filt._map(f)
        return a if b is None else b

    for f in range(n):
        assert max_pull(f) <= old_length - 1, (offset, old_length, f)
    if old_length:  # the count is tight, not merely safe
        assert max_pull(n) > old_length - 1, (offset, old_length, n)


def test_mpeg2_subsample_jax_matches_numpy():
    rng = np.random.RandomState(5)
    data = (rng.rand(4, 96, 128) * 0.9).astype(np.float16)
    with backend.force_backend('numpy'):
        y_np, cb_np, cr_np = chroma.subsample_mpeg2(data, box2i(0, 0, 127, 95))
    with backend.force_backend('jax'):
        y_j, cb_j, cr_j = chroma.subsample_mpeg2(data, box2i(0, 0, 127, 95))
    # round-to-nearest at the u8 boundary can differ by 1 code value
    for a, b in ((y_np, y_j), (cb_np, cb_j), (cr_np, cr_j)):
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.02


def test_pulldown_mixed_frame_window_clip():
    """Batched pulldown must clip frame b's pixels to frame a's window in
    BOTH axes (round-1 advisor finding: only rows were masked, so b's
    pixels leaked outside the declared window horizontally), matching the
    eager path which renders b into a temp clipped to a's
    current_window."""
    from canvas_tpu import render
    from canvas_tpu.framefuncs import LerpFunc
    from canvas_tpu.sources import SolidColorVideoSource

    # Window widens with frame index: at the mixed pair (a=2, b=3), b's
    # window extends horizontally beyond a's.
    src = SolidColorVideoSource(
        LerpFunc((1.0, 0.2, 0.1, 1.0), (0.1, 0.2, 1.0, 1.0), 4),
        window=LerpFunc((10, 4, 20, 27), (0, 0, 30, 31), 4))
    filt = Pulldown23RemovalFilter(src, 0)
    window = box2i(0, 0, 31, 31)

    want = []
    for i in range(4):
        frame = filt.get_frame_f16(i, window)
        want.append(np.asarray(frame.data, np.float16))
    want = np.stack(want)
    got = render.render_frames(filt, window, 0, 4)
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=2e-3)


def test_scaled_dv_layer_in_workspace_matches_pull():
    """config7 shape: a VideoScaler over a DV reconstruct staged layer
    composited with solids in a workspace — batched planner must match
    the eager pull path."""
    from canvas_tpu import render
    from canvas_tpu.coded import CodedImage, CodedImageSource
    from canvas_tpu.framefuncs import LerpFunc
    from canvas_tpu.sources import SolidColorVideoSource, VideoScaler, VideoWorkspace

    class Source(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            rng = np.random.RandomState(frame_index)
            return CodedImage([
                rng.randint(16, 236, (480, 720)).astype(np.uint8),
                rng.randint(16, 241, (480, 180)).astype(np.uint8),
                rng.randint(16, 241, (480, 180)).astype(np.uint8)])

    clip = VideoScaler(
        DVReconstructionFilter(Source()),
        target_point=LerpFunc((0, 0), (8, 6), 4),
        source_point=(0.0, -1.0),
        scale_factors=(0.25, 0.25),
        source_rect=box2i(0, -1, 719, 478))
    ws = VideoWorkspace()
    ws.add(source=SolidColorVideoSource((0.2, 0.3, 0.4, 1.0)),
           x=0, length=4, z=0)
    ws.add(source=clip, x=0, length=4, z=1)
    window = box2i(0, 0, 199, 149)

    want = []
    for i in range(2):
        frame = ws.get_frame_f16(i, window)
        want.append(np.asarray(frame.data, np.float16))
    want = np.stack(want)
    got = render.render_frames(ws, window, 0, 2)
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=2e-2)
    # most pixels bit-exact or within a couple f16 ulps
    close = np.mean(np.abs(got.astype(np.float32) - want.astype(np.float32)) < 2e-3)
    assert close > 0.98, close


def test_pulldown_hint_through_passthrough_dedups_staging():
    """Pulldown over a retiming pass-through over DV recon: the frame
    union hint forwards through the retime, so both children share ONE
    device plane stack (each coded frame staged once)."""
    from canvas_tpu import render
    from canvas_tpu.coded import CodedImage, CodedImageSource
    from canvas_tpu.sources import VideoPassThroughFilter

    pulls = []

    class Source(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            pulls.append(frame_index)
            rng = np.random.RandomState(frame_index)
            return CodedImage([
                rng.randint(16, 236, (480, 720)).astype(np.uint8),
                rng.randint(16, 241, (480, 180)).astype(np.uint8),
                rng.randint(16, 241, (480, 180)).astype(np.uint8)])

    src = Pulldown23RemovalFilter(
        VideoPassThroughFilter(DVReconstructionFilter(Source()), offset=3),
        0)
    window = box2i(0, -1, 719, 478)

    want = []
    for i in range(4):
        frame = src.get_frame_f16(i, window)
        want.append(np.asarray(frame.data, np.float16))
    want = np.stack(want)

    pulls.clear()
    got = render.render_frames(src, window, 0, 4)
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=2e-2)
    # every coded frame pulled exactly once during batched planning
    assert len(pulls) == len(set(pulls)), pulls


@pytest.mark.parametrize('offset', range(5))
def test_pulldown_plan_cuts_map_child_coordinates(offset):
    """Structure cuts below a pulldown must map through the 4:5 cadence:
    a sequence clip boundary at child frame C cuts the OUTPUT where the
    pulls cross C, not at output frame C (round-2 fuzz regression: the
    unmapped cut let frames near a boundary plan with the wrong clip;
    offset 4's map is non-monotonic, so the child query window must
    cover every actual pull, not just the endpoints)."""
    from canvas_tpu import render
    from canvas_tpu.sources import SolidColorVideoSource, VideoSequence

    seq = VideoSequence()
    seq.append((SolidColorVideoSource((1.0, 0.0, 0.0, 1.0)), 2, 12))
    seq.append((SolidColorVideoSource((0.0, 1.0, 0.0, 1.0)), 0, 4))
    filt = Pulldown23RemovalFilter(seq, offset)
    window = box2i(0, 0, 15, 15)

    want = []
    for i in range(4, 14):
        frame = filt.get_frame_f16(i, window)
        want.append(np.asarray(frame.data, np.float16)
                    if not frame.current_window.empty()
                    else np.zeros((4, 16, 16), np.float16))
    want = np.stack(want)
    got = render.render_frames(filt, window, 4, 14)
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=2e-3)


def test_reconstruct_planar_geometries(any_backend):
    """Generic planar reconstruct handles 4:2:0 / 4:2:2 / 4:4:4 and
    reduces to the DV math for 4:1:1."""
    from canvas_tpu.ops.chroma import (reconstruct_dv_full,
                                       reconstruct_planar_full)

    rng = np.random.RandomState(11)
    # 4:1:1 equivalence with the DV kernel AWAY FROM THE RIGHT EDGE
    # (identity vertical factor). At the edge the two intentionally
    # differ: the DV kernel is reference-exact (clipped taps lose
    # weight, video_reconstruct.c:85-109) while the generic path
    # renormalizes like the swscale pipeline it replaced — without it,
    # decoded 4:2:0/4:2:2 frames desaturated toward gray along the
    # last columns/rows.
    y = rng.randint(16, 236, (480, 720)).astype(np.uint8)
    cb = rng.randint(16, 241, (480, 180)).astype(np.uint8)
    cr = rng.randint(16, 241, (480, 180)).astype(np.uint8)
    np.testing.assert_array_equal(
        reconstruct_planar_full(y, cb, cr)[:, :, :-3].view(np.uint16),
        reconstruct_dv_full(y, cb, cr)[:, :, :-3].view(np.uint16))
    # full chroma weight at the edge: CONSTANT y+chroma input must
    # reconstruct constant color all the way to the last column (the
    # un-renormalized matrix halved the final columns' chroma toward
    # gray)
    y_c = np.full((8, 720), 128, np.uint8)
    cb_c = np.full((8, 180), 200, np.uint8)
    out_c = reconstruct_planar_full(y_c, cb_c, cb_c).astype(np.float32)
    for ch in range(3):
        np.testing.assert_allclose(out_c[ch, :, -1], out_c[ch, :, 360],
                                   rtol=1e-3, atol=1e-3)

    # other geometries produce full-size output with sane values
    for (cs, name) in (((24, 32), '420'), ((48, 32), '422'),
                       ((48, 64), '444')):
        y = rng.randint(16, 236, (48, 64)).astype(np.uint8)
        cbp = rng.randint(16, 241, cs).astype(np.uint8)
        crp = rng.randint(16, 241, cs).astype(np.uint8)
        out = reconstruct_planar_full(y, cbp, crp)
        assert out.shape == (4, 48, 64), name
        assert np.isfinite(out.astype(np.float32)).all(), name
        # gray input sanity: y-only signal reconstructs to r=g=b
        cb_g = np.full(cs, 128, np.uint8)
        out_g = reconstruct_planar_full(y, cb_g, cb_g).astype(np.float32)
        np.testing.assert_allclose(out_g[0], out_g[1], atol=1e-3)
        np.testing.assert_allclose(out_g[1], out_g[2], atol=1e-3)


def test_planar_reconstruction_filter_batched_matches_pull():
    """PlanarReconstructionFilter (4:2:0) batched device path matches
    the eager pull path."""
    from canvas_tpu import render
    from canvas_tpu.coded import (CodedImage, CodedImageSource,
                                  PlanarReconstructionFilter)

    class Source(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            rng = np.random.RandomState(frame_index)
            return CodedImage([
                rng.randint(16, 236, (96, 128)).astype(np.uint8),
                rng.randint(16, 241, (48, 64)).astype(np.uint8),
                rng.randint(16, 241, (48, 64)).astype(np.uint8)])

    filt = PlanarReconstructionFilter(Source())
    window = box2i(0, 0, 159, 127)        # larger than the image
    want = []
    for i in range(4):
        frame = filt.get_frame_f16(i, window)
        want.append(np.asarray(frame.data, np.float16))
    want = np.stack(want)
    got = render.render_frames(filt, window, 0, 4)
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=1e-2)
    exact = np.mean(got.view(np.uint16) == want.view(np.uint16))
    assert exact > 0.99


def test_planar_reconstruction_rec601_matrix():
    """matrix='rec601' applies the 601 coefficients in both the eager
    and batched paths (streams tagged smpte170m/bt470bg)."""
    from canvas_tpu import render
    from canvas_tpu.coded import (CodedImage, CodedImageSource,
                                  PlanarReconstructionFilter)
    from canvas_tpu.ops.chroma import reconstruct_planar_full

    rng = np.random.RandomState(21)
    y = rng.randint(16, 236, (48, 64)).astype(np.uint8)
    cb = rng.randint(16, 241, (24, 32)).astype(np.uint8)
    cr = rng.randint(16, 241, (24, 32)).astype(np.uint8)

    out601 = reconstruct_planar_full(y, cb, cr, matrix='rec601')
    out709 = reconstruct_planar_full(y, cb, cr, matrix='rec709')
    assert np.abs(out601.astype(np.float32) -
                  out709.astype(np.float32)).max() > 1e-3

    class Source(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            return CodedImage([y, cb, cr])

    filt = PlanarReconstructionFilter(Source(), matrix='rec601')
    window = box2i(0, 0, 63, 47)
    want = np.asarray(filt.get_frame_f16(0, window).data)
    got = render.render_frames(filt, window, 0, 1)[0]
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=1e-2)


def test_planar_emit_falls_back_when_geometry_unknown():
    """A source whose frame 0 is unavailable (content starts later)
    host-stages instead of emitting empty frames (review regression)."""
    from canvas_tpu import render
    from canvas_tpu.coded import (CodedImage, CodedImageSource,
                                  PlanarReconstructionFilter)

    class LateStart(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            if frame_index < 2:
                return None
            rng = np.random.RandomState(frame_index)
            return CodedImage([
                rng.randint(16, 236, (48, 64)).astype(np.uint8),
                rng.randint(16, 241, (24, 32)).astype(np.uint8),
                rng.randint(16, 241, (24, 32)).astype(np.uint8)])

    filt = PlanarReconstructionFilter(LateStart())
    window = box2i(0, 0, 63, 47)
    want = []
    for i in range(4):
        frame = filt.get_frame_f16(i, window)
        want.append(np.asarray(frame.data, np.float16)
                    if not frame.current_window.empty()
                    else np.zeros((4, 48, 64), np.float16))
    got = render.render_frames(filt, window, 0, 4)
    np.testing.assert_allclose(got.astype(np.float32),
                               np.stack(want).astype(np.float32),
                               atol=1e-2)


def test_420_vertical_siting_centered():
    """MPEG-2/H.264 4:2:0 chroma is vertically CENTERED between luma
    rows (advisor round-2): the vertical up-matrix interpolates with
    0.75/0.25 weights, rows renormalize to unit sum at the edges, and
    vertically co-sited geometries (4:2:2/4:1:1) are untouched."""
    from canvas_tpu.ops.chroma import (_up_matrix_generic,
                                       _vertical_siting)

    # 4:2:0 vertical factor 2 -> sited 0.5; 4:2:2/4:4:4 vertical -> 0.0
    assert _vertical_siting(48, 24) == 0.5
    assert _vertical_siting(48, 48) == 0.0
    assert _vertical_siting(480, 480) == 0.0   # 4:1:1 (DV)

    Uv = _up_matrix_generic(8, 4, siting=0.5)
    # every output row sums to 1 (edge rows renormalized)
    np.testing.assert_allclose(Uv.sum(axis=1), np.ones(8), atol=1e-6)
    # interior rows: chroma row c sits at luma 2c+0.5, so luma row 1
    # (distance 0.5 and 1.5 from chroma centers 0.5 and 2.5) mixes
    # 0.75/0.25
    np.testing.assert_allclose(Uv[1], [0.75, 0.25, 0, 0], atol=1e-6)
    np.testing.assert_allclose(Uv[2], [0.25, 0.75, 0, 0], atol=1e-6)
    # co-sited matrix unchanged by the siting parameter default
    Uv0 = _up_matrix_generic(8, 4)
    np.testing.assert_allclose(Uv0[0], [1.0, 0, 0, 0], atol=1e-6)

    # uniform chroma stays uniform through the sited filter (batched
    # and eager paths share these matrices)
    from canvas_tpu.ops.chroma import reconstruct_planar_full
    y = np.full((48, 64), 128, np.uint8)
    c = np.full((24, 32), 90, np.uint8)
    out = reconstruct_planar_full(y, c, c).astype(np.float32)
    # (the co-sited HORIZONTAL matrix keeps the reference's triangle
    # edge behavior, so exclude the last column from the check)
    for ch in range(3):
        np.testing.assert_allclose(out[ch][:, :-1], out[ch][0, 0],
                                   rtol=2e-3)


def test_planar_stack_midstream_shape_change_falls_back():
    """A mid-segment plane-dimension change must not blow up the
    batched planner: the device plane stack bails and the node is
    host-staged, matching the eager pull path (advisor round-2)."""
    from canvas_tpu import render
    from canvas_tpu.coded import (CodedImage, CodedImageSource,
                                  PlanarReconstructionFilter)

    class ShapeShift(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            rng = np.random.RandomState(frame_index)
            if frame_index < 2:
                shapes = ((96, 128), (48, 64))
            else:
                shapes = ((48, 64), (24, 32))
            return CodedImage([
                rng.randint(16, 236, shapes[0]).astype(np.uint8),
                rng.randint(16, 241, shapes[1]).astype(np.uint8),
                rng.randint(16, 241, shapes[1]).astype(np.uint8)])

    filt = PlanarReconstructionFilter(ShapeShift(), width=128, height=96)
    window = box2i(0, 0, 127, 95)
    want = np.stack([np.asarray(filt.get_frame_f16(i, window).data,
                                np.float16) for i in range(4)])
    got = render.render_frames(filt, window, 0, 4)
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=1e-2)


def test_planner_quality_caps_coded_pulls():
    """RenderPlanner(quality=) flows into coded-source get_frame calls
    on the batched path: the LOWER of the planner and filter hints
    wins (framework.h:510-513 quality scale; hints.rst intent)."""
    from canvas_tpu import render
    from canvas_tpu.coded import (CodedImage, CodedImageSource,
                                  DVReconstructionFilter)

    asked = []

    class Recording(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            asked.append(quality)
            rng = np.random.RandomState(frame_index)
            return CodedImage([
                rng.randint(16, 236, (480, 720)).astype(np.uint8),
                rng.randint(16, 241, (480, 180)).astype(np.uint8),
                rng.randint(16, 241, (480, 180)).astype(np.uint8)])

    window = box2i(0, -1, 719, 478)
    filt = DVReconstructionFilter(Recording())
    render.RenderPlanner(filt, window, quality=4).render(0, 2)
    assert asked and all(q == 4 for q in asked)

    asked.clear()
    render.RenderPlanner(filt, window).render(0, 2)
    assert asked and all(q == 10 for q in asked)


def test_dv_subsample_jax_matches_numpy():
    """Device DV 4:1:1 subsample (packed single-fetch path) agrees with
    the NumPy golden like the MPEG-2 sibling: <=1 code value at the
    round boundary, on few pixels."""
    rng = np.random.RandomState(7)
    data = (rng.rand(4, 480, 720) * 0.9).astype(np.float16)
    win = box2i(3, 2, 700, 470)
    with backend.force_backend('numpy'):
        y_np, cb_np, cr_np = chroma.subsample_dv(
            data, box2i(0, -1, 719, 478), win)
    with backend.force_backend('jax'):
        jnp = backend.jnp
        y_j, cb_j, cr_j = chroma.subsample_dv(
            jnp.asarray(data), box2i(0, -1, 719, 478), win)
    for a, b in ((y_np, y_j), (cb_np, cb_j), (cr_np, cr_j)):
        diff = np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.02
    # zero-outside-window invariant holds on the device path
    assert np.asarray(y_j)[:, 701:].max() == 0
    assert np.asarray(y_j)[:2 - (-1) - 1, :].max() == 0


def test_planar_probe_failure_recovers():
    """A transient decoder failure at the geometry probe must not
    downgrade the filter to host staging forever: probes retry
    (bounded), and any successful eager decode heals the geometry so
    later plans get the device plane-stack path back."""
    from canvas_tpu import render
    from canvas_tpu.coded import (CodedImage, CodedImageSource,
                                  PlanarReconstructionFilter)

    class Flaky(CodedImageSource):
        def __init__(self):
            self.calls = 0

        def get_frame(self, frame_index, quality=0):
            self.calls += 1
            if self.calls <= 2:            # transient outage
                return None
            rng = np.random.RandomState(frame_index)
            return CodedImage([
                rng.randint(16, 236, (48, 64)).astype(np.uint8),
                rng.randint(16, 241, (24, 32)).astype(np.uint8),
                rng.randint(16, 241, (24, 32)).astype(np.uint8)])

    src = Flaky()
    filt = PlanarReconstructionFilter(src)
    window = box2i(0, 0, 63, 47)
    planner = render.RenderPlanner(filt, window)
    first = planner.render(0, 2)           # probe fails; eager heals
    assert filt._size == (64, 48)
    second = planner.render(2, 4)          # device path, geometry known

    # ground truth from a never-flaky source
    class Steady(Flaky):
        def __init__(self):
            super().__init__()
            self.calls = 10

    want = render.render_frames(PlanarReconstructionFilter(Steady()),
                                window, 0, 4)
    got = np.concatenate([np.asarray(first), np.asarray(second)])
    empty = np.asarray(first)[0]
    # the two transiently-failed pulls rendered empty (zeros) — only
    # frames decoded after recovery must match
    assert not empty.any()
    np.testing.assert_array_equal(got[2:], want[2:])
    planner.close()
