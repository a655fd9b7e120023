"""Video source/frame semantics.

Mirrors the reference's Python suites:
  tests/process/video/SolidColorVideoSource.py (both CPU and device paths),
  tests/process/video/RgbaFrameF16.py (frame round-trip),
  plus pass-through, mix, and sequence behavior.
"""

import numpy as np
import pytest

from canvas_tpu import process
from canvas_tpu.basetypes import box2i, rgba


def check_color(c1, c2, places=6):
    for x, y in zip(c1, c2):
        assert abs(x - y) < 10 ** -places, (c1, c2)


class TestSolidColor:
    def test_const_color(self, any_backend):
        color = (1.0, 0.5, 0.333333, 0.2)
        solid = process.SolidColorVideoSource(color)
        frame = solid.get_frame_f32(0, box2i(0, 0, 3, 3))

        assert frame.current_window == box2i(0, 0, 3, 3)
        check_color(frame.pixel(0, 0), color)
        check_color(frame.pixel(3, 3), color)

    def test_const_window(self, any_backend):
        color = (1.0, 0.5, 0.333333, 0.2)
        solid = process.SolidColorVideoSource(color, box2i(0, 0, 2, 2))
        frame = solid.get_frame_f32(0, box2i(0, 0, 3, 3))

        assert frame.current_window == box2i(0, 0, 2, 2)
        check_color(frame.pixel(0, 0), color)
        # outside the window: undefined -> None (RgbaFrameF32.c:95-107)
        assert frame.pixel(3, 3) is None

        # a frame is itself a source: re-window it
        frame2 = frame.get_frame_f32(0, box2i(-1, -1, 1, 1))
        assert frame2.current_window == box2i(0, 0, 1, 1)
        check_color(frame2.pixel(0, 0), color)
        assert frame2.pixel(-1, -1) is None

    def test_moving_color(self, any_backend):
        solid = process.SolidColorVideoSource(
            process.LerpFunc((0.5, 0.25, 2.0, 1.0), (-0.5, -0.25, -2.0, 0.0), 2))

        frame = solid.get_frame_f32(0, box2i(0, 0, 0, 0))
        check_color(frame.pixel(0, 0), rgba(0.5, 0.25, 2.0, 1.0))

        frame = solid.get_frame_f32(1, box2i(0, 0, 0, 0))
        check_color(frame.pixel(0, 0), rgba(0.0, 0.0, 0.0, 0.5))

        frame = solid.get_frame_f32(2, box2i(0, 0, 0, 0))
        check_color(frame.pixel(0, 0), rgba(-0.5, -0.25, -2.0, 0.0))

    def test_moving_window(self, any_backend):
        solid = process.SolidColorVideoSource(
            rgba(0.0, 0.0, 1.0, 1.0),
            process.LerpFunc((-2, -2, 2, 2), (-4, -4, 0, 6), 2))

        frame = solid.get_frame_f32(0, box2i(-5, -5, 5, 6))
        assert frame.current_window == box2i(-2, -2, 2, 2)

        frame = solid.get_frame_f32(1, box2i(-5, -5, 5, 6))
        assert frame.current_window == box2i(-3, -3, 1, 4)

        frame = solid.get_frame_f32(2, box2i(-5, -5, 5, 6))
        assert frame.current_window == box2i(-4, -4, 0, 6)

    def test_f16_path(self, any_backend):
        color = (0.5, 0.25, 0.125, 1.0)
        solid = process.SolidColorVideoSource(color)
        frame = solid.get_frame_f16(3, box2i(0, 0, 1, 1))
        assert frame.data.dtype == np.float16
        check_color(frame.pixel(1, 1), color, places=3)

    def test_force_gl_compat_kwarg(self):
        # The reference tests pass force_gl=True; we accept it (routes to
        # the JAX backend when available).
        solid = process.SolidColorVideoSource((1, 0, 0, 1))
        frame = solid.get_frame_f32(0, box2i(0, 0, 3, 3), force_gl=True)
        check_color(frame.pixel(0, 0), (1, 0, 0, 1))


class TestEmptySource:
    def test_empty(self, any_backend):
        src = process.EmptyVideoSource()
        frame = src.get_frame_f32(0, box2i(0, 0, 3, 3))
        assert frame.current_window.empty()
        assert np.all(frame.to_numpy() == 0)


class TestFrameRoundTrip:
    def test_f16_f32_roundtrip(self, any_backend):
        solid = process.SolidColorVideoSource((0.125, 0.25, 0.5, 1.0))
        f16 = solid.get_frame_f16(0, box2i(0, 0, 3, 3))
        # pull f32 from an f16 frame (conversion dispatch)
        f32 = f16.get_frame_f32(0, box2i(0, 0, 3, 3))
        assert f32.data.dtype == np.float32
        check_color(f32.pixel(2, 2), (0.125, 0.25, 0.5, 1.0))

    def test_window_shift(self, any_backend):
        solid = process.SolidColorVideoSource((1, 1, 1, 1), box2i(2, 2, 5, 5))
        frame = solid.get_frame_f32(0, box2i(0, 0, 7, 7))
        shifted = frame.get_frame_f32(0, box2i(4, 4, 9, 9))
        assert shifted.current_window == box2i(4, 4, 5, 5)
        check_color(shifted.pixel(5, 5), (1, 1, 1, 1))
        assert shifted.pixel(6, 6) is None


class TestPassThrough:
    def test_offset(self, any_backend):
        solid = process.SolidColorVideoSource(
            process.LerpFunc((0, 0, 0, 1), (100, 0, 0, 1), 100))
        filt = process.VideoPassThroughFilter(solid, offset=10)
        frame = filt.get_frame_f32(0, box2i(0, 0, 0, 0))
        check_color(frame.pixel(0, 0), (10, 0, 0, 1))

    def test_start_end(self, any_backend):
        solid = process.SolidColorVideoSource((1, 0, 0, 1))
        filt = process.VideoPassThroughFilter(solid, start_frame=5, end_frame=10)
        assert filt.get_frame_f32(4, box2i(0, 0, 0, 0)).current_window.empty()
        assert not filt.get_frame_f32(5, box2i(0, 0, 0, 0)).current_window.empty()
        assert not filt.get_frame_f32(9, box2i(0, 0, 0, 0)).current_window.empty()
        assert filt.get_frame_f32(10, box2i(0, 0, 0, 0)).current_window.empty()


class TestMixFilter:
    def test_crossfade_midpoint(self, any_backend):
        a = process.SolidColorVideoSource((1.0, 0.0, 0.0, 1.0))
        b = process.SolidColorVideoSource((0.0, 1.0, 0.0, 1.0))
        mix = process.VideoMixFilter(a, b, process.LerpFunc((0,), (1,), 10))

        f = mix.get_frame_f32(0, box2i(0, 0, 0, 0))
        check_color(f.pixel(0, 0), (1, 0, 0, 1))

        f = mix.get_frame_f32(5, box2i(0, 0, 0, 0))
        check_color(f.pixel(0, 0), (0.5, 0.5, 0, 1))

        f = mix.get_frame_f32(10, box2i(0, 0, 0, 0))
        check_color(f.pixel(0, 0), (0, 1, 0, 1))

    def test_crossfade_alpha_weighting(self, any_backend):
        # rgb is weighted by per-input alpha, not just mix
        a = process.SolidColorVideoSource((1.0, 0.0, 0.0, 1.0))
        b = process.SolidColorVideoSource((0.0, 1.0, 0.0, 0.0))  # transparent
        mix = process.VideoMixFilter(a, b, 0.5)
        f = mix.get_frame_f32(0, box2i(0, 0, 0, 0))
        # alpha_a = 0.5, alpha_b = 0: rgb stays a's, alpha halves
        check_color(f.pixel(0, 0), (1.0, 0.0, 0.0, 0.5))

    def test_one_side_empty(self, any_backend):
        a = process.SolidColorVideoSource((1.0, 0.0, 0.0, 1.0))
        b = process.EmptyVideoSource()
        mix = process.VideoMixFilter(a, b, 0.25)
        f = mix.get_frame_f32(0, box2i(0, 0, 0, 0))
        # copy a with alpha * (1 - mix_b) (video_mix.c:118-121)
        check_color(f.pixel(0, 0), (1.0, 0.0, 0.0, 0.75))

    def test_windows_union(self, any_backend):
        a = process.SolidColorVideoSource((1, 0, 0, 1), box2i(0, 0, 1, 1))
        b = process.SolidColorVideoSource((0, 1, 0, 1), box2i(2, 2, 3, 3))
        mix = process.VideoMixFilter(a, b, 0.5)
        f = mix.get_frame_f32(0, box2i(0, 0, 4, 4))
        assert f.current_window == box2i(0, 0, 3, 3)
        check_color(f.pixel(0, 0), (1, 0, 0, 0.5))
        check_color(f.pixel(3, 3), (0, 1, 0, 0.5))
        assert f.pixel(4, 4) is None


class TestGainOffset:
    def test_gain_offset(self, any_backend):
        src = process.SolidColorVideoSource((0.5, 0.25, 0.0, 0.8))
        filt = process.VideoGainOffsetFilter(src, gain=2.0, offset=0.1)
        f = filt.get_frame_f32(0, box2i(0, 0, 0, 0))
        # rgb * gain + offset; alpha unchanged (video_filter.c:36-39)
        check_color(f.pixel(0, 0), (1.1, 0.6, 0.1, 0.8))

    def test_offset_respects_window(self, any_backend):
        src = process.SolidColorVideoSource((0.5, 0.5, 0.5, 1.0), box2i(0, 0, 0, 0))
        filt = process.VideoGainOffsetFilter(src, gain=1.0, offset=0.25)
        f = filt.get_frame_f32(0, box2i(0, 0, 1, 1))
        check_color(f.pixel(0, 0), (0.75, 0.75, 0.75, 1.0))
        assert f.pixel(1, 1) is None


class TestVideoSequence:
    def make(self):
        red = process.SolidColorVideoSource(
            process.LerpFunc((0, 0, 0, 1), (100, 0, 0, 1), 100))
        green = process.SolidColorVideoSource(
            process.LerpFunc((0, 0, 0, 1), (0, 100, 0, 1), 100))
        return red, green

    def test_lookup(self, any_backend):
        red, green = self.make()
        seq = process.VideoSequence()
        seq.append((red, 0, 5))
        seq.append((green, 10, 5))

        assert len(seq) == 2
        assert seq.get_start_frame(0) == 0
        assert seq.get_start_frame(1) == 5

        f = seq.get_frame_f32(2, box2i(0, 0, 0, 0))
        check_color(f.pixel(0, 0), (2, 0, 0, 1))

        # frame 7 -> second clip, local frame 7-5+10 = 12
        f = seq.get_frame_f32(7, box2i(0, 0, 0, 0))
        check_color(f.pixel(0, 0), (0, 12, 0, 1))

        # past the end / before the start: empty
        assert seq.get_frame_f32(10, box2i(0, 0, 0, 0)).current_window.empty()
        assert seq.get_frame_f32(-1, box2i(0, 0, 0, 0)).current_window.empty()

    def test_edit(self, any_backend):
        red, green = self.make()
        seq = process.VideoSequence()
        seq.append((red, 0, 5))
        seq.append((green, 0, 5))
        seq.insert(1, (red, 50, 3))

        assert seq.get_start_frame(1) == 5
        assert seq.get_start_frame(2) == 8
        assert seq[1] == (red, 50, 3)

        seq[1] = (red, 50, 10)
        assert seq.get_start_frame(2) == 15

        del seq[1]
        assert seq.get_start_frame(1) == 5
        f = seq.get_frame_f32(6, box2i(0, 0, 0, 0))
        check_color(f.pixel(0, 0), (0, 1, 0, 1))

    def test_zero_length(self, any_backend):
        red, green = self.make()
        seq = process.VideoSequence()
        seq.append((red, 0, 0))
        seq.append((green, 20, 5))
        f = seq.get_frame_f32(0, box2i(0, 0, 0, 0))
        check_color(f.pixel(0, 0), (0, 20, 0, 1))
        with pytest.raises(ValueError):
            seq.append((red, 0, -1))


def test_sequence_setitem_negative_index():
    """seq[-1] = ... must normalize the index before rebuilding the
    prefix sums (a raw -1 rebuilt _starts from the last item's start,
    corrupting every later lookup; on a 1-item sequence it raised)."""
    from canvas_tpu.sources import SolidColorVideoSource, VideoSequence

    s = SolidColorVideoSource((1, 0, 0, 1))
    seq = VideoSequence([(s, 0, 5), (s, 0, 5)])
    seq[-1] = (s, 0, 7)
    assert [seq.get_start_frame(i) for i in range(2)] == [0, 5]
    assert seq[1][2] == 7

    one = VideoSequence([(s, 0, 5)])
    one[-1] = (s, 0, 9)                     # raised IndexError pre-fix
    assert one.get_start_frame(0) == 0

    import pytest
    with pytest.raises(IndexError):
        seq[5] = (s, 0, 1)


def test_transfer_filter_none_source_plans_empty(any_backend):
    """VideoColorTransferFilter(None, ...) renders empty on the eager
    path; planning the same graph must agree instead of raising."""
    from canvas_tpu import render
    from canvas_tpu.sources import (VideoColorTransferFilter,
                                    VideoWorkspace)

    ws = VideoWorkspace()
    ws.add(source=VideoColorTransferFilter(None, 'linear_to_srgb'),
           x=0, length=8, z=0)
    out = np.asarray(render.render_frames(ws, box2i(0, 0, 31, 23), 0, 4))
    assert (out == 0).all()


def test_over_stack_matches_sequential_over():
    """mix.over_stack (the public fold kernel) == folding mix.over
    pairwise — golden for the otherwise-unexercised stack form."""
    from canvas_tpu.ops import mix as mix_ops

    rng = np.random.RandomState(3)
    layers = rng.rand(4, 4, 6, 8).astype(np.float32)
    got = np.asarray(mix_ops.over_stack(layers))
    acc = layers[0]
    for i in range(1, layers.shape[0]):
        acc = np.asarray(mix_ops.over(acc, layers[i], 1.0))
    np.testing.assert_allclose(got, acc, atol=1e-5)


def test_sequence_slice_assignment():
    """__setitem__ accepts slices like __getitem__/__delitem__
    (list semantics)."""
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.sources import SolidColorVideoSource, VideoSequence

    a = SolidColorVideoSource((1, 0, 0, 1))
    b = SolidColorVideoSource((0, 1, 0, 1))
    c = SolidColorVideoSource((0, 0, 1, 1))
    seq = VideoSequence()
    seq.append((a, 0, 4))
    seq.append((b, 0, 4))
    seq[0:2] = [(c, 0, 3), (a, 0, 5)]
    assert len(seq) == 2
    assert seq.get_start_frame(1) == 3
    win = box2i(0, 0, 3, 3)
    px = seq.get_frame_f16(1, win).pixel(0, 0)
    assert (px.r, px.g, px.b) == (0.0, 0.0, 1.0)


def test_workspace_item_update_atomic():
    """A bad kwarg leaves the item untouched (validate-then-apply)."""
    import pytest
    from canvas_tpu.sources import SolidColorVideoSource, VideoWorkspace

    ws = VideoWorkspace()
    item = ws.add(source=SolidColorVideoSource((1, 0, 0, 1)),
                  x=3, length=10, z=0)
    with pytest.raises(TypeError):
        item.update(x=50, lenght=99)
    assert item.x == 3 and item.length == 10


def test_process_namespace_parity():
    """Every name the reference's process module exports
    (src/process/main.c:331-407 + tp_name strings across src/process/)
    exists in canvas_tpu.process, so reference scripts import cleanly."""
    import canvas_tpu.process as p

    names = '''AnimationFunc AnimationPoint AudioFrame
        AudioPassThroughFilter AudioSequence AudioSource AudioWorkspace
        AudioWorkspaceItem ClockCallbackHandle CodecPacketSource
        CodedImageSource DVReconstructionFilter DVSubsampleFilter
        EmptyVideoSource FrameFuncPassThroughFilter FrameFunction
        MPEG2SubsampleFilter Offscreen PresentationClock
        Pulldown23RemovalFilter RgbaFrameF16 RgbaFrameF32
        SolidColorVideoSource SystemPresentationClock
        VideoGainOffsetFilter VideoMixFilter VideoPassThroughFilter
        VideoPullQueue VideoPullQueueItem VideoScaler VideoSequence
        VideoSource VideoWorkspace VideoWorkspaceItem get_frame_time
        get_time_frame time_get_frame NS_PER_SEC LinearFrameFunc
        LerpFunc POINT_HOLD POINT_LINEAR'''.split()
    missing = [n for n in names if not hasattr(p, n)]
    assert not missing, missing

    ws = p.VideoWorkspace()
    assert isinstance(ws.add(x=0, length=1), p.VideoWorkspaceItem)
    with pytest.raises(NotImplementedError):
        p.Offscreen()   # GL-era compat name; no GL path here


def test_frame_container_api_surface():
    """RgbaFrameF16 container protocol: len/frame[i]/width/height/repr
    (RgbaFrameF16.c frame[i] + .pixel surface)."""
    import numpy as np

    from canvas_tpu.frames import RgbaFrameF16

    win = box2i(2, 1, 5, 3)   # 4x3
    data = np.zeros((4, 3, 4), np.float16)
    data[0, 2, 3] = 0.5   # red at r=2,c=3 -> absolute (x=5, y=3)
    frame = RgbaFrameF16(win, data=data)
    assert (frame.width, frame.height) == (4, 3)
    assert len(frame) == 12
    got = frame[2 * 4 + 3]
    assert abs(got.r - 0.5) < 1e-3 and got.a == 0.0
    assert frame.pixel(5, 3).r == got.r
    with pytest.raises(IndexError):
        frame[12]
    with pytest.raises(IndexError):
        frame[-1]
    assert 'RgbaFrameF16' in repr(frame)
    assert 'full_window' in repr(frame)


def test_frame_constructor_validation():
    import numpy as np

    from canvas_tpu.basetypes import EMPTY_BOX2I
    from canvas_tpu.frames import RgbaFrameF16, RgbaFrameF32

    with pytest.raises(ValueError):
        RgbaFrameF16(EMPTY_BOX2I)
    with pytest.raises(ValueError):
        RgbaFrameF32(box2i(0, 0, 3, 3), data=np.zeros((4, 3, 4),
                                                      np.float32))
    # explicit data defaults current_window to the full window
    frame = RgbaFrameF16(box2i(0, 0, 1, 1),
                         data=np.zeros((4, 2, 2), np.float16))
    assert frame.current_window == box2i(0, 0, 1, 1)


def test_frame_to_argb_string_byte_order():
    """to_argb_string: little-endian ARGB32 = B,G,R,A bytes through the
    gamma45 ramp (RgbaFrameF16.c:122)."""
    import numpy as np

    from canvas_tpu.frames import RgbaFrameF16
    from canvas_tpu.ops import color as color_ops

    data = np.zeros((4, 1, 2), np.float16)
    data[:, 0, 0] = (1.0, 0.0, 0.0, 1.0)   # pure red, opaque
    data[:, 0, 1] = (0.0, 1.0, 0.0, 0.5)
    frame = RgbaFrameF16(box2i(0, 0, 1, 0), data=data)
    raw = frame.to_argb_string()
    assert len(raw) == 2 * 4
    ramped = color_ops.apply_gamma45_u8(data)
    # pixel 0: B,G,R,A
    assert raw[0] == ramped[2, 0, 0] and raw[2] == ramped[0, 0, 0]
    assert raw[3] == ramped[3, 0, 0]
    # pixel 1 green channel
    assert raw[4 + 1] == ramped[1, 0, 1]


def test_get_frame_rejects_unknown_kwargs():
    src = process.SolidColorVideoSource((1, 0, 0, 1))
    with pytest.raises(TypeError):
        src.get_frame_f16(0, box2i(0, 0, 3, 3), bogus=True)
    # force_gl maps to the JAX backend (reference tests' toggle)
    frame = src.get_frame_f16(0, box2i(0, 0, 3, 3), force_gl=True)
    assert frame.pixel(0, 0).r == 1.0
