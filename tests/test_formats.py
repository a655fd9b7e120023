"""fluggo.media.formats / fluggo.media.transitions parity tests.

Covers `canvas_tpu.formats` (KnownColorPrimaries from the reference
module /root/reference/fluggo/media/formats.py:25-33, plus the
StreamFormat/ContainerFormat detected-vs-override model its docs
specify, docs/sphinx/media/formats.rst) and `canvas_tpu.transitions`
(/root/reference/fluggo/media/transitions.py:24-30 — whose reference
Crossfade is a latent NameError: it references LinearFrameFunc without
importing it; ours binds the real frame function).
"""

import math

import numpy as np
import pytest

from canvas_tpu import formats
from canvas_tpu import transitions
from canvas_tpu.basetypes import box2i, rgba, v2f
from canvas_tpu.frames import RgbaFrameF32
from canvas_tpu.sources import SolidColorVideoSource


def test_known_color_primaries():
    # Rec709 shares sRGB primaries; all sets are (R, G, B) xy pairs.
    assert formats.KnownColorPrimaries.Rec709 is \
        formats.KnownColorPrimaries.sRGB
    for name in ('AdobeRGB', 'AppleRGB', 'sRGB', 'SMPTE_C'):
        primaries = getattr(formats.KnownColorPrimaries, name)
        assert len(primaries) == 3
        for xy in primaries:
            assert isinstance(xy, v2f)
            assert 0.0 < xy.x < 1.0 and 0.0 < xy.y < 1.0
    assert formats.KnownColorPrimaries.sRGB[0] == v2f(0.6400, 0.3300)


def test_stream_format_override_layering():
    fmt = formats.StreamFormat(
        'video',
        detected={formats.VideoProperty.FRAME_RATE: 25,
                  formats.ContainerProperty.STREAM_INDEX: 2},
        length=80)
    # Detected value shows through until overridden.
    assert fmt.get(formats.VideoProperty.FRAME_RATE) == 25
    fmt.override[formats.VideoProperty.FRAME_RATE] = 30
    assert fmt.get(formats.VideoProperty.FRAME_RATE) == 30
    # Missing property falls back to the caller's default.
    assert fmt.get(formats.VideoProperty.INTERLACED, False) is False
    assert fmt.index == 2
    assert fmt.length == 80 and fmt.adjusted_length == 80
    assert 'video' in repr(fmt)


def test_container_format_stream_lookup():
    streams = [
        formats.StreamFormat(
            'video', {formats.ContainerProperty.STREAM_INDEX: 0}),
        formats.StreamFormat(
            'audio', {formats.ContainerProperty.STREAM_INDEX: 1}),
    ]
    container = formats.ContainerFormat(
        detected={formats.ContainerProperty.FORMAT: 'avi'},
        streams=streams, path='/tmp/x.avi')
    assert container.get_stream(1).type == 'audio'
    assert container.get_stream(7) is None
    assert container.get(formats.ContainerProperty.FORMAT) == 'avi'
    assert container.type == 'container'
    assert 'x.avi' in repr(container)


def test_probe_container_real_media(tmp_path):
    libav = pytest.importorskip('canvas_tpu.libav')
    if not libav.available():
        pytest.skip('native canvas_av unavailable')
    path = str(tmp_path / 'probe.avi')
    with libav.AVMuxer(path) as mux:
        v = mux.add_video_stream('mpeg4', (64, 48), 25, bit_rate=400_000)
        a = mux.add_audio_stream('pcm_s16le', 8000, 1)
        mux.start()
        frame = np.zeros((48, 64, 4), np.uint8)
        frame[:, :, 3] = 255
        for _ in range(5):
            mux.write_video_frame(v, frame)
        t = np.arange(1600, dtype=np.float32) / 8000.0
        mux.write_audio_frame(
            a, (0.25 * np.sin(2 * math.pi * 440 * t))
            .astype(np.float32).reshape(-1, 1))

    container = formats.probe_container(path)
    assert container.path == path
    assert 'avi' in container.get(formats.ContainerProperty.FORMAT)
    video = next(s for s in container.streams if s.type == 'video')
    assert video.get(formats.VideoProperty.CODEC) == 'mpeg4'
    assert video.get(formats.VideoProperty.FRAME_RATE) == 25
    assert video.get(formats.VideoProperty.FRAME_SIZE) == (64, 48)
    audio = next(s for s in container.streams if s.type == 'audio')
    assert audio.get(formats.AudioProperty.SAMPLE_RATE) == 8000
    assert audio.get(formats.AudioProperty.CHANNELS) == 1
    # Override layering works on probed formats too.
    video.override[formats.VideoProperty.FRAME_RATE] = 24
    assert video.get(formats.VideoProperty.FRAME_RATE) == 24


def test_crossfade_creates_linear_mix():
    window = box2i(0, 0, 3, 3)
    a = SolidColorVideoSource(rgba(1.0, 0.0, 0.0, 1.0), window)
    b = SolidColorVideoSource(rgba(0.0, 1.0, 0.0, 1.0), window)
    source = transitions.Crossfade().create_source(a, b, length=4)

    def color_at(i):
        frame = RgbaFrameF32(window)
        source.render_f32(i, frame)
        return frame.pixel(0, 0)

    # mix_b = i/length: frame 0 is pure A, frame 2 blends half,
    # frame 4 is pure B.
    c0 = color_at(0)
    assert (c0.r, c0.g) == (1.0, 0.0)
    c2 = color_at(2)
    assert abs(c2.r - 0.5) < 1e-6 and abs(c2.g - 0.5) < 1e-6
    c4 = color_at(4)
    assert (c4.r, c4.g) == (0.0, 1.0)


def test_transition_base_is_abstract():
    with pytest.raises(NotImplementedError):
        transitions.Transition().create_source(None, None, 1)
