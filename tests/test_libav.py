"""Native media IO (canvas_av) round-trip tests.

No media fixtures: we *create* files with our own muxer, then probe,
demux, and decode them back — covering the same surface the reference's
libav module exposes (src/libav/).
"""

import math
import os

import numpy as np
import pytest

libav = pytest.importorskip('canvas_tpu.libav')

if not libav.available():
    pytest.skip('native canvas_av unavailable', allow_module_level=True)

from canvas_tpu.basetypes import box2i
from canvas_tpu.framefuncs import LerpFunc
from canvas_tpu.sources import SolidColorVideoSource


@pytest.fixture(scope='module')
def sample_file(tmp_path_factory):
    """A tiny mpeg4/avi file with video + pcm audio written by AVMuxer."""
    path = str(tmp_path_factory.mktemp('media') / 'sample.avi')
    with libav.AVMuxer(path) as mux:
        v = mux.add_video_stream('mpeg4', (64, 48), 25, bit_rate=400_000)
        a = mux.add_audio_stream('pcm_s16le', 8000, 1)
        mux.start()
        for i in range(25):
            frame = np.zeros((48, 64, 4), np.uint8)
            frame[:, :, 0] = min(255, i * 10)       # red ramps with time
            frame[:, :, 3] = 255
            mux.write_video_frame(v, frame)
        t = np.arange(8000, dtype=np.float32) / 8000.0
        tone = (0.5 * np.sin(2 * math.pi * 440 * t)).astype(np.float32)
        mux.write_audio_frame(a, tone.reshape(-1, 1))
    return path


def test_version():
    assert b'canvas_av' in libav._load().cav_version()


def test_probe(sample_file):
    container = libav.AVContainer(sample_file)
    assert 'avi' in container.format_name
    types = sorted(s.type for s in container.streams)
    assert types == ['audio', 'video']
    video = next(s for s in container.streams if s.type == 'video')
    assert video.frame_size == (64, 48)
    assert video.codec == 'mpeg4'
    assert video.real_frame_rate == 25
    audio = next(s for s in container.streams if s.type == 'audio')
    assert audio.sample_rate == 8000
    assert audio.channels == 1
    container.close()


def test_demux_packets(sample_file):
    container = libav.AVContainer(sample_file)
    vidx = next(i for i, s in enumerate(container.streams)
                if s.type == 'video')
    container.close()
    demux = libav.AVDemuxer(sample_file, vidx)
    packets = []
    while True:
        pkt = demux.get_next_packet()
        if pkt is None:
            break
        packets.append(pkt)
    assert len(packets) == 25
    assert packets[0].keyframe
    assert all(p.stream == vidx for p in packets)
    assert len(packets[0].data) > 0
    # seek back and read again
    demux.seek(0)
    pkt = demux.get_next_packet()
    assert pkt is not None
    demux.close()


def test_video_decode_rgba(sample_file):
    dec = libav.AVVideoDecoder(sample_file)
    f0 = dec.get_frame_rgba(0, 64, 48)
    f20 = dec.get_frame_rgba(20, 64, 48)
    assert f0.shape == (48, 64, 4)
    # red ramp: frame 20 much redder than frame 0
    assert int(f20[24, 32, 0]) > int(f0[24, 32, 0]) + 100
    # random access backward
    f0b = dec.get_frame_rgba(0, 64, 48)
    assert abs(int(f0b[24, 32, 0]) - int(f0[24, 32, 0])) <= 2
    dec.close()


def test_video_decode_planar(sample_file):
    dec = libav.AVVideoDecoder(sample_file)
    image = dec.get_frame(0)
    assert image is not None
    assert image[0].shape == (48, 64)
    # mpeg4 is 4:2:0
    assert image[1].shape == (24, 32)
    assert image[2].shape == (24, 32)
    # past EOF
    assert dec.get_frame(1000) is None
    dec.close()


def test_audio_decode(sample_file):
    dec = libav.AVAudioDecoder(sample_file, channels=1)
    assert dec.sample_rate == 8000
    frame = dec.get_frame(0, 7999)
    data = np.asarray(frame.data)[:, 0]
    # 440 Hz tone at 0.5 amplitude: RMS ~ 0.354
    rms = float(np.sqrt(np.mean(data ** 2)))
    assert 0.3 < rms < 0.4
    # random access re-read matches
    again = np.asarray(dec.get_frame(1000, 1999).data)[:, 0]
    np.testing.assert_allclose(again, data[1000:2000], atol=1e-4)
    dec.close()


def test_write_video_end_to_end(tmp_path):
    """write_video exports a synthetic timeline; decode verifies pixels."""
    path = str(tmp_path / 'export.avi')
    src = SolidColorVideoSource(
        LerpFunc((0.0, 0.0, 0.0, 1.0), (1.0, 1.0, 1.0, 1.0), 25))
    libav.write_video(path, src, None, 0, 25, frame_size=(64, 48),
                      frame_rate=25, video_codec='mpeg4',
                      bit_rate=1_000_000)
    assert os.path.getsize(path) > 1000
    dec = libav.AVVideoDecoder(path)
    first = dec.get_frame_rgba(0, 64, 48)
    last = dec.get_frame_rgba(24, 64, 48)
    assert int(last[24, 32, 1]) > int(first[24, 32, 1]) + 100
    dec.close()


def test_write_video_yuv420_transport(tmp_path):
    """transport='yuv420' (device-packed studio 4:2:0 planes, 2.6x
    fewer fetch bytes) produces the same video as the RGBA parity
    transport within swscale/codec rounding."""
    src = SolidColorVideoSource(
        LerpFunc((0.1, 0.7, 0.3, 1.0), (0.9, 0.2, 0.6, 1.0), 25))
    kw = dict(frame_size=(64, 48), frame_rate=25, video_codec='mpeg4',
              bit_rate=2_000_000)
    p_rgba = str(tmp_path / 'rgba.avi')
    p_yuv = str(tmp_path / 'yuv.avi')
    libav.write_video(p_rgba, src, None, 0, 25, **kw)
    libav.write_video(p_yuv, src, None, 0, 25, transport='yuv420', **kw)
    d1 = libav.AVVideoDecoder(p_rgba)
    d2 = libav.AVVideoDecoder(p_yuv)
    for i in (0, 12, 24):
        a = d1.get_frame_rgba(i, 64, 48).astype(np.int16)
        b = d2.get_frame_rgba(i, 64, 48).astype(np.int16)
        # flat solid frames: the only differences are swscale's
        # fixed-point rounding vs the device matrix + codec noise
        assert np.abs(a - b)[:, :, :3].max() <= 4, \
            'frame %d diverged: %d' % (i, np.abs(a - b)[:, :, :3].max())
    d1.close()
    d2.close()

    with pytest.raises(ValueError):
        libav.write_video(str(tmp_path / 'x.avi'), src, None, 0, 2,
                          use_batch=False, transport='yuv420', **kw)
    with pytest.raises(ValueError):
        libav.write_video(str(tmp_path / 'x.avi'), src, None, 0, 2,
                          transport='nope', **kw)


def test_yuv420_studio_pack_math():
    """Device studio-range pack matches the host BT.601 formula; flat
    regions survive the chroma subsample exactly."""
    from canvas_tpu import backend
    from canvas_tpu.ops import color as color_ops
    rng = np.random.default_rng(7)
    rgba = rng.random((2, 4, 8, 16), np.float32).astype(np.float16)
    packed = np.asarray(color_ops.yuv420_pack_studio_device(
        backend.jnp.asarray(rgba)))
    # host reference: gamma45 floor-quantized u8, then studio BT.601
    u8 = np.floor(np.clip(
        np.power(rgba[:, :3].astype(np.float32), 0.45) * 255.0,
        0.0, 255.0))
    R, G, B = u8[:, 0], u8[:, 1], u8[:, 2]
    Ey = (0.299 * R + 0.587 * G + 0.114 * B) / 255.0
    Y = np.rint(np.clip(16.0 + 219.0 * Ey, 16.0, 235.0))
    got_Y = packed[:, :8 * 16].reshape(2, 8, 16).astype(np.float64)
    assert np.abs(got_Y - Y).max() <= 1.0
    # flat frame: chroma planes are constant and invertible
    flat = np.zeros((1, 4, 8, 16), np.float16)
    flat[:, 0] = 0.8
    flat[:, 1] = 0.25
    flat[:, 2] = 0.5
    flat[:, 3] = 1.0
    pf = np.asarray(color_ops.yuv420_pack_studio_device(
        backend.jnp.asarray(flat)))
    cb = pf[0, 8 * 16:8 * 16 + 4 * 8]
    cr = pf[0, 8 * 16 + 4 * 8:]
    assert cb.min() == cb.max() and cr.min() == cr.max()
    assert 16 <= cb[0] <= 240 and 16 <= cr[0] <= 240


def test_h264_available():
    """libx264 encode via avcodec (the reference's x264 module role)."""
    lib = libav._load()
    import ctypes
    lib.cav_muxer_create.restype = ctypes.c_void_p
    # just check the encoder exists by trying to add it
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 't.mkv')
        try:
            with libav.AVMuxer(path, 'matroska') as mux:
                mux.add_video_stream('libx264', (64, 48), 25,
                                     options='preset=ultrafast:crf=30')
                mux.start()
                frame = np.zeros((48, 64, 4), np.uint8)
                frame[:, :, 3] = 255
                for _ in range(5):
                    mux.write_video_frame(0, frame)
        except IOError as e:
            pytest.skip('libx264 not available: %s' % e)
        assert os.path.getsize(path) > 0

def test_video_decode_planar_capacity_retry(sample_file):
    """Undersized plane buffers must not overflow (round-1 advisor
    finding): the native layer bounds-checks against the capacities and
    the Python side grows + retries."""
    dec = libav.AVVideoDecoder(sample_file)
    dec._alloc_planes(16)     # far too small for 64x48 luma
    image = dec.get_frame(0)
    assert image is not None
    assert image[0].shape == (48, 64)
    assert dec._y.size >= 64 * 48
    # and the decoded content matches a normally-sized decode
    dec2 = libav.AVVideoDecoder(sample_file)
    image2 = dec2.get_frame(0)
    np.testing.assert_array_equal(image[0], image2[0])
    dec.close()
    dec2.close()


def test_write_video_mesh_across_segment_cut(tmp_path):
    """Sharded export (write_video(mesh=)) across a structure boundary
    with a frame count not divisible by the shard count: tail padding
    keeps parallelism, output stays frame-accurate (VERDICT item 8)."""
    import jax
    from jax.sharding import Mesh

    from canvas_tpu.sources import VideoWorkspace

    if len(jax.devices()) < 2:
        pytest.skip('needs multiple devices')
    mesh = Mesh(np.asarray(jax.devices()), ('frames',))

    ws = VideoWorkspace()
    ws.add(source=SolidColorVideoSource(
        LerpFunc((0.0, 0.0, 0.0, 1.0), (1.0, 1.0, 1.0, 1.0), 23)),
        x=0, length=23, z=0)
    # structure cut at frame 9 (green card appears) and 16 (ends)
    ws.add(source=SolidColorVideoSource((0.0, 1.0, 0.0, 1.0)),
           x=9, length=7, z=1)

    path = str(tmp_path / 'sharded.avi')
    libav.write_video(path, ws, None, 0, 23, frame_size=(64, 48),
                      frame_rate=25, video_codec='ffv1', mesh=mesh)
    assert os.path.getsize(path) > 1000

    dec = libav.AVVideoDecoder(path)
    # before the cut: ramp (frame 5 dark), inside: green dominates,
    # after: ramp again (frame 20 bright)
    f5 = dec.get_frame_rgba(5, 64, 48)
    f12 = dec.get_frame_rgba(12, 64, 48)
    f20 = dec.get_frame_rgba(20, 64, 48)
    assert int(f12[24, 32, 1]) > 200 and int(f12[24, 32, 0]) < 60
    assert int(f20[24, 32, 0]) > int(f5[24, 32, 0]) + 100
    dec.close()


def test_write_video_yuv420_mesh(tmp_path):
    """The packed 4:2:0 export transport composes with the sharded
    (mesh=) path: the pack fuses into the sharded program."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip('needs multiple devices')
    mesh = Mesh(np.asarray(jax.devices()), ('frames',))
    src = SolidColorVideoSource(
        LerpFunc((0.0, 0.0, 0.0, 1.0), (1.0, 1.0, 1.0, 1.0), 23))
    path = str(tmp_path / 'sharded_yuv.avi')
    libav.write_video(path, src, None, 0, 23, frame_size=(64, 48),
                      frame_rate=25, video_codec='mpeg4',
                      bit_rate=2_000_000, mesh=mesh, transport='yuv420')
    dec = libav.AVVideoDecoder(path)
    f5 = dec.get_frame_rgba(5, 64, 48)
    f20 = dec.get_frame_rgba(20, 64, 48)
    assert int(f20[24, 32, 0]) > int(f5[24, 32, 0]) + 100
    dec.close()


def test_video_stream_sar_and_interlacing(tmp_path):
    """add_video_stream carries sample aspect ratio + interlacing into
    the container (reference AVVideoEncoder kwargs)."""
    import fractions

    path = str(tmp_path / 'sar.mkv')
    with libav.AVMuxer(path, 'matroska') as mux:
        mux.add_video_stream('ffv1', (64, 48), 25,
                             sample_aspect_ratio=fractions.Fraction(10, 11),
                             interlaced=True, top_field_first=False)
        mux.start()
        frame = np.zeros((48, 64, 4), np.uint8)
        frame[:, :, 3] = 255
        for _ in range(3):
            mux.write_video_frame(0, frame)
    container = libav.AVContainer(path)
    video = next(s for s in container.streams if s.type == 'video')
    assert video.sample_aspect_ratio == fractions.Fraction(10, 11)
    container.close()


def test_write_video_with_audio(tmp_path):
    """write_video muxes an audio source alongside video (the
    reference's writeVideo.c audio path)."""
    import fractions

    from canvas_tpu.audio import AudioFrame

    class Tone:
        def get_frame(self, lo, hi, ch):
            t = np.arange(lo, hi + 1, dtype=np.float32)
            data = np.repeat(np.sin(2 * np.pi * 440 * t / 8000)[:, None],
                             ch, 1) * 0.5
            return AudioFrame(lo, hi, ch, data)

    path = str(tmp_path / 'av.mkv')
    src = SolidColorVideoSource(
        LerpFunc((0.0, 0.0, 0.0, 1.0), (1.0, 1.0, 1.0, 1.0), 25))
    libav.write_video(path, src, Tone(), 0, 25, frame_size=(64, 48),
                      frame_rate=25, video_codec='ffv1',
                      audio_codec='pcm_f32le', sample_rate=8000,
                      channels=2, format='matroska')
    container = libav.AVContainer(path)
    types = sorted(s.type for s in container.streams)
    assert types == ['audio', 'video']
    audio = next(s for s in container.streams if s.type == 'audio')
    assert audio.sample_rate == 8000 and audio.channels == 2
    container.close()

    # decoded audio round-trips the tone (sample-accurate pcm)
    adec = libav.AVAudioDecoder(path, channels=2)
    got = adec.get_frame(100, 1099, 2)
    t = np.arange(100, 1100, dtype=np.float32)
    want = np.sin(2 * np.pi * 440 * t / 8000) * 0.5
    np.testing.assert_allclose(np.asarray(got.data)[:, 0], want, atol=1e-4)
    adec.close()


def test_decoded_planar_path_matches_rgba_path(tmp_path):
    """Real decode through the planar (4:2:0 planes staged to device)
    path agrees with the swscale RGBA path on gray content (gray is
    matrix-invariant, isolating the shared studio-range + transfer
    semantics from color-matrix convention differences)."""
    from canvas_tpu.coded import PlanarReconstructionFilter
    from canvas_tpu.editor.plugins.libav_plugin import _RgbaDecoderSource
    from canvas_tpu.basetypes import box2i

    path = str(tmp_path / 'gray.avi')
    src = SolidColorVideoSource(
        LerpFunc((0.02, 0.02, 0.02, 1.0), (0.9, 0.9, 0.9, 1.0), 20))
    libav.write_video(path, src, None, 0, 20, frame_size=(64, 48),
                      frame_rate=25, video_codec='ffv1', format='avi')

    win = box2i(0, 0, 63, 47)
    planar = PlanarReconstructionFilter(libav.AVVideoDecoder(path),
                                        width=64, height=48)
    rgba = _RgbaDecoderSource(libav.AVVideoDecoder(path), 64, 48)
    for i in (1, 10, 18):
        a = np.asarray(planar.get_frame_f16(i, win).data, np.float32)
        b = np.asarray(rgba.get_frame_f16(i, win).data, np.float32)
        # interior pixels (chroma edges differ by filter support)
        np.testing.assert_allclose(a[:3, 4:-4, 4:-4], b[:3, 4:-4, 4:-4],
                                   atol=0.05, err_msg='frame %d' % i)

    # and the batched path matches the eager planar pull
    from canvas_tpu import render
    got = render.render_frames(planar, win, 0, 3)
    want = np.stack([np.asarray(planar.get_frame_f16(i, win).data)
                     for i in range(3)])
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=1e-2)


def test_write_video_aac_audio_partial_frames(tmp_path):
    """write_video with a FIXED-frame-size audio codec (aac, 1024):
    per-batch sample counts that don't divide 1024 must buffer tails
    across batches instead of sending short non-final frames (which
    ffmpeg rejects on the next send). Regression: the default NTSC
    frame rate makes every batch a non-multiple."""
    from canvas_tpu.audio import AudioFrame
    from canvas_tpu.framefuncs import LerpFunc
    from canvas_tpu.sources import SolidColorVideoSource

    class Tone:
        def get_frame(self, lo, hi, ch):
            t = np.arange(lo, hi + 1, dtype=np.float32)
            data = np.repeat(np.sin(2 * np.pi * 440 * t / 48000)[:, None],
                             ch, 1) * 0.5
            return AudioFrame(lo, hi, ch, data)

    path = str(tmp_path / 'aac.mkv')
    src = SolidColorVideoSource(
        LerpFunc((0.0, 0.0, 0.0, 1.0), (1.0, 1.0, 1.0, 1.0), 40))
    # float frame rate exercises the Fraction normalization too
    libav.write_video(path, src, Tone(), 0, 40, frame_size=(64, 48),
                      frame_rate=30000 / 1001, video_codec='ffv1',
                      audio_codec='aac', sample_rate=48000,
                      channels=2, format='matroska')
    container = libav.AVContainer(path)
    audio = next(s for s in container.streams if s.type == 'audio')
    assert audio.codec == 'aac'
    container.close()
    # all batches' samples made it through (aac pads the final frame;
    # 40 NTSC frames at 48 kHz is ~64064 samples)
    adec = libav.AVAudioDecoder(path, channels=2)
    got = adec.get_frame(60000, 63000, 2)
    assert np.abs(np.asarray(got.data)).max() > 0.1
    adec.close()


def test_write_video_window_mismatch_rejected(tmp_path):
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.sources import SolidColorVideoSource

    with pytest.raises(ValueError):
        libav.write_video(str(tmp_path / 'x.avi'),
                          SolidColorVideoSource((1, 0, 0, 1)), None, 0, 4,
                          frame_size=(64, 48),
                          window=box2i(0, 0, 31, 23))


def test_muxer_rejects_mismatched_shapes(tmp_path):
    """The native layer reads geometry-sized buffers from raw pointers;
    the Python face must reject wrong-shaped arrays instead of letting
    C read out of bounds."""
    import numpy as np
    import pytest
    from canvas_tpu import libav

    path = str(tmp_path / 'shape.avi')
    mux = libav.AVMuxer(path, 'avi')
    v = mux.add_video_stream('mpeg4', (320, 240), 25)
    a = mux.add_audio_stream('pcm_s16le', 48000, 2)
    mux.start()
    with pytest.raises(ValueError):
        mux.write_video_frame(v, np.zeros((120, 160, 4), np.uint8))
    with pytest.raises(ValueError):
        mux.write_audio_frame(a, np.zeros((64, 1), np.float32))
    mux.write_video_frame(v, np.zeros((240, 320, 4), np.uint8))
    mux.write_audio_frame(a, np.zeros((64, 2), np.float32))
    mux.close()


def test_planar_muxer_rejects_short_planes(tmp_path):
    import numpy as np
    import pytest
    from canvas_tpu import libav

    path = str(tmp_path / 'planar.avi')
    mux = libav.AVMuxer(path, 'avi')
    v = mux.add_video_stream('mpeg4', (320, 240), 25)
    mux.start()
    with pytest.raises(ValueError):
        mux.write_video_frame_planar(
            v, np.zeros((240, 320), np.uint8),
            np.zeros((60, 160), np.uint8),    # half the chroma rows
            np.zeros((60, 160), np.uint8))
    mux.write_video_frame_planar(
        v, np.zeros((240, 320), np.uint8),
        np.zeros((120, 160), np.uint8), np.zeros((120, 160), np.uint8))
    mux.close()


def test_write_video_requires_audio_codec(tmp_path):
    import pytest
    from canvas_tpu import libav
    import numpy as np
    from canvas_tpu.audio import AudioFrame
    from canvas_tpu.sources import SolidColorVideoSource

    silent = AudioFrame(0, 9600, 2, data=np.zeros((9601, 2), np.float32))
    with pytest.raises(ValueError, match='audio_codec'):
        libav.write_video(str(tmp_path / 'x.avi'),
                          SolidColorVideoSource((1, 0, 0, 1)),
                          silent, 0, 2,
                          frame_size=(64, 48), format='avi')


def test_planar_encoder_rejects_short_planes():
    """cav_encoder_send_planar validates row counts (it reads
    codec-geometry rows from the caller's buffers)."""
    import numpy as np
    import pytest
    from canvas_tpu.coded import CodedImage, CodedImageSource
    from canvas_tpu.libav import AVPlanarVideoEncoder

    class Short(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            y = np.zeros((480, 720), np.uint8)
            c = np.zeros((240, 180), np.uint8)   # half the 4:1:1 rows
            return CodedImage([y, c, c])

    enc = AVPlanarVideoEncoder(Short(), 0, 3, codec='dvvideo')
    with pytest.raises(ValueError):
        while enc.get_next_packet() is not None:
            pass


def test_write_video_eager_path_matches_batched(tmp_path):
    """use_batch=False exports through per-frame eager pulls
    (writeVideo.c's serial shape); output matches the batched planner
    export frame-for-frame within codec noise."""
    src = SolidColorVideoSource(
        LerpFunc((0.0, 0.2, 0.8, 1.0), (0.8, 0.6, 0.1, 1.0), 25))
    kw = dict(frame_size=(64, 48), frame_rate=25, video_codec='mpeg4',
              bit_rate=2_000_000)
    p_batch = str(tmp_path / 'batched.avi')
    p_eager = str(tmp_path / 'eager.avi')
    libav.write_video(p_batch, src, None, 0, 25, **kw)
    libav.write_video(p_eager, src, None, 0, 25, use_batch=False, **kw)
    d1 = libav.AVVideoDecoder(p_batch)
    d2 = libav.AVVideoDecoder(p_eager)
    for i in (0, 12, 24):
        a = d1.get_frame_rgba(i, 64, 48).astype(np.int16)
        b = d2.get_frame_rgba(i, 64, 48).astype(np.int16)
        assert np.abs(a - b)[:, :, :3].max() <= 4
    d1.close()
    d2.close()


def test_frame_rate_specs():
    """write_video rate specs: (n, d) tuple / list / v2i / float /
    Fraction all resolve to an exact rational (floats snap to a sane
    denominator for avcodec)."""
    from fractions import Fraction
    from canvas_tpu.basetypes import v2i
    from canvas_tpu.libav import _as_frame_rate
    assert _as_frame_rate((30000, 1001)) == Fraction(30000, 1001)
    assert _as_frame_rate([25, 1]) == 25
    assert _as_frame_rate(v2i(30000, 1001)) == Fraction(30000, 1001)
    assert _as_frame_rate(30000 / 1001) == Fraction(30000, 1001)
    assert _as_frame_rate(Fraction(24)) == 24


def test_copy_mux_run_guards(tmp_path):
    """Stream-copy muxing edge cases: run() without copy streams is an
    error; run() after the container header was written (an encoding
    stream auto-started the mux) raises instead of silently writing a
    file whose extradata never landed."""
    from fractions import Fraction

    src_path = str(tmp_path / 'src.avi')
    with libav.AVMuxer(src_path) as mux:
        v = mux.add_video_stream('mpeg4', (64, 48), 25, bit_rate=400_000)
        frame = np.zeros((48, 64, 4), np.uint8)
        frame[..., 3] = 255
        for _ in range(3):
            mux.write_video_frame(v, frame)

    out = str(tmp_path / 'out.avi')
    mux = libav.AVMuxer(out, 'avi')
    with pytest.raises(RuntimeError):
        mux.run()                      # no copy streams

    demux = libav.AVDemuxer(src_path, 0)
    mux.add_video_stream(demux, 'mpeg4', frame_rate=Fraction(25),
                         frame_size=(64, 48))
    mux.start()                        # simulate premature header write
    with pytest.raises(RuntimeError):
        mux.run()
    mux.close()

    # and the happy path still remuxes
    demux2 = libav.AVDemuxer(src_path, 0)
    out2 = str(tmp_path / 'out2.avi')
    mux2 = libav.AVMuxer(out2, 'avi')
    mux2.add_video_stream(demux2, 'mpeg4', frame_rate=Fraction(25),
                          frame_size=(64, 48))
    mux2.run()
    c = libav.AVContainer(out2)
    assert [s.type for s in c.streams] == ['video']
    c.close()
