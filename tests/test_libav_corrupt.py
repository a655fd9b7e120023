"""Corrupt/truncated media must surface as Python exceptions (or
degraded-but-sane output), never as native crashes.

The reference's libav layer inherits libav's own resilience; our
native layer (native/canvas_av.cpp) owns the demuxer and frame
buffers, so bounds bugs in its plane copies or packet loops would
show up exactly here. These run in-process via ctypes — a native
fault would take down the test runner, which is the assertion; the
ASAN self-test (tests/test_native_asan.py) covers the same library
under the sanitizer.
"""

import math
import os

import numpy as np
import pytest

libav = pytest.importorskip('canvas_tpu.libav')

if not libav.available():
    pytest.skip('native canvas_av unavailable', allow_module_level=True)


@pytest.fixture(scope='module')
def good_file(tmp_path_factory):
    """A small mpeg4/avi file with video + pcm audio (same recipe as
    test_libav.sample_file)."""
    path = str(tmp_path_factory.mktemp('media') / 'good.avi')
    with libav.AVMuxer(path) as mux:
        v = mux.add_video_stream('mpeg4', (64, 48), 25, bit_rate=400_000)
        a = mux.add_audio_stream('pcm_s16le', 8000, 1)
        mux.start()
        for i in range(25):
            frame = np.zeros((48, 64, 4), np.uint8)
            frame[:, :, 0] = min(255, i * 10)
            frame[:, :, 3] = 255
            mux.write_video_frame(v, frame)
        t = np.arange(8000, dtype=np.float32) / 8000.0
        tone = (0.5 * np.sin(2 * math.pi * 440 * t)).astype(np.float32)
        mux.write_audio_frame(a, tone.reshape(-1, 1))
    return path


def _drain(path, max_packets=2000):
    """Open, probe, demux and decode everything that will come out.
    Returns (n_packets, n_frames); exceptions propagate to the caller."""
    container = libav.AVContainer(path)
    video = [s for s in container.streams if s.type == 'video']
    container.close()

    demux = libav.AVDemuxer(path, 0)
    n = 0
    while demux.get_next_packet() is not None and n < max_packets:
        n += 1
    demux.close()

    frames = 0
    if video:
        dec = libav.AVVideoDecoder(path, stream=0)
        try:
            for i in range(30):
                if dec.get_frame(i) is None:
                    break
                frames += 1
        finally:
            dec.close()
    return n, frames


def test_missing_file_raises():
    with pytest.raises(IOError):
        libav.AVContainer('/nonexistent/not_here.avi')
    with pytest.raises(IOError):
        libav.AVDemuxer('/nonexistent/not_here.avi', 0)


def test_empty_file_raises(tmp_path):
    path = str(tmp_path / 'empty.avi')
    open(path, 'wb').close()
    with pytest.raises(IOError):
        _drain(path)


def test_garbage_bytes_raise(tmp_path):
    rng = np.random.default_rng(23)
    path = str(tmp_path / 'garbage.avi')
    with open(path, 'wb') as f:
        f.write(rng.integers(0, 256, 65536, dtype=np.uint8).tobytes())
    with pytest.raises((IOError, ValueError)):
        _drain(path)


def test_truncations_never_crash(good_file, tmp_path):
    """Cut the file at a spread of byte offsets — header-only, mid-
    header, mid-packet, near-complete. Every cut must either raise a
    Python error or deliver a shortened stream."""
    data = open(good_file, 'rb').read()
    cuts = [1, 8, 64, 256, len(data) // 16, len(data) // 4,
            len(data) // 2, len(data) - 100, len(data) - 1]
    survived = 0
    for cut in cuts:
        path = str(tmp_path / ('trunc_%d.avi' % cut))
        with open(path, 'wb') as f:
            f.write(data[:cut])
        try:
            n, frames = _drain(path)
        except (IOError, ValueError):
            continue
        assert frames <= 25
        survived += 1
    # the near-complete cuts should still play something
    assert survived >= 1


def test_bitflip_fuzz_never_crashes(good_file, tmp_path):
    """Flip random bytes throughout the body (headers included) across
    seeds; decoding must conceal, shorten, or raise — never fault.
    CANVAS_FUZZ_SEEDS widens the sweep like the render fuzz suites."""
    data = bytearray(open(good_file, 'rb').read())
    rng = np.random.default_rng(29)
    rounds = int(os.environ.get('CANVAS_FUZZ_SEEDS', '8'))
    for r in range(rounds):
        corrupted = bytearray(data)
        for _ in range(rng.integers(1, 40)):
            pos = int(rng.integers(0, len(corrupted)))
            corrupted[pos] = int(rng.integers(0, 256))
        path = str(tmp_path / ('flip_%d.avi' % r))
        with open(path, 'wb') as f:
            f.write(bytes(corrupted))
        try:
            n, frames = _drain(path)
            assert frames <= 30
        except (IOError, ValueError):
            pass


def test_seek_on_truncated_file(good_file, tmp_path):
    """Seeking past the cut must error or return None frames, not
    fault or loop forever."""
    data = open(good_file, 'rb').read()
    path = str(tmp_path / 'half.avi')
    with open(path, 'wb') as f:
        f.write(data[:len(data) // 2])
    try:
        dec = libav.AVVideoDecoder(path, stream=0)
    except (IOError, ValueError):
        return
    try:
        for i in (0, 20, 24, 5):
            try:
                dec.get_frame(i)
            except (IOError, ValueError):
                pass
    finally:
        dec.close()
