"""Run the reference's OWN encode/decode scripts verbatim.

Completes the BASELINE north star ("the editor, test_packets.py, and
the encode scripts run unchanged"): each test executes a script from
``/root/reference/scripts`` byte-for-byte (runpy in a subprocess, cwd a
temp dir, the fluggo compat namespace on sys.path) against a generated
DV tape, then validates the artifact the script wrote.

Covered verbatim: encode-video.py (the full A/V interleaved mkv
pipeline), encode_x264_mkv.py, encode_faac_mkv.py, write_raw_audio.py,
decode_raw_image.py, probe.  Excluded:
``encode_x264_faac_mkv.py`` hardcodes its tape's 1-hour range
(min/max_sample 0..177163458, scripts/encode_x264_faac_mkv.py:42) and
the reference encoder is "honor-bound to encode silence" to end_sample
(AACAudioEncoder.c:176-181), so the script runs for ~an hour on ANY
short input — against the reference too; its entire API surface is the
union of the covered encode scripts.  ``test_audio.py`` decodes from
a LIVE encoder packet source (our decoders are file-backed); its role
is covered by scripts/test_audio.py + test_audio_script_end_to_end.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

libav = pytest.importorskip('canvas_tpu.libav')
if not libav.available():
    pytest.skip('native canvas_av unavailable', allow_module_level=True)

REF_SCRIPTS = '/root/reference/scripts'


@pytest.fixture(scope='module')
def dv_tape(tmp_path_factory):
    """A DV container with video stream 0 + 48k stereo audio stream 1
    (what the reference scripts expect of sys.argv[1])."""
    from fractions import Fraction
    path = str(tmp_path_factory.mktemp('refscripts') / 'tape.dv')
    try:
        mux = libav.AVMuxer(path, format='dv')
        v = mux.add_video_stream('dvvideo', (720, 480),
                                 Fraction(30000, 1001))
        a = mux.add_audio_stream('pcm_s16le', 48000, 2)
    except IOError as e:
        pytest.skip('dv muxer unavailable: %s' % e)
    rgba = np.zeros((480, 720, 4), np.uint8)
    rgba[..., 3] = 255
    t = np.arange(48000 * 10 * 1001 // 30000 + 10)
    tone = (0.4 * np.sin(2 * np.pi * 440.0 * t / 48000)).astype(np.float32)
    stereo = np.stack([tone, -tone], axis=1)
    pos = 0
    with mux:
        for i in range(10):
            rgba[..., 1] = 40 + 20 * i
            mux.write_video_frame(v, rgba)
            upto = int(48000 * (i + 1) * 1001 // 30000)
            mux.write_audio_frame(a, stereo[pos:upto])
            pos = upto
    return path


def _run_ref_script(name, workdir, *argv):
    env = dict(os.environ, CANVAS_FORCE_CPU='1')
    code = (
        'import sys, runpy\n'
        'sys.path.insert(0, %r)\n'
        'sys.argv = [%r] + %r\n'
        'runpy.run_path(%r, run_name="__main__")\n'
        % ('/root/repo', name, list(argv),
           os.path.join(REF_SCRIPTS, name)))
    # 1200 s: the subprocess pays its own cold XLA CPU compiles for the
    # filter chains; under a loaded host (parallel suite runs, fuzz
    # soaks) 600 s was observed to trip while the script itself is
    # healthy.
    result = subprocess.run([sys.executable, '-c', code],
                            capture_output=True, text=True,
                            cwd=str(workdir), env=env, timeout=1200)
    assert result.returncode == 0, result.stderr[-3000:]
    return result


def test_encode_x264_mkv_verbatim(dv_tape, tmp_path):
    _run_ref_script('encode_x264_mkv.py', tmp_path, dv_tape)
    out = str(tmp_path / 'test.mkv')
    c = libav.AVContainer(out)
    video = next(s for s in c.streams if s.type == 'video')
    assert video.codec == 'h264'
    c.close()
    dec = libav.AVVideoDecoder(out)
    f0 = dec.get_frame_rgba(0, 720, 480)
    f9 = dec.get_frame_rgba(9, 720, 480)
    assert f0 is not None and f9 is not None
    # the green ramp written into the tape survives the full chain
    # (DV decode -> DVReconstruction -> MPEG2Subsample -> x264 -> mkv)
    assert int(f9[240, 360, 1]) > int(f0[240, 360, 1]) + 100
    dec.close()


def test_encode_faac_mkv_verbatim(dv_tape, tmp_path):
    _run_ref_script('encode_faac_mkv.py', tmp_path, dv_tape)
    out = str(tmp_path / 'test_audio.mkv')
    c = libav.AVContainer(out)
    audio = next(s for s in c.streams if s.type == 'audio')
    assert audio.codec == 'aac'
    assert audio.sample_rate == 48000
    c.close()


def test_write_raw_audio_verbatim(dv_tape, tmp_path):
    _run_ref_script('write_raw_audio.py', tmp_path, dv_tape)
    out = str(tmp_path / 'test_pcm.mkv')
    assert os.path.getsize(out) > 100_000
    dec = libav.AVAudioDecoder(out, channels=2)
    frame = dec.get_frame(1000, 2000, 2)
    got = np.asarray(frame.data)
    # float PCM round trip: sample-exact up to the DV mux cadence —
    # avformat distributes samples on its own 1600/1602 cadence, so
    # decoded positions jitter a few samples and isolated cadence
    # dropouts appear at frame boundaries; assert PIECEWISE accuracy
    # like test_dv_audio_end_to_end (>= 75% of 128-sample chunks match
    # at some small constant shift).
    wave = 0.4 * np.sin(2 * np.pi * 440.0 * np.arange(0, 4000) / 48000)
    chunk = 128
    passed = total = 0
    for c0 in range(0, 900 - chunk + 1, chunk):
        total += 1
        ok = False
        for s in range(-6, 7):
            lo = 1000 + c0 + s
            if lo < 0:
                continue
            err = np.abs(got[c0:c0 + chunk, 0] -
                         wave[lo:lo + chunk]).max()
            if err <= 1e-3:
                ok = True
                break
        passed += ok
    assert total and passed >= 0.75 * total, (passed, total)
    dec.close()


def test_decode_raw_image_verbatim(dv_tape, tmp_path):
    pytest.importorskip('PIL')
    _run_ref_script('decode_raw_image.py', tmp_path, dv_tape)
    from PIL import Image
    for name, shape in (('plane_luma.png', (480, 720)),
                        ('plane_cb.png', (240, 360)),   # 4:2:0 chroma
                        ('plane_cr.png', (240, 360))):
        img = np.asarray(Image.open(str(tmp_path / name)))
        assert img.shape == shape, (name, img.shape)


def test_probe_verbatim(dv_tape, tmp_path):
    """The reference's `probe` script (no .py suffix) runs verbatim and
    prints the full container/stream report (exercises the round-5
    AVContainer/AVStream metadata getters: format_long_name, duration,
    stream id/encoding/bit_rate/time_base)."""
    env = dict(os.environ, CANVAS_FORCE_CPU='1')
    code = (
        'import sys, runpy\n'
        "sys.path.insert(0, '/root/repo')\n"
        'sys.argv = ["probe", %r]\n'
        "runpy.run_path('/root/reference/probe', run_name='__main__')\n"
        % dv_tape)
    result = subprocess.run([sys.executable, '-c', code],
                            capture_output=True, text=True,
                            cwd=str(tmp_path), env=env, timeout=300)
    assert result.returncode == 0, result.stderr[-2000:]
    out = result.stdout
    assert 'Format: DV (Digital Video) (dv)' in out
    assert 'Stream #0 (video)' in out
    assert 'Stream #1 (audio)' in out
    assert 'Codec: dvvideo' in out
    assert 'Encoding: PCM signed 16-bit little-endian' in out
    assert 'Sample rate: 48000 Hz' in out


def test_encode_video_verbatim(dv_tape, tmp_path):
    """scripts/encode-video.py — the reference's most complete script:
    argparse CLI, AVContainer probing for ranges, DVAudioDecoder over
    the VIDEO packet stream (DV AAUX), x264 + AAC encoders pumped
    through the interleaved MatroskaWriter loop with Tags, progress
    API. Runs byte-for-byte; output must decode as an A/V mkv."""
    label = dv_tape.replace('.dv', '.label')
    with open(label, 'w') as f:
        f.write('acceptance tape description')
    out = str(tmp_path / 'out_ev.mkv')
    _run_ref_script('encode-video.py', tmp_path, dv_tape, out,
                    '--preset', 'ultrafast')
    c = libav.AVContainer(out)
    kinds = sorted((s.type, s.codec) for s in c.streams)
    assert kinds == [('audio', 'aac'), ('video', 'h264')], kinds
    c.close()
    dec = libav.AVVideoDecoder(out)
    f0 = dec.get_frame_rgba(0, 720, 480)
    f9 = dec.get_frame_rgba(9, 720, 480)
    assert int(f9[240, 360, 1]) > int(f0[240, 360, 1]) + 100
    dec.close()
