"""Audio engine semantics.

Kernel cases ported from the reference's C suite
(/root/reference/src/tests/test_audio_mix.c) — same data, offsets, and
expected windows/values — plus source/sequence/workspace behavior
(tests mirroring src/process/Audio*.c usage)."""

import numpy as np
import pytest

from canvas_tpu import audio
from canvas_tpu.audio import (AudioFrame, AudioPassThroughFilter,
                              AudioSequence, AudioSource, AudioWorkspace,
                              attenuate, copy_frame, copy_frame_attenuate,
                              mix_add, mix_add_pull, overwrite_frame)


def frame(full_min, full_max, channels, data=None, cur=None):
    f = AudioFrame(full_min, full_max, channels,
                   data=np.asarray(data, dtype=np.float32) if data is not None else None)
    if cur is not None:
        f.current_min_sample, f.current_max_sample = cur
    return f


def col(f):
    """Flat mono view of a frame's buffer."""
    return f.data[:, 0].tolist()


class TestCopyFrame:
    def test_basic_expand(self):
        # test_copy_frame_basic_expand (test_audio_mix.c:27-56)
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1)
        copy_frame(out, in_, 0)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)
        assert col(out)[1:6] == [0, 1, 2, 3, 4]

    def test_basic_offset(self):
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1)
        copy_frame(out, in_, 3)
        assert (out.current_min_sample, out.current_max_sample) == (1, 3)
        # out[s] = in[s + 3] for s in 1..3 -> in samples 4..6 = 2,3,4
        assert col(out)[0:3] == [2, 3, 4]

    def test_stereo_reduce_channels(self):
        in_ = frame(2, 6, 2, data=[[0, 1], [2, 3], [4, 5], [6, 7], [8, 9]])
        out = frame(2, 6, 1)
        copy_frame(out, in_, 0)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)
        assert col(out) == [0, 2, 4, 6, 8]

    def test_stereo_expand_channels(self):
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(2, 6, 2)
        copy_frame(out, in_, 0)
        assert out.data[:, 0].tolist() == [0, 1, 2, 3, 4]
        assert out.data[:, 1].tolist() == [0, 0, 0, 0, 0]

    def test_no_overlap_empty(self):
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1)
        copy_frame(out, in_, 100)
        assert out.empty


class TestCopyFrameAttenuate:
    def test_basic(self):
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1)
        copy_frame_attenuate(out, in_, 0.5, 0)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)
        assert col(out)[1:6] == [0, 0.5, 1, 1.5, 2]

    def test_zero_factor_empties(self):
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1)
        copy_frame_attenuate(out, in_, 0.0, 0)
        # exact C convention: current = [0, -1] (audio_mix.c:56-59)
        assert (out.current_min_sample, out.current_max_sample) == (0, -1)

    def test_factor_one_is_copy(self):
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1)
        copy_frame_attenuate(out, in_, 1.0, 0)
        assert col(out)[1:6] == [0, 1, 2, 3, 4]


class TestOverwriteFrame:
    def test_basic(self):
        # out keeps its own data where in doesn't cover
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1, data=[9, 9, 9, 9, 9, 9, 9])
        overwrite_frame(out, in_, 0)
        assert (out.current_min_sample, out.current_max_sample) == (1, 7)
        assert col(out) == [9, 0, 1, 2, 3, 4, 9]

    def test_basic_expand(self):
        in_ = frame(1, 7, 1, data=[0, 0, 1, 2, 3, 4, 16], cur=(2, 6))
        out = frame(1, 7, 1, data=[9, 9, 9, 9, 9, 9, 9])
        overwrite_frame(out, in_, 0)
        assert (out.current_min_sample, out.current_max_sample) == (1, 7)
        assert col(out) == [9, 0, 1, 2, 3, 4, 9]

    def test_1ch_to_2ch(self):
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 2, data=[[9, 8]] * 7)
        overwrite_frame(out, in_, 0)
        assert (out.current_min_sample, out.current_max_sample) == (1, 7)
        assert out.data[0].tolist() == [9, 8]
        assert out.data[6].tolist() == [9, 8]
        for s in range(2, 7):
            assert out.sample(s, 0) == s - 2
            assert out.sample(s, 1) == 0.0

    def test_away(self):
        # Source lands entirely outside out's full window: no-op
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1, data=[9] * 7, cur=(2, 6))
        overwrite_frame(out, in_, -7)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)
        assert col(out)[1:6] == [9] * 5
        overwrite_frame(out, in_, 7)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)
        assert col(out)[1:6] == [9] * 5

    def test_overlap_gap_silenced(self):
        # test_overwrite_frame_overlap (test_audio_mix.c:446-491)
        in_ = frame(-2, 2, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1, data=[9] * 7, cur=(4, 6))
        overwrite_frame(out, in_, 0)
        assert (out.current_min_sample, out.current_max_sample) == (1, 6)
        assert out.sample(1, 0) == 3.0 and out.sample(2, 0) == 4.0
        assert out.sample(3, 0) == 0.0          # silenced gap
        assert [out.sample(s, 0) for s in (4, 5, 6)] == [9, 9, 9]

    def test_empty_in_noop(self):
        in_ = frame(2, 6, 1, data=[0, 1, 2, 3, 4], cur=(4, 3))
        out = frame(1, 7, 1, data=[9] * 7, cur=(2, 6))
        overwrite_frame(out, in_, 0)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)


class TestAttenuate:
    def test_basic(self):
        f = frame(0, 4, 1, data=[1, 2, 3, 4, 5])
        attenuate(f, 0.5)
        assert col(f) == [0.5, 1, 1.5, 2, 2.5]

    def test_zero_empties(self):
        f = frame(0, 4, 1, data=[1, 2, 3, 4, 5])
        attenuate(f, 0.0)
        assert (f.current_min_sample, f.current_max_sample) == (0, -1)


class TestMixAdd:
    def test_basic(self):
        # test_add_basic (test_audio_mix.c:493-525)
        a = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1, data=[9, 5, 4, 3, 2, 1, 9], cur=(2, 6))
        mix_add(out, a, 1.0, 0)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)
        assert col(out)[1:6] == [5, 5, 5, 5, 5]

    def test_empty_in(self):
        a = frame(2, 6, 1, data=[12] * 5, cur=(4, 3))
        out = frame(1, 7, 1, data=[9, 0, 1, 2, 3, 4, 9], cur=(2, 6))
        mix_add(out, a, 1.0, 0)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)
        assert col(out)[1:6] == [0, 1, 2, 3, 4]

    def test_zero_mix(self):
        a = frame(2, 6, 1, data=[12] * 5)
        out = frame(1, 7, 1, data=[9, 0, 1, 2, 3, 4, 9], cur=(2, 6))
        mix_add(out, a, 0.0, 0)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)
        assert col(out)[1:6] == [0, 1, 2, 3, 4]

    def test_empty_out(self):
        a = frame(2, 6, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1, data=[9] * 7, cur=(5, 4))
        mix_add(out, a, 1.0, 0)
        assert (out.current_min_sample, out.current_max_sample) == (2, 6)
        assert col(out)[1:6] == [0, 1, 2, 3, 4]

    def test_offset_window_extends_left(self):
        # test_add_basic_offset (test_audio_mix.c:624-658)
        a = frame(1, 5, 1, data=[0, 1, 2, 3, 4])
        out = frame(1, 7, 1, data=[9, 9, 5, 4, 3, 2, 1], cur=(3, 7))
        mix_add(out, a, 1.0, 0)
        assert (out.current_min_sample, out.current_max_sample) == (1, 7)
        assert col(out) == [0, 1, 7, 7, 7, 2, 1]

    def test_offset_attenuate(self):
        # test_add_basic_offset_attenuate (test_audio_mix.c:660-699)
        a = frame(6, 10, 1, data=[0.5, 1, 2, 3, 4])
        out = frame(1, 7, 1, data=[9, 9, 10, 8, 6, 4, 2], cur=(3, 7))
        mix_add(out, a, 0.5, 5)
        assert (out.current_min_sample, out.current_max_sample) == (1, 7)
        assert col(out) == [0.25, 0.5, 11, 9.5, 8, 4, 2]


class ConstSource(AudioSource):
    """Fills the full requested range with a constant (test fixture)."""

    def __init__(self, value, channels=None):
        self.value = value
        self.channels = channels

    def _render(self, f):
        f.data[:] = 0.0
        ch = f.channels if self.channels is None else min(self.channels, f.channels)
        f.data[:, :ch] = self.value
        f.current_min_sample = f.full_min_sample
        f.current_max_sample = f.full_max_sample


class RampSource(AudioSource):
    """sample value == absolute sample number (test fixture)."""

    def _render(self, f):
        n = f.full_max_sample - f.full_min_sample + 1
        ramp = np.arange(f.full_min_sample, f.full_min_sample + n,
                         dtype=np.float32)
        f.data[:] = ramp[:, None]
        f.current_min_sample = f.full_min_sample
        f.current_max_sample = f.full_max_sample


class TestMixAddPull:
    def test_basic(self):
        a = RampSource()
        out = frame(1, 7, 1, data=[9, 5, 4, 3, 2, 1, 9], cur=(2, 6))
        mix_add_pull(out, a, 1.0, 0)
        # ramp 1..7 added over the full window; window extends to [1,7]
        assert (out.current_min_sample, out.current_max_sample) == (1, 7)
        assert col(out) == [1 + 9 * 0, 5 + 2, 4 + 3, 3 + 4, 2 + 5, 1 + 6, 7]

    def test_empty_out_direct(self):
        a = RampSource()
        out = frame(10, 14, 1)
        mix_add_pull(out, a, 0.5, 3)
        # pulled at samples 13..17, rebased back to 10..14, halved
        assert (out.current_min_sample, out.current_max_sample) == (10, 14)
        assert col(out) == [6.5, 7, 7.5, 8, 8.5]

    def test_zero_mix_on_empty(self):
        a = RampSource()
        out = frame(0, 4, 1)
        mix_add_pull(out, a, 0.0, 0)
        assert out.empty


class TestAudioFrameAPI:
    def test_sample_outside_window(self):
        f = frame(0, 4, 2, data=[[1, 2]] * 5, cur=(1, 3))
        assert f.sample(0, 0) is None
        assert f.sample(2, 1) == 2.0
        with pytest.raises(IndexError):
            f.sample(2, 5)

    def test_frame_as_source(self):
        f = frame(0, 4, 1, data=[1, 2, 3, 4, 5])
        out = f.get_frame(2, 6, 1)
        assert (out.current_min_sample, out.current_max_sample) == (2, 4)
        assert out.sample(2, 0) == 3.0

    def test_validation(self):
        with pytest.raises(ValueError):
            AudioFrame(5, 4, 1)


class TestPassThrough:
    def test_delegates(self):
        f = AudioPassThroughFilter(ConstSource(0.5))
        out = f.get_frame(0, 3, 2)
        assert out.sample(0, 1) == 0.5

    def test_none_source(self):
        f = AudioPassThroughFilter(None)
        assert f.get_frame(0, 3, 1).empty


class TestAudioSequence:
    def test_lookup_and_offset(self):
        seq = AudioSequence()
        seq.append((RampSource(), 100, 10))   # timeline 0..9 -> source 100..109
        seq.append((ConstSource(5.0), 0, 10))  # timeline 10..19

        out = seq.get_frame(0, 19, 1)
        assert (out.current_min_sample, out.current_max_sample) == (0, 19)
        assert out.sample(0, 0) == 100.0
        assert out.sample(9, 0) == 109.0
        assert out.sample(10, 0) == 5.0

    def test_get_start_sample(self):
        seq = AudioSequence([(ConstSource(1.0), 0, 7), (ConstSource(2.0), 0, 3)])
        assert seq.get_start_sample(0) == 0
        assert seq.get_start_sample(1) == 7
        assert len(seq) == 2

    def test_partial_range(self):
        seq = AudioSequence([(RampSource(), 0, 10)])
        out = seq.get_frame(5, 30, 1)
        # only 5..9 available
        assert (out.current_min_sample, out.current_max_sample) == (5, 9)
        assert out.sample(7, 0) == 7.0

    def test_negative_clamped(self):
        seq = AudioSequence([(ConstSource(1.0), 0, 10)])
        out = seq.get_frame(-5, 5, 1)
        assert out.current_min_sample == 0
        assert out.sample(0, 0) == 1.0


class TestAudioWorkspace:
    def test_single_item(self):
        ws = AudioWorkspace()
        ws.add(source=ConstSource(1.0), x=10, length=20, offset=0)
        out = ws.get_frame(0, 39, 1)
        assert (out.current_min_sample, out.current_max_sample) == (10, 29)
        assert out.sample(5, 0) is None
        assert out.sample(15, 0) == 1.0

    def test_overlap_adds(self):
        ws = AudioWorkspace()
        ws.add(source=ConstSource(1.0), x=0, length=20)
        ws.add(source=ConstSource(0.25), x=10, length=20)
        out = ws.get_frame(0, 29, 1)
        assert out.sample(5, 0) == 1.0
        assert out.sample(15, 0) == 1.25
        assert out.sample(25, 0) == 0.25

    def test_offset_mapping(self):
        # audio workspace pulls source at s - x + offset — the video
        # convention; the reference's audio line inverts offset against
        # its own video path (workspace.c:655, a latent bug there — see
        # AudioWorkspace._render)
        ws = AudioWorkspace()
        ws.add(source=RampSource(), x=10, length=10, offset=5)
        out = ws.get_frame(10, 19, 1)
        assert out.sample(10, 0) == 5.0
        assert out.sample(19, 0) == 14.0

    def test_remove(self):
        ws = AudioWorkspace()
        item = ws.add(source=ConstSource(1.0), x=0, length=10)
        ws.remove(item)
        assert ws.get_frame(0, 9, 1).empty
