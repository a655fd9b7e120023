"""Property fuzz for the audio engine.

Invariants from the reference's audio kernels (audio_mix.c):
- the workspace's additive mix equals the clipped sum of its items'
  frames (workspace.c:615-676);
- attenuation is linear (audio_copy_frame_attenuate);
- a sequence's samples equal the mapped item pulls.
"""

import numpy as np
import pytest

from canvas_tpu import audio


class ToneSource(audio.AudioSource):
    """sin(2*pi*f*n/1000) per channel with a channel phase offset."""

    def __init__(self, freq, channels=2):
        self.freq = float(freq)
        self.channels = channels

    def _render(self, frame):
        n = np.arange(frame.full_min_sample, frame.full_max_sample + 1,
                      dtype=np.float64)
        data = np.stack([
            np.sin(2 * np.pi * self.freq * n / 1000.0 + 0.3 * c)
            for c in range(frame.channels)], axis=1).astype(np.float32)
        frame.data = data
        frame.current_min_sample = frame.full_min_sample
        frame.current_max_sample = frame.full_max_sample


def frame_array(source, lo, hi, channels):
    """Samples [lo, hi] as a dense array (frame data spans the full
    window; zeros outside current)."""
    f = source.get_frame(lo, hi, channels)
    out = np.zeros((hi - lo + 1, channels), np.float32)
    if f.current_min_sample > f.current_max_sample:
        return out
    data = np.asarray(f.data, np.float32)
    c0 = f.current_min_sample - lo
    c1 = f.current_max_sample - lo
    out[c0:c1 + 1] = data[c0:c1 + 1, :channels]
    return out


@pytest.mark.parametrize('seed', range(8))
def test_workspace_additive_mix_matches_sum(seed):
    rng = np.random.RandomState(seed)
    ws = audio.AudioWorkspace()
    items = []
    for z in range(rng.randint(1, 6)):
        src = ToneSource(float(rng.randint(50, 400)),
                         channels=int(rng.randint(1, 3)))
        item = dict(source=src,
                    x=int(rng.randint(-50, 200)),
                    length=int(rng.randint(20, 300)),
                    offset=int(rng.randint(0, 40)))
        ws.add(z=z, **item)
        items.append(item)

    lo = int(rng.randint(-20, 100))
    hi = lo + int(rng.randint(10, 250))
    got = frame_array(ws, lo, hi, 2)

    want = np.zeros_like(got)
    for it in items:
        g0 = max(lo, it['x'])
        g1 = min(hi, it['x'] + it['length'] - 1)
        if g1 < g0:
            continue
        # audio workspace items map like video: source = i - x + offset
        # (the reference's audio line inverted this — see
        # AudioWorkspace._render)
        part = frame_array(it['source'], g0 - it['x'] + it['offset'],
                           g1 - it['x'] + it['offset'], 2)
        want[g0 - lo:g1 - lo + 1] += part
    np.testing.assert_allclose(got, want, atol=1e-5,
                               err_msg='seed %d' % seed)


@pytest.mark.parametrize('factor', [0.0, 0.25, 1.0, 2.0])
def test_attenuation_linear(factor):
    src = ToneSource(220.0)
    base = frame_array(src, 0, 99, 2)
    from canvas_tpu.audio import AudioFrame, copy_frame_attenuate
    dst = AudioFrame(0, 99, 2)
    srcf = src.get_frame(0, 99, 2)
    copy_frame_attenuate(dst, srcf, factor)
    got = np.zeros_like(base)
    if dst.current_min_sample <= dst.current_max_sample:
        data = np.asarray(dst.data, np.float32)
        got[:data.shape[0]] = data[:, :2]
    np.testing.assert_allclose(got, base * np.float32(factor), atol=1e-6)


@pytest.mark.parametrize('seed', range(4))
def test_sequence_matches_mapped_items(seed):
    rng = np.random.RandomState(seed + 50)
    seq = audio.AudioSequence()
    entries = []
    for _ in range(rng.randint(1, 4)):
        src = ToneSource(float(rng.randint(100, 500)))
        offset = int(rng.randint(0, 30))
        length = int(rng.randint(20, 120))
        seq.append((src, offset, length))
        entries.append((src, offset, length))

    starts = []
    x = 0
    for (_s, _o, ln) in entries:
        starts.append(x)
        x += ln

    total = x
    got = frame_array(seq, 0, total - 1, 2)
    want = np.zeros_like(got)
    for (src, offset, length), start in zip(entries, starts):
        part = frame_array(src, offset, offset + length - 1, 2)
        want[start:start + length] = part
    np.testing.assert_allclose(got, want, atol=1e-5)
