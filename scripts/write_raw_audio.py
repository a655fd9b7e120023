#!/usr/bin/env python
"""Write a float-PCM Matroska from a synthetic audio source
(port of /root/reference/scripts/write_raw_audio.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('CANVAS_FORCE_CPU'):
    import jax

    jax.config.update('jax_platforms', 'cpu')
import math
import sys

import numpy as np

from canvas_tpu import matroska
from canvas_tpu.audio import AudioFrame, AudioSource


class ToneSource(AudioSource):
    def __init__(self, freq=440.0, rate=48000):
        self.freq = freq
        self.rate = rate

    def _render(self, frame):
        t = np.arange(frame.full_min_sample,
                      frame.full_max_sample + 1) / self.rate
        tone = 0.5 * np.sin(2 * math.pi * self.freq * t)
        frame.data = np.repeat(tone[:, None],
                               frame.channels, 1).astype(np.float32)
        frame.current_min_sample = frame.full_min_sample
        frame.current_max_sample = frame.full_max_sample


if __name__ == '__main__':
    out = sys.argv[1] if len(sys.argv) > 1 else 'tone.mkv'
    matroska.write_audio_pcm_float(out, ToneSource(), 0, 48000 * 2 - 1,
                                   48000, 2)
    print('wrote', out)
