"""Audio output: a playback thread that doubles as the presentation clock.

Equivalent of the reference's alsa module
(/root/reference/src/alsa/AlsaPlayer.c): AlsaPlayer runs its own thread
pulling ``audio_get_frame`` (:56-111) and *is* the presentation clock for
the rest of the pipeline (vtable :605-610), supporting variable and
negative speeds.

This build has no ALSA; :class:`AudioPlayer` reproduces the contract
with a pluggable *sink*: the default null sink consumes samples in real
time (driving video playback headless/CI), and any callable
``sink(samples_f32)`` can be plugged in (a file writer, a PortAudio
binding, ...). The clock math mirrors SystemPresentationClock.
"""

import threading
import time
from fractions import Fraction

import numpy as np

from canvas_tpu.clock import PresentationClock, gettime

__all__ = ['AudioPlayer']


class AudioPlayer(PresentationClock):
    """Audio sink + presentation clock (AlsaPlayer.c:349-351 signature:
    (rate, channels, source))."""

    def __init__(self, rate, channels, source=None, sink=None,
                 chunk_frames=1024):
        PresentationClock.__init__(self)
        self.rate = int(rate)
        self.channels = int(channels)
        self.source = source
        self.sink = sink
        self.chunk_frames = int(chunk_frames)

        self._mutex = threading.Lock()
        self._seek_time = 0
        self._base_time = gettime()
        self._speed = Fraction(0, 1)
        self._quit = False
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name='canvas-audio')
        self._thread.start()

    def set_audio_source(self, source):
        self.source = source

    # -- clock interface ---------------------------------------------------

    def get_presentation_time(self):
        with self._mutex:
            if self._speed.numerator == 0:
                return self._seek_time
            elapsed = (gettime() - self._base_time) * self._speed.numerator
            if self._speed.denominator != 1:
                elapsed //= self._speed.denominator
            return self._seek_time + elapsed

    def get_speed(self):
        with self._mutex:
            return self._speed

    def _set(self, seek_time, speed):
        with self._mutex:
            self._base_time = gettime()
            self._seek_time = int(seek_time)
            self._speed = Fraction(speed)
        self._notify(self._speed, self._seek_time)
        self._wake.set()

    def set(self, speed, time_ns):
        self._set(time_ns, speed)

    def play(self, rate):
        self._set(self.get_presentation_time(), rate)

    def seek(self, time_ns):
        self._set(time_ns, self._speed)

    def stop(self):
        self._set(self.get_presentation_time(), Fraction(0, 1))

    def close(self):
        self._quit = True
        self._wake.set()
        self._thread.join(timeout=5)

    # -- playback thread (AlsaPlayer.c:56-111) -----------------------------

    def _run(self):
        while not self._quit:
            speed = self.get_speed()
            if speed == 0 or self.source is None:
                self._wake.wait(0.1)
                self._wake.clear()
                continue

            now = self.get_presentation_time()
            sample = (now * self.rate) // 1_000_000_000
            n = self.chunk_frames

            if speed > 0:
                frame = self.source.get_frame(sample, sample + n - 1,
                                              self.channels)
                data = np.asarray(frame.data, np.float32)
            else:
                # Negative speed: pull behind and reverse
                # (AlsaPlayer supports negative rates)
                frame = self.source.get_frame(sample - n + 1, sample,
                                              self.channels)
                data = np.asarray(frame.data, np.float32)[::-1]

            if self.sink is not None:
                self.sink(data)

            # Real-time pacing: chunk duration scaled by |speed|
            duration = n / self.rate / float(abs(speed))
            self._wake.wait(min(duration, 0.25))
            self._wake.clear()
