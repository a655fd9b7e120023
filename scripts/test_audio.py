#!/usr/bin/env python
"""Audio round-trip smoke script (port of the reference's
scripts/test_audio.py).

The reference script (``/root/reference/scripts/test_audio.py``) does
two things with a file's audio stream: (1) AAC-encode it and print a
per-sample comparison of the decoded result against the original, and
(2) write the AAC packets into a Matroska file through
``matroska.MatroskaWriter`` with an explicit Track + SimpleBlock loop.
This port keeps both, driven through the ``fluggo.media`` compat
namespace so the reference import lines run unchanged.

One structural difference: the reference's ``AVAudioDecoder`` can pull
straight from a live encoder packet source; ours decodes from files
(the native decode loop stays in C++, libav.py:449), so the comparison
decodes the just-written .mkv instead — which also validates the
matroska output, something the reference's in-memory loop never did.

Usage: python scripts/test_audio.py INPUT [OUT.mkv]
(INPUT: any media file with an audio stream; defaults to a generated
440 Hz test tone when omitted.)
"""

import logging
import math
import os
import sys

handler = logging.StreamHandler()
handler.setLevel(logging.NOTSET)
handler.setFormatter(logging.Formatter('{levelname}:{name}:{msg}', style='{'))
root_logger = logging.getLogger()
root_logger.setLevel(logging.WARNING)
root_logger.addHandler(handler)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault('CANVAS_FORCE_CPU', '1')

from fluggo.media import process, libav, matroska, faac  # noqa: E402

SAMPLE_RATE = 48000
N_SAMPLES = 10000


class ToneSource:
    """440 Hz stereo test tone (stand-in input when none is given)."""

    def get_frame(self, min_sample, max_sample, channels):
        import numpy as np
        from canvas_tpu.audio import AudioFrame
        n = max_sample - min_sample + 1
        t = (np.arange(min_sample, max_sample + 1) / SAMPLE_RATE)
        data = np.zeros((n, channels), np.float32)
        for ch in range(channels):
            data[:, ch] = 0.4 * np.sin(2 * math.pi * 440 * t + ch)
        return AudioFrame(min_sample, max_sample, channels, data=data)


def main():
    out_path = sys.argv[2] if len(sys.argv) > 2 else 'test_audio.mkv'

    if len(sys.argv) > 1 and sys.argv[1] not in ('', '-'):
        audio_packet_source = libav.AVDemuxer(sys.argv[1], 1)
        audio_decoder = libav.AVAudioDecoder(audio_packet_source,
                                             'pcm_s16le', 2)
    else:
        print('no input file given; using a generated 440 Hz tone')
        audio_decoder = ToneSource()

    encoder = faac.AACAudioEncoder(audio_decoder, 0, N_SAMPLES,
                                   SAMPLE_RATE, 2)

    # --- Matroska writing (reference's `elif True` branch) ---
    ns = 1000000000
    timescale = 10000

    with open(out_path, 'wb') as myfile:
        writer = matroska.MatroskaWriter(myfile)
        writer.write_start(
            writing_app="Brian's test muxer",
            duration=0.0,
            timecode_scale=timescale)

        header = encoder.get_header()
        print('Len(header): ' + str(len(header)))

        audio_track = matroska.Track(
            number=1,
            uid=1,
            type_=matroska.TrackType.AUDIO,
            codec_id='A_AAC',
            lacing=False,
            # Matroska codec specs LIED, the header is required
            codec_private=header,
            audio=matroska.TrackAudio(SAMPLE_RATE, channels=2))
        writer.write_tracks([audio_track])

        frames_written = 0
        last_pts = 0
        pts_base = None
        try:
            packet = encoder.get_next_packet()
            while packet:
                # Rebase on the first pts: AAC priming makes the first
                # packet's pts negative, and Matroska timecodes are
                # unsigned (the reference's loop had the same hole —
                # its own TODO calls the duration math "severely
                # incorrect").
                if pts_base is None:
                    pts_base = packet.pts
                raw_timecode = round(float((packet.pts - pts_base) * ns)
                                     / float(SAMPLE_RATE))
                abs_timecode = int(round(raw_timecode / timescale))
                writer.write_simple_block(1, abs_timecode, packet.data,
                                          keyframe=packet.keyframe)
                frames_written += 1
                last_pts = abs_timecode
                packet = encoder.get_next_packet()
        finally:
            writer.write_end(duration=float(last_pts))
    print('%d AAC frames -> %s' % (frames_written, out_path))

    # --- per-sample comparison (reference's `if True` branch) ---
    # The decoded stream carries the AAC priming samples at its head
    # (packet pts are rebased to 0 like libfaac's): find the encoder
    # delay empirically by scanning shifts on one channel.
    import numpy as np
    decoder2 = libav.AVAudioDecoder(out_path, 'aac', 2)
    frame_orig = audio_decoder.get_frame(0, N_SAMPLES, 2)
    probe = np.asarray(decoder2.get_frame(0, N_SAMPLES + 4096, 2).data)
    orig = np.asarray(frame_orig.data)
    def scan(lo, hi, step):
        best = (None, 0)
        for s in range(lo, hi, step):
            if s < 0:
                continue
            err = float(np.mean(np.abs(probe[s + 512:s + 1536, 0]
                                       - orig[512:1536, 0])))
            if best[0] is None or err < best[0]:
                best = (err, s)
        return best[1]

    delay = scan(0, 4096, 16)            # coarse
    delay = scan(delay - 16, delay + 17, 1)   # refine to the sample
    print('estimated encoder delay: %d samples' % delay)
    frame_dec = decoder2.get_frame(delay, N_SAMPLES + delay, 2)

    worst = 0.0
    # Interior samples only: the head is encoder priming and the tail
    # packet is truncated (the last partial AAC frame is dropped), so
    # the first/last ~kilosample are edge effects, not codec fidelity.
    for i in range(1000, N_SAMPLES - 2000 + 1, 1000):
        l1, r1 = frame_orig.sample(i, 0), frame_orig.sample(i, 1)
        l2, r2 = frame_dec.sample(i + delay, 0), frame_dec.sample(i + delay, 1)
        worst = max(worst, abs(l1 - l2), abs(r1 - r2))
        print('{4:05} L{0:+0.4f} R{1:+0.4f} vs L{2:+0.4f} R{3:+0.4f}'
              .format(l1, r1, l2, r2, i))
    print('worst sampled delta: %.4f' % worst)
    return 0


if __name__ == '__main__':
    sys.exit(main())
