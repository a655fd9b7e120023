#!/usr/bin/env python
"""Encode a file's audio track to AAC in Matroska (audio only).

Equivalent of /root/reference/scripts/encode_faac_mkv.py (demux ->
AVAudioDecoder -> AACAudioEncoder -> pure-Python MatroskaWriter).
Usage: encode_faac_mkv.py INPUT [OUTPUT.mkv] [SECONDS]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('CANVAS_FORCE_CPU'):
    import jax

    jax.config.update('jax_platforms', 'cpu')

from canvas_tpu import faac, libav, matroska


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    in_path = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else 'test_audio.mkv'
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0

    adec = libav.AVAudioDecoder(in_path, channels=2)
    sample_rate = adec.sample_rate
    n_samples = int(seconds * sample_rate)
    encoder = faac.AACAudioEncoder(adec, 0, n_samples - 1,
                                   sample_rate=sample_rate, channels=2)

    timescale = 1_000_000
    with open(out_path, 'wb') as fd:
        writer = matroska.MatroskaWriter(fd)
        writer.write_start(writing_app='canvas_tpu encode_faac_mkv',
                           duration=0.0, timecode_scale=timescale)
        writer.write_tracks([matroska.Track(
            number=1, uid=1, type_=matroska.TrackType.AUDIO,
            codec_id='A_AAC', lacing=False,
            codec_private=encoder.get_header(),
            audio=matroska.TrackAudio(sample_rate, channels=2))])
        count = 0
        last_pts = 0
        while True:
            packet = encoder.get_next_packet()
            if packet is None:
                break
            last_pts = packet.pts
            writer.write_simple_block(
                1, int(packet.pts * 1000 / sample_rate), packet.data,
                keyframe=True)
            count += 1
        writer.write_end(duration=float(last_pts * 1000 / sample_rate))
    print('wrote %d AAC packets to %s' % (count, out_path))
    return 0


if __name__ == '__main__':
    sys.exit(main())
