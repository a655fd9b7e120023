#!/usr/bin/env python
"""Encode video (H.264) + audio (AAC) into Matroska.

Port of /root/reference/scripts/encode_x264_faac_mkv.py.
Usage: encode_x264_faac_mkv.py INPUT [OUTPUT.mkv] [FRAMES]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('CANVAS_FORCE_CPU'):
    import jax

    jax.config.update('jax_platforms', 'cpu')
import fractions
import sys

from canvas_tpu import faac, libav, matroska, process, x264


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    in_path = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else 'test.mkv'
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    container = libav.AVContainer(in_path)
    video = next(s for s in container.streams if s.type == 'video')
    audio = next((s for s in container.streams if s.type == 'audio'), None)
    width, height = video.frame_size
    frame_rate = video.real_frame_rate or fractions.Fraction(30000, 1001)
    is_dv = video.codec == 'dvvideo'
    container.close()

    decoder = libav.AVVideoDecoder(in_path)
    if is_dv:
        source = process.DVReconstructionFilter(decoder)
        width, height = 720, 480
    else:
        from canvas_tpu.editor.plugins.libav_plugin import _RgbaDecoderSource
        source = _RgbaDecoderSource(decoder, width, height)

    params = x264.X264EncoderParams(preset='ultrafast', width=width,
                                    height=height, frame_rate=frame_rate,
                                    constant_ratefactor=23.0)
    vencoder = x264.X264VideoEncoder(source, 0, n_frames - 1, params)

    aencoder = None
    sample_rate = 48000
    if audio is not None:
        adec = libav.AVAudioDecoder(in_path, channels=2)
        sample_rate = adec.sample_rate
        n_samples = int(n_frames * sample_rate * frame_rate.denominator /
                        frame_rate.numerator)
        aencoder = faac.AACAudioEncoder(adec, 0, n_samples - 1,
                                        sample_rate=sample_rate, channels=2)

    ns = 1_000_000_000
    timescale = 1_000_000
    with open(out_path, 'wb') as fd:
        writer = matroska.MatroskaWriter(fd)
        writer.write_start(writing_app='canvas_tpu encode_x264_faac_mkv',
                           duration=0.0, timecode_scale=timescale)
        tracks = [matroska.Track(
            number=1, uid=1, type_=matroska.TrackType.VIDEO,
            codec_id='V_MPEG4/ISO/AVC', lacing=False,
            default_duration=int(ns / frame_rate),
            codec_private=vencoder.get_header(),
            video=matroska.TrackVideo(width, height))]
        if aencoder is not None:
            tracks.append(matroska.Track(
                number=2, uid=2, type_=matroska.TrackType.AUDIO,
                codec_id='A_AAC', lacing=False,
                codec_private=aencoder.get_header(),
                audio=matroska.TrackAudio(sample_rate, channels=2)))
        writer.write_tracks(tracks)

        streams = [(1, vencoder.get_next_packet,
                    lambda p: p.pts * frame_rate.denominator * 1000 /
                    frame_rate.numerator,
                    lambda p: p.keyframe)]
        if aencoder is not None:
            streams.append((2, aencoder.get_next_packet,
                            lambda p: p.pts * 1000 / sample_rate,
                            lambda p: True))
        counts = matroska.write_interleaved_blocks(writer, streams)
        count = counts[1]
        duration = float(count * frame_rate.denominator * 1000 /
                         frame_rate.numerator)
        writer.write_end(duration=duration)
    print('wrote %d frames to %s' % (count, out_path))
    return 0


if __name__ == '__main__':
    sys.exit(main())
