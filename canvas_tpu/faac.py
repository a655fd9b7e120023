"""AAC encoding module.

API-parity equivalent of the reference's faac module
(/root/reference/src/faac/AACAudioEncoder.c:49-270), implemented over
the native canvas_av packet encoder with avcodec's AAC encoder.
AACAudioEncoder(source, start_sample, end_sample, sample_rate, channels,
bit_rate) is a codec packet source: get_next_packet() + get_header()
(AudioSpecificConfig).
"""

from canvas_tpu import libav

__all__ = ['AACAudioEncoder']


class AACAudioEncoder(libav.AVAudioEncoder):
    def __init__(self, source, start_sample, end_sample, sample_rate=48000,
                 channels=2, bit_rate=128000):
        libav.AVAudioEncoder.__init__(
            self, source, start_sample, end_sample, codec='aac',
            sample_rate=sample_rate, channels=channels, bit_rate=bit_rate)
