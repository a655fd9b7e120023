"""DV decoding module.

API-parity equivalent of the reference's libdv module
(/root/reference/src/libdv/: DVVideoDecoder.c, DVAudioDecoder.c),
implemented over the native canvas_av layer (avcodec's DV codec instead
of the libdv library — same streams, same planar 4:1:1 output consumed
by DVReconstructionFilter).
"""

from canvas_tpu import libav

__all__ = ['DVVideoDecoder', 'DVAudioDecoder']


class DVVideoDecoder(libav.AVVideoDecoder):
    """DV packet stream -> planar coded images
    (DVVideoDecoder.c:58-230)."""

    def __init__(self, source, stream=None):
        libav.AVVideoDecoder.__init__(self, source, codec='dvvideo',
                                      stream=stream)


class DVAudioDecoder(libav.AVAudioDecoder):
    """DV audio (AAUX) -> audio source (DVAudioDecoder.c:76-447). The
    AAUX parsing the reference does by hand lives inside avcodec's DV
    demuxer/decoder."""

    def __init__(self, source, channels=2, stream=None):
        libav.AVAudioDecoder.__init__(self, source, channels=channels,
                                      stream=stream)
