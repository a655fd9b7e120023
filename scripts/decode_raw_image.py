#!/usr/bin/env python
"""Python-implemented coded image source demo
(port of /root/reference/scripts/decode_raw_image.py:22-39): build DV
planes in Python, reconstruct on device, export a PNG-ish PPM.

Usage: decode_raw_image.py [OUT.ppm]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('CANVAS_FORCE_CPU'):
    import jax

    jax.config.update('jax_platforms', 'cpu')

import numpy as np

from canvas_tpu import process
from canvas_tpu.basetypes import box2i
from canvas_tpu.ops import color as color_ops


class FakeDVImageSource(process.CodedImageSource):
    """Gray frame with a black border, built in Python."""

    def get_frame(self, frame, quality=0):
        y = np.full((480, 720), 190, np.uint8)
        y[0, :] = 0
        y[-1, :] = 0
        y[:, 0] = 0
        y[:, -1] = 0
        cb = np.full((480, 180), 0x80, np.uint8)
        cr = np.full((480, 180), 0x80, np.uint8)
        return process.CodedImage([y, cb, cr])


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else 'raw_image.ppm'
    recon = process.DVReconstructionFilter(FakeDVImageSource())
    frame = recon.get_frame_f16(0, box2i(0, -1, 719, 478))
    u8 = color_ops.apply_gamma45_u8(np.asarray(frame.data, np.float16))
    rgb = np.stack([u8[0], u8[1], u8[2]], axis=-1)
    with open(out_path, 'wb') as f:
        f.write(b'P6\n%d %d\n255\n' % (rgb.shape[1], rgb.shape[0]))
        f.write(rgb.tobytes())
    print('wrote', out_path, rgb.shape)
    return 0


if __name__ == '__main__':
    sys.exit(main())
