"""Tkinter video widget (canvas_tpu.editor.ui.tkui).

The PPM conversion is asserted headlessly; widget construction and a
real blit are display-gated (tkinter imports everywhere but Tk() needs
an X/Wayland/Aqua display — CI here is headless, so the gated test
activates on developer machines, like tests/test_real_qt.py).
"""

import time

import numpy as np
import pytest

from canvas_tpu.editor.ui import tkui


def test_bgra_to_ppm_layout():
    bgra = np.zeros((2, 3, 4), np.uint8)
    bgra[0, 0] = (255, 0, 0, 255)      # blue pixel (BGRA)
    bgra[0, 1] = (0, 255, 0, 255)      # green
    bgra[0, 2] = (0, 0, 255, 255)      # red
    bgra[1, :] = (10, 20, 30, 255)
    ppm = tkui.bgra_to_ppm(bgra)
    header, _, body = ppm.partition(b'\n')
    assert header.split() == [b'P6', b'3', b'2', b'255']
    px = np.frombuffer(body, np.uint8).reshape(2, 3, 3)
    assert tuple(px[0, 0]) == (0, 0, 255)      # RGB blue
    assert tuple(px[0, 1]) == (0, 255, 0)
    assert tuple(px[0, 2]) == (255, 0, 0)
    assert tuple(px[1, 0]) == (30, 20, 10)


def test_bgra_to_ppm_is_contiguous_copy():
    """Sliced/flipped channel view must still serialize correctly."""
    rng = np.random.default_rng(5)
    bgra = rng.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    ppm = tkui.bgra_to_ppm(bgra)
    body = ppm.partition(b'\n')[2]
    px = np.frombuffer(body, np.uint8).reshape(4, 5, 3)
    np.testing.assert_array_equal(px, bgra[:, :, 2::-1])


needs_display = pytest.mark.skipif(
    not tkui.tk_available(),
    reason='no display for tkinter (headless CI); widget logic is '
           'covered by the PPM tests + the shared playback engine suite')


@needs_display
def test_tk_widget_blits_real_pixels():
    """Real-toolkit smoke (the stdlib counterpart of test_real_qt):
    widget over a red solid presents an actual PhotoImage."""
    import tkinter
    from fractions import Fraction

    from canvas_tpu import process
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.clock import SystemPresentationClock

    ws = process.VideoWorkspace()
    ws.add(source=process.SolidColorVideoSource((1.0, 0.0, 0.0, 1.0)),
           x=0, length=48, z=0)
    clock = SystemPresentationClock()

    root = tkinter.Tk()
    try:
        widget = tkui.VideoWidget(ws, clock, Fraction(24),
                                  box2i(0, 0, 159, 119), master=root)
        widget.pack()
        widget.engine.warm(0)
        clock.seek(0)
        deadline = time.time() + 30
        while widget._photo is None and time.time() < deadline:
            root.update()
            time.sleep(0.01)
        assert widget._photo is not None, 'no frame presented'
        # PhotoImage.get returns (r, g, b); the solid is red
        r, g, b = widget._photo.get(10, 10)
        assert r > 150 and g < 60 and b < 60
    finally:
        root.destroy()
