#!/usr/bin/env python
"""Canvas-TPU editor entry point (the reference's qttest.py role).

Launches the full Qt main window — document tabs with mouse-editable
timelines, video preview, asset/notification docks, transport — when a
Qt binding (PyQt5/PyQt6/PySide6) is installed.

Usage: editor.py [PROJECT.yaml]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('CANVAS_FORCE_CPU'):
    import jax

    jax.config.update('jax_platforms', 'cpu')


def main():
    from canvas_tpu.editor.ui import qt as qt_shim

    if not qt_shim.qt_available():
        print('No Qt binding (PyQt5/PyQt6/PySide6) installed.')
        print('The editor logic still runs headless — see '
              'canvas_tpu.editor.ui.EditorApp and the test suite.')
        return 1

    QtWidgets = qt_shim._load_qt()[0]
    from canvas_tpu.editor.ui import create_main_window

    qapp = QtWidgets.QApplication(sys.argv)
    window = create_main_window()
    if len(sys.argv) > 1:
        window.open_project(sys.argv[1])
    window.show()
    try:
        return qapp.exec() if hasattr(qapp, 'exec') else qapp.exec_()
    finally:
        # Deterministic teardown: stop playback engines/clock threads
        # even when the event loop exits abnormally (also what lets
        # headless CI drive main() without leaking threads).
        window.closeEvent(None)


if __name__ == '__main__':
    sys.exit(main())
