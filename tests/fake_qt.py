"""A minimal fake Qt binding (test double) so the editor's Qt widget
layer (canvas_tpu/editor/ui/qt.py) actually executes in CI — the image
ships no PyQt/PySide. Mimics just the surface the widget uses: QWidget,
QImage, QPainter, QSize, signals."""


class Signal:
    """Stands in for pyqtSignal: a class-level descriptor returning a
    per-instance bound signal with connect/emit."""

    def __init__(self, *types):
        self._name = None

    def __set_name__(self, owner, name):
        self._name = '__signal_' + name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        bound = getattr(obj, self._name, None)
        if bound is None:
            bound = _BoundSignal()
            setattr(obj, self._name, bound)
        return bound


class _BoundSignal:
    def __init__(self):
        self._subs = []

    def connect(self, fn):
        self._subs.append(fn)

    def emit(self, *args):
        for fn in list(self._subs):
            fn(*args)


class QSize:
    def __init__(self, w, h):
        self._w, self._h = w, h

    def width(self):
        return self._w

    def height(self):
        return self._h


class _Rect:
    def __init__(self, w=320, h=240):
        self._w, self._h = w, h

    def width(self):
        return self._w

    def height(self):
        return self._h


class QWidget:
    def __init__(self, parent=None):
        self._parent = parent
        self.update_calls = 0
        self._rect = _Rect()

    def update(self):
        self.update_calls += 1
        self.paintEvent(None)

    def paintEvent(self, event):
        pass

    def rect(self):
        return self._rect

    def resize(self, w, h):
        self._rect = _Rect(w, h)
        self.resizeEvent(None)

    def width(self):
        return self._rect.width()

    def height(self):
        return self._rect.height()

    def resizeEvent(self, event):
        pass

    def show(self):
        pass

    def hide(self):
        pass

    def closeEvent(self, event):
        pass

    def close(self):
        self.closeEvent(None)


class QAction:
    def __init__(self, text):
        self.text = text
        self.triggered = _BoundSignal()


class QMenu:
    def __init__(self, title):
        self.title = title
        self.actions = []

    def addAction(self, text):
        action = QAction(text)
        self.actions.append(action)
        return action


class QMenuBar:
    def __init__(self):
        self.menus = []

    def addMenu(self, title):
        menu = QMenu(title)
        self.menus.append(menu)
        return menu


class QToolBar(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.actions = []

    def addAction(self, text):
        action = QAction(text)
        self.actions.append(action)
        return action


class QDockWidget(QWidget):
    def __init__(self, title='', parent=None):
        super().__init__(parent)
        self.title = title
        self.widget = None

    def setWidget(self, widget):
        self.widget = widget


class QTabWidget(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.tabs = []
        self._current = 0

    def addTab(self, widget, label):
        self.tabs.append((widget, label))
        return len(self.tabs) - 1

    def currentIndex(self):
        return self._current if self.tabs else -1

    def setCurrentIndex(self, index):
        if 0 <= index < len(self.tabs):
            self._current = index

    def currentWidget(self):
        if 0 <= self._current < len(self.tabs):
            return self.tabs[self._current][0]
        return None

    def setCurrentWidget(self, widget):
        for i, (w, _label) in enumerate(self.tabs):
            if w is widget:
                self._current = i
                return


class QListWidget(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.items = []

    def addItem(self, text):
        self.items.append(text)

    def clear(self):
        self.items = []


class QMainWindow(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.central = None
        self.docks = []
        self.toolbars = []
        self._menu_bar = QMenuBar()

    def setCentralWidget(self, widget):
        self.central = widget

    def addDockWidget(self, area, dock):
        self.docks.append((area, dock))

    def addToolBar(self, toolbar):
        self.toolbars.append(toolbar)

    def menuBar(self):
        return self._menu_bar

    def statusBar(self):
        bar = getattr(self, '_status_bar', None)
        if bar is None:
            bar = self._status_bar = QStatusBar()
        return bar


class QStatusBar:
    def __init__(self):
        self.messages = []

    def showMessage(self, text, timeout=0):
        self.messages.append((text, timeout))


class QFileDialog:
    """Static-prompt fake: tests preset next_path, calls record."""

    next_path = ''
    calls = []

    @staticmethod
    def getSaveFileName(parent, caption, directory='', filter=''):
        QFileDialog.calls.append((caption, filter))
        return (QFileDialog.next_path, filter)


class QTimer:
    """Manual-tick timer: CI drives ticks; start/stop track state."""

    instances = []

    def __init__(self, parent=None):
        self.parent = parent
        self.interval = 0
        self.timeout = _BoundSignal()
        self.active = False
        QTimer.instances.append(self)

    def setInterval(self, ms):
        self.interval = ms

    def start(self, ms=None):
        if ms is not None:
            self.interval = ms
        self.active = True

    def stop(self):
        self.active = False

    def isActive(self):
        return self.active


class QImage:
    class Format:
        Format_ARGB32 = 'ARGB32'

    def __init__(self, data, width, height, stride, fmt):
        self.data = data
        self._width, self._height = width, height
        self.stride = stride
        self.format = fmt

    def width(self):
        return self._width

    def height(self):
        return self._height


class QPainter:
    instances = []

    def __init__(self, widget):
        self.widget = widget
        self.drawn = []
        self.filled = []
        QPainter.instances.append(self)

    def drawImage(self, rect, image):
        self.drawn.append((rect, image))

    def fillRect(self, rect, color):
        self.filled.append((rect, color))

    def end(self):
        pass


class Qt:
    class GlobalColor:
        black = 'black'

    class DockWidgetArea:
        BottomDockWidgetArea = 'bottom'
        TopDockWidgetArea = 'top'


class QApplication:
    """App-object fake: scripts/editor.py's boot path runs against it
    (exec returns immediately so headless CI can drive main())."""

    _instance = None

    def __init__(self, argv=None):
        QApplication._instance = self
        self.argv = argv or []

    @classmethod
    def instance(cls):
        return cls._instance

    def processEvents(self):
        pass

    def exec(self):
        return 0

    exec_ = exec


class QLineEdit(QWidget):
    textChanged = Signal(str)

    def __init__(self, parent=None):
        super().__init__(parent)
        self._text = ''
        self._placeholder = ''

    def text(self):
        return self._text

    def setText(self, text):
        self._text = text
        self.textChanged.emit(text)

    def setPlaceholderText(self, text):
        self._placeholder = text


class QVBoxLayout:
    def __init__(self, parent=None):
        self.widgets = []
        if parent is not None:
            parent._layout = self

    def addWidget(self, widget):
        self.widgets.append(widget)


class QtWidgetsModule:
    QWidget = QWidget
    QMainWindow = QMainWindow
    QDockWidget = QDockWidget
    QTabWidget = QTabWidget
    QListWidget = QListWidget
    QLineEdit = QLineEdit
    QVBoxLayout = QVBoxLayout
    QToolBar = QToolBar
    QApplication = QApplication
    QFileDialog = QFileDialog


class QtGuiModule:
    QImage = QImage
    QPainter = QPainter


class QtCoreModule:
    pyqtSignal = Signal
    QSize = QSize
    Qt = Qt
    QTimer = QTimer


def install(qt_module):
    """Inject this fake binding into canvas_tpu.editor.ui.qt."""
    qt_module._qt = (QtWidgetsModule, QtGuiModule, QtCoreModule)
    return qt_module._qt
