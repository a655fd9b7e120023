"""A minimal fake PyGObject/GTK binding so the GTK widget layer
(canvas_tpu/editor/ui/gtk.py) executes in CI — the image ships no
PyGObject. GTK-3 shaped (connect('draw', ...))."""


class DrawingArea:
    def __init__(self):
        self._handlers = {}
        self.queue_draw_calls = 0
        self.size_request = None

    def connect(self, signal, handler):
        self._handlers.setdefault(signal, []).append(handler)

    def set_size_request(self, w, h):
        self.size_request = (w, h)

    def queue_draw(self):
        self.queue_draw_calls += 1
        cr = CairoContext()
        for handler in self._handlers.get('draw', []):
            handler(self, cr)
        self.last_cr = cr


class GtkModule:
    DrawingArea = DrawingArea


class Pixbuf:
    created = []

    def __init__(self, data, colorspace, alpha, bits, width, height, stride):
        self.data = data
        self.width, self.height, self.stride = width, height, stride
        Pixbuf.created.append(self)

    @classmethod
    def new_from_data(cls, data, colorspace, alpha, bits, width, height,
                      stride):
        return cls(data, colorspace, alpha, bits, width, height, stride)


class GdkPixbufModule:
    Pixbuf = Pixbuf

    class Colorspace:
        RGB = 'rgb'


class CairoContext:
    def __init__(self):
        self.painted = []
        self.source = None

    def set_source_rgb(self, r, g, b):
        self.source = ('rgb', r, g, b)

    def paint(self):
        self.painted.append(self.source)


class GdkModule:
    @staticmethod
    def cairo_set_source_pixbuf(cr, pixbuf, x, y):
        cr.source = ('pixbuf', pixbuf, x, y)


class GLibModule:
    @staticmethod
    def idle_add(fn):
        fn()           # run inline: tests have no main loop


def install(gtk_module):
    """Inject this fake binding into canvas_tpu.editor.ui.gtk."""
    gtk_module._gtk = (GtkModule, GdkModule, GdkPixbufModule, GLibModule)
    return gtk_module._gtk
