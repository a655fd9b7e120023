"""GTK video widget shim.

Equivalent of the reference's GTK video widget
(/root/reference/src/gtk/GtkVideoWidget.c:44-132): a drawing area over
the toolkit-independent playback engine (canvas_tpu.playback). Imports
lazily and degrades gracefully — this image ships no PyGObject, so the
module exposes ``gtk_available()`` and raises a clear error on use; the
widget logic itself is complete and activates when PyGObject (GTK 3 or
4) is installed.
"""

__all__ = ['gtk_available', 'GtkVideoWidget']

_gtk = None


def _load_gtk():
    global _gtk
    if _gtk is not None:
        return _gtk
    try:
        import gi
        for version in ('4.0', '3.0'):
            try:
                gi.require_version('Gtk', version)
                break
            except ValueError:
                continue
        from gi.repository import GLib, Gdk, GdkPixbuf, Gtk
        _gtk = (Gtk, Gdk, GdkPixbuf, GLib)
        return _gtk
    except ImportError:
        _gtk = False
        return _gtk


def gtk_available():
    return bool(_load_gtk())


def GtkVideoWidget(source, clock, frame_rate, window,
                   pixel_aspect_ratio=40.0 / 33.0, rendering_intent=1.25,
                   on_stall=None):
    """Create a GTK drawing area displaying *source* driven by *clock*.

    Raises RuntimeError when PyGObject is not installed. Mirrors
    GtkVideoWidget.c: frames arrive from the playback engine's render
    thread and are marshalled onto the GTK main loop (GLib.idle_add —
    the g_timeout_add pattern) before invalidating the surface.
    """
    gtk = _load_gtk()
    if not gtk:
        raise RuntimeError('PyGObject (GTK) not available')
    Gtk, Gdk, GdkPixbuf, GLib = gtk

    from canvas_tpu.playback import VideoPlaybackEngine

    class _GtkVideoWidget(Gtk.DrawingArea):
        def __init__(self):
            super().__init__()
            self._pixbuf = None
            if hasattr(self, 'set_draw_func'):       # GTK 4
                self.set_draw_func(self._draw_gtk4)
            else:                                    # GTK 3
                self.connect('draw', self._draw_gtk3)
            self._engine = VideoPlaybackEngine(
                source, clock, frame_rate, window, self._present,
                pixel_aspect_ratio=pixel_aspect_ratio,
                rendering_intent=rendering_intent, on_stall=on_stall)
            w, h = self._engine.display_size()
            self.set_size_request(w, h)

        @property
        def engine(self):
            return self._engine

        def _present(self, frame_index, bgra):
            # bgra (H, W, 4) u8 -> RGB pixbuf; hop onto the main loop
            rgb = bgra[:, :, 2::-1].tobytes()
            height, width = bgra.shape[:2]

            def apply():
                # Pixbuf.new_from_data does NOT copy the buffer — keep
                # the bytes alive for the pixbuf's lifetime.
                self._pixbuf_data = rgb
                self._pixbuf = GdkPixbuf.Pixbuf.new_from_data(
                    rgb, GdkPixbuf.Colorspace.RGB, False, 8,
                    width, height, width * 3)
                self.queue_draw()
                return False

            GLib.idle_add(apply)

        def _draw_common(self, cr):
            if self._pixbuf is not None:
                Gdk.cairo_set_source_pixbuf(cr, self._pixbuf, 0, 0)
                cr.paint()
            else:
                cr.set_source_rgb(0, 0, 0)
                cr.paint()

        def _draw_gtk3(self, _widget, cr):
            self._draw_common(cr)
            return False

        def _draw_gtk4(self, _area, cr, _w, _h):
            self._draw_common(cr)

        def close(self):
            self._engine.stop()

    return _GtkVideoWidget()
