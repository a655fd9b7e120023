"""Canvas scene model: the geometry/selection/drag logic of the timeline
view (model of /root/reference/fluggo/editor/ui/canvas/).

The reference implements this as QGraphicsScene/QGraphicsItem subclasses
(scene.py, clipitem.py, scrollview.py); here the same responsibilities —
mapping Space items to view rectangles, selection, hit-testing, snapping,
and driving ItemManipulator during drags — live in plain objects a paint
layer can render.
"""

import fractions

from canvas_tpu.signal import Signal
from canvas_tpu.editor.model.manip import ItemManipulator

__all__ = ['CanvasItemView', 'CanvasSceneModel', 'DragController']


class CanvasItemView:
    """View state for one Space item: rectangle in scene units
    (x in seconds, y in lane units) + selection flag."""

    def __init__(self, scene, item):
        self.scene = scene
        self.item = item
        self.selected = False
        item.updated.connect(self._handle_updated)

    def _handle_updated(self, **kw):
        self.scene.item_changed(self)

    @property
    def rate(self):
        return self.scene.space.rate(self.item.type())

    @property
    def rect(self):
        """(x_seconds, y, width_seconds, height)."""
        rate = float(self.rate)
        return (self.item.x / rate, self.item.y,
                self.item.length / rate, self.item.height)

    def unwatch(self):
        self.item.updated.disconnect(self._handle_updated)


class CanvasSceneModel:
    """Tracks a Space as a set of CanvasItemView objects
    (ui/canvas/scene.py role)."""

    def __init__(self, space):
        self.space = space
        self.views = {}
        self.changed = Signal()
        self.selection_changed = Signal()
        space.item_added.connect(self._handle_item_added)
        space.item_removed.connect(self._handle_item_removed)
        for item in space:
            self._handle_item_added(item)

    def _handle_item_added(self, item):
        self.views[id(item)] = CanvasItemView(self, item)
        self.changed()

    def _handle_item_removed(self, item):
        view = self.views.pop(id(item), None)
        if view:
            view.unwatch()
        self.changed()

    def item_changed(self, view):
        self.changed()

    def view_for(self, item):
        return self.views.get(id(item))

    # -- selection --------------------------------------------------------

    @property
    def selected_items(self):
        return [v.item for v in self.views.values() if v.selected]

    def select(self, items, extend=False):
        if not extend:
            for view in self.views.values():
                view.selected = False
        for item in items:
            view = self.view_for(item)
            if view:
                view.selected = True
        self.selection_changed()

    # -- hit testing ------------------------------------------------------

    def item_at(self, x_seconds, y):
        """Topmost (lowest z) item under the point."""
        hits = []
        for view in self.views.values():
            rx, ry, rw, rh = view.rect
            if rx <= x_seconds < rx + rw and ry <= y < ry + rh:
                hits.append(view.item)
        if not hits:
            return None
        return min(hits, key=lambda i: i.z)

    def snap_x(self, x_seconds, exclude=(), threshold=0.25):
        """Snap to nearby item edges (the view's snap-to-edges
        behavior); returns possibly-adjusted x in seconds."""
        best = None
        for view in self.views.values():
            if view.item in exclude:
                continue
            rx, ry, rw, rh = view.rect
            for edge in (rx, rx + rw):
                d = abs(edge - x_seconds)
                if d <= threshold and (best is None or d < best[0]):
                    best = (d, edge)
        return best[1] if best else x_seconds


class DragController:
    """Drives an ItemManipulator through a pointer gesture
    (ui/canvas/scene.py drag-drop role): start -> move(s) -> drop/cancel.
    """

    def __init__(self, scene, undo_stack):
        self.scene = scene
        self.undo_stack = undo_stack
        self.manipulator = None

    def start(self, item, grab_x_seconds, grab_y):
        items = [item] + [i for i in self.scene.selected_items if i != item]
        self.manipulator = ItemManipulator(items, grab_x_seconds, grab_y)

    def move_to_space(self, x_seconds, y):
        if self.manipulator:
            self.manipulator.set_space_item(self.scene.space, x_seconds, y)

    def move_to_sequence(self, sequence, x_seconds, y):
        if self.manipulator:
            self.manipulator.set_sequence_item(sequence, x_seconds, y, 'add')

    def drop(self):
        if not self.manipulator:
            return None
        command = self.manipulator.finish()
        self.manipulator = None
        if command is not None:
            # Already executed; the stack only records it
            from canvas_tpu.editor.model.undo import UndoCommand

            class _Recorded(UndoCommand):
                def __init__(self, inner):
                    UndoCommand.__init__(self, inner.text())
                    self.inner = inner
                    self._first = True

                def redo(self):
                    if self._first:
                        self._first = False
                        return
                    self.inner.redo()

                def undo(self):
                    self.inner.undo()

            self.undo_stack.push(_Recorded(command))
        return command

    def cancel(self):
        if self.manipulator:
            self.manipulator.reset()
            self.manipulator = None
