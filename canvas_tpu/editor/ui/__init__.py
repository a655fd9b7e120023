"""Editor UI layer — headless view-models.

Rebuild of /root/reference/fluggo/editor/ui/ with the widget logic
factored out of Qt: each module is the *model* of the corresponding
widget (scene geometry, tick math, thumbnail cache, render job, alert
list), fully testable without a display. A Qt binding, when present,
only needs thin paint/input adapters over these (canvas_tpu.editor.ui.qt).
"""

from canvas_tpu.editor.ui.ruler import TimeRulerModel  # noqa: F401
from canvas_tpu.editor.ui.canvas_models import (  # noqa: F401
    CanvasItemView, CanvasSceneModel, DragController)
from canvas_tpu.editor.ui.thumbnails import ThumbnailPainter  # noqa: F401
from canvas_tpu.editor.ui.paint import CanvasPainter  # noqa: F401
from canvas_tpu.editor.ui.renderprogress import RenderJob  # noqa: F401
from canvas_tpu.editor.ui.notification import AlertListModel  # noqa: F401
from canvas_tpu.editor.ui.app import EditorApp  # noqa: F401
from canvas_tpu.editor.ui.mainwindow import create_main_window  # noqa: F401
