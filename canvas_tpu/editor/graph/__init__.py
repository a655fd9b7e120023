"""Graph compilers: editor model -> engine graph, kept in sync.

Rebuild of /root/reference/fluggo/editor/graph/ (video.py, audio.py).
"""

from canvas_tpu.editor.graph.video import (  # noqa: F401
    SpaceVideoManager, SequenceVideoManager)
from canvas_tpu.editor.graph.audio import (  # noqa: F401
    SpaceAudioManager, SequenceAudioManager)
