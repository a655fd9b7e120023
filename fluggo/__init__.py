"""Import-compat namespace: ``fluggo.*`` aliases onto ``canvas_tpu.*``.

The reference project (fluggo/Canvas) exposes its whole Python surface as
the ``fluggo`` package (``fluggo/__init__.py`` in the reference tree, plus
compiled extensions installed into ``fluggo.media`` by SConstruct).  Its
own test suites (``/root/reference/tests``), scripts, and editor all start
with ``from fluggo.media import process, libav`` etc.  This package makes
those imports resolve to the canvas_tpu implementation *as the same module
objects* (``fluggo.media.process is canvas_tpu.process``), so the
reference's tests and scripts run unchanged — see
tests/test_reference_suites.py which executes the reference suites
verbatim through this namespace.

Implementation: every public module is registered in ``sys.modules`` under
its ``fluggo.*`` name, and bound as an attribute on its parent package, at
``import fluggo`` time.  ``fluggo.media`` itself is a fresh namespace
module (NOT the canvas_tpu package object) so aliasing never mutates
canvas_tpu's own namespace.

Special-cased names (reference → here):

* ``fluggo.media.alsa``  → ``canvas_tpu.audioout`` (AlsaPlayer alias of
  AudioPlayer; reference src/alsa/AlsaPlayer.c:349-351 signature)
* ``fluggo.media.qt``    → ``canvas_tpu.editor.ui.qt`` (VideoWidget;
  reference src/qt/VideoWidget.cpp)
* ``fluggo.media.gtk``   → ``canvas_tpu.editor.ui.gtk`` (reference
  src/gtk/GtkVideoWidget.c; ``VideoWidget`` aliased there)
* ``fluggo.editor.ui.notificationwidget`` →
  ``canvas_tpu.editor.ui.notification``
* ``fluggo.editor.ui.canvas`` → ``canvas_tpu.editor.ui.canvas_models``
  (the reference's ui.canvas package rebuilt as flat modules)
"""

import importlib
import sys
import types

# Ordered: parents before children so attribute binding finds the parent.
_ALIASES = [
    # top-level pure-Python packages (reference fluggo/*.py)
    ('fluggo.signal', 'canvas_tpu.signal'),
    ('fluggo.sortlist', 'canvas_tpu.sortlist'),
    ('fluggo.ezlist', 'canvas_tpu.ezlist'),
    ('fluggo.logging', 'canvas_tpu.logging'),
    # fluggo.media.* — pure-Python modules + compiled extensions
    ('fluggo.media.basetypes', 'canvas_tpu.basetypes'),
    ('fluggo.media.timecode', 'canvas_tpu.timecode'),
    ('fluggo.media.matroska', 'canvas_tpu.matroska'),
    ('fluggo.media.formats', 'canvas_tpu.formats'),
    ('fluggo.media.transitions', 'canvas_tpu.transitions'),
    ('fluggo.media.process', 'canvas_tpu.process'),
    ('fluggo.media.libav', 'canvas_tpu.libav'),
    ('fluggo.media.libdv', 'canvas_tpu.libdv'),
    ('fluggo.media.x264', 'canvas_tpu.x264'),
    ('fluggo.media.faac', 'canvas_tpu.faac'),
    ('fluggo.media.alsa', 'canvas_tpu.audioout'),
    ('fluggo.media.qt', 'canvas_tpu.editor.ui.qt'),
    ('fluggo.media.gtk', 'canvas_tpu.editor.ui.gtk'),
    # fluggo.editor.* — packages alias 1:1
    ('fluggo.editor', 'canvas_tpu.editor'),
    ('fluggo.editor.plugins', 'canvas_tpu.editor.plugins'),
    ('fluggo.editor.model', 'canvas_tpu.editor.model'),
    ('fluggo.editor.graph', 'canvas_tpu.editor.graph'),
    ('fluggo.editor.graph.video', 'canvas_tpu.editor.graph.video'),
    ('fluggo.editor.graph.audio', 'canvas_tpu.editor.graph.audio'),
    ('fluggo.editor.ui', 'canvas_tpu.editor.ui'),
    ('fluggo.editor.ui.notificationwidget', 'canvas_tpu.editor.ui.notification'),
    ('fluggo.editor.ui.renderprogress', 'canvas_tpu.editor.ui.renderprogress'),
    ('fluggo.editor.ui.ruler', 'canvas_tpu.editor.ui.ruler'),
    ('fluggo.editor.ui.canvas', 'canvas_tpu.editor.ui.canvas_models'),
]


def _install():
    import pkgutil

    media = types.ModuleType('fluggo.media')
    media.__doc__ = ('Namespace module aliasing canvas_tpu media modules; '
                     'see fluggo/__init__.py.')
    media.__package__ = 'fluggo.media'
    media.__path__ = []  # mark as package so `import fluggo.media.x` walks it
    sys.modules['fluggo.media'] = media
    this = sys.modules[__name__]
    this.media = media

    aliases = list(_ALIASES)

    # Aliased REAL packages keep their real __path__, so a submodule
    # that is in the package but NOT in sys.modules under its fluggo
    # name would be re-executed as a DUPLICATE module object (two
    # distinct classes, split module state). Close the hole by
    # enumerating every submodule of every aliased package and
    # aliasing it too.
    def expand(alias, target):
        mod = importlib.import_module(target)
        for info in pkgutil.iter_modules(getattr(mod, '__path__', [])):
            sub_alias = alias + '.' + info.name
            sub_target = target + '.' + info.name
            if all(a != sub_alias for a, _ in aliases):
                aliases.append((sub_alias, sub_target))
                if info.ispkg:
                    expand(sub_alias, sub_target)

    for alias, target in _ALIASES:
        try:
            mod = importlib.import_module(target)
        except ImportError:
            continue
        if hasattr(mod, '__path__'):
            expand(alias, target)

    for alias, target in aliases:
        mod = importlib.import_module(target)
        sys.modules[alias] = mod
        parent_name, _, leaf = alias.rpartition('.')
        parent = sys.modules.get(parent_name)
        if parent is not None and getattr(parent, leaf, None) is not mod:
            setattr(parent, leaf, mod)


_install()
del _install
