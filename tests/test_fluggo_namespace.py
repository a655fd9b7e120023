"""fluggo.* compat namespace invariants.

The namespace must alias — never duplicate — canvas_tpu modules: a
duplicate module object would split classes and module state between
the two import spellings (isinstance failures, divergent caches).
"""

import importlib
import pkgutil
import sys


def test_every_fluggo_module_is_the_canvas_tpu_object():
    import fluggo  # noqa: F401  (registers the namespace)

    checked = 0
    for name in [m for m in sys.modules if m.startswith('fluggo')]:
        mod = sys.modules[name]
        if name == 'fluggo' or name == 'fluggo.media':
            continue           # the two synthetic namespace modules
        assert mod.__name__.startswith('canvas_tpu'), (name, mod)
        assert sys.modules[mod.__name__] is mod, name
        checked += 1
    assert checked > 40        # the whole surface, not a handful


def test_editor_subpackages_fully_enumerated():
    """Every importable submodule under canvas_tpu.editor has a fluggo
    alias registered, so no import path can re-execute one."""
    import fluggo  # noqa: F401
    import canvas_tpu.editor

    def walk(pkg, prefix):
        for info in pkgutil.iter_modules(pkg.__path__):
            full = prefix + '.' + info.name
            alias = full.replace('canvas_tpu.editor', 'fluggo.editor', 1)
            assert alias in sys.modules, alias
            assert sys.modules[alias] is importlib.import_module(full), \
                alias
            if info.ispkg:
                walk(importlib.import_module(full), full)

    walk(canvas_tpu.editor, 'canvas_tpu.editor')


def test_star_import_surface():
    """The reference's star-import habits keep working (its basetypes
    leaks `fractions`, relied on by ItemManipulator.py:8)."""
    ns = {}
    exec('from fluggo.media.basetypes import *', ns)
    assert 'v2i' in ns and 'box2i' in ns and 'fractions' in ns
