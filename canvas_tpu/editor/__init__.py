"""Editor layers: plugin framework, document model, graph compilers.

Headless-first rebuild of the reference's fluggo.editor packages
(/root/reference/fluggo/editor/): Qt dependencies are replaced with
canvas_tpu.signal signals, a JSON settings store, and a toolkit-free
undo stack, so the full editor model runs in CI and on render nodes.
"""
