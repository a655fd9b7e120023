"""Pixel/sample kernels: every op has a NumPy reference implementation and a
JAX/Pallas device implementation with identical semantics (see
canvas_tpu/backend.py for how dispatch is decided)."""
