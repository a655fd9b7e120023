#!/usr/bin/env python
"""On-chip validation of the fused rank-1 region composite
(pallas_ops.region_over_sep, CANVAS_REGION_SEP — default ON since
2026-08-19; =0 restores the materialized path).

Renders the headline timeline's scaled-solid segment twice through the
batched planner — flag off (materialized scale_solid outer product +
region_over) and flag on (fused separable region kernel) — and both
against the eager pull path. Reports elementwise max differences.
Shipped default-on after measuring fused == materialized bit-identical
(maxdiff 0.0 on chip, 2026-08-19) and a 14% device-time win on the
headline program (8.04/8.08 off vs 6.96 on ms/b32, bracketed
device_loop_probe A/B).

Run on the real chip (the Pallas kernel only engages on TPU; on CPU the
flag falls back to the materialized path and this script just confirms
the plumbing): python scripts/region_sep_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

import numpy as np

if os.environ.get('CANVAS_FORCE_CPU'):
    import jax

    jax.config.update('jax_platforms', 'cpu')


def render_once(ws, win, frames):
    """Fresh planner render of [frames[0], frames[-1]+1) -> host f16."""
    from canvas_tpu import render

    planner = render.RenderPlanner(ws, win)
    planner.plan_cache_segments = 0
    try:
        return np.asarray(planner.render(frames[0], frames[-1] + 1))
    finally:
        planner.close()


def main():
    import jax

    from bench import build_timeline
    from canvas_tpu.basetypes import box2i

    print('backend:', jax.default_backend())
    ws = build_timeline(256)
    win = box2i(0, 0, 1919, 1079)
    frames = np.arange(64, 72)

    t0 = time.time()
    os.environ['CANVAS_REGION_SEP'] = '0'
    base = render_once(ws, win, frames)
    os.environ['CANVAS_REGION_SEP'] = '1'
    fused = render_once(ws, win, frames)
    print('renders done in %.1f s' % (time.time() - t0))

    d_flag = np.abs(base.astype(np.float32) - fused.astype(np.float32))
    print('fused vs materialized: maxdiff %.3e' % d_flag.max())

    # vs the eager pull path (the behavioral reference)
    from canvas_tpu import backend
    worst = 0.0
    for i, fi in enumerate(frames):
        ref = ws.get_frame_f16(int(fi), win)
        rd = np.asarray(ref.data, np.float32)
        worst = max(worst, float(np.abs(
            rd - fused[i].astype(np.float32)).max()))
    print('fused vs pull: maxdiff %.3e  (flag-off reference: %.3e)'
          % (worst, float(np.abs(
              rd - base[-1].astype(np.float32)).max())))
    _ = backend  # keep import for parity with other scripts
    ok = d_flag.max() <= 2e-3 and worst <= 2e-3
    print('OK' if ok else 'DIVERGED')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
