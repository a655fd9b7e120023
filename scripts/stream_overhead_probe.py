#!/usr/bin/env python
"""Isolate the streaming-vs-device-only overhead of iter_batches.

Round-3: device-only dispatch of the headline program measures
~14 ms/b32 while iter_batches streams at ~17.5 ms/b32. This probe
separates the candidates: (a) per-dispatch cost with PRE-BUILT batch
param lists (the exact objects iter_batches dispatches), (b) the same
through the full iter_batches generator (adds planning-GIL +
bookkeeping), (c) device-only with a single frozen param list.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

if os.environ.get('CANVAS_FORCE_CPU'):
    import jax

    jax.config.update('jax_platforms', 'cpu')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i

    @jax.jit
    def probe(x):
        return jnp.sum(x[:, :, ::101, ::97].astype(jnp.float32))

    window = box2i(0, 0, 1919, 1079)
    batch = 32
    frames = 384

    # (c) frozen single batch
    ws = bench.build_timeline()
    planner = render.RenderPlanner(ws, window)
    fr = np.arange(32, 64, dtype=np.int64)
    planner._stage_cache = {}
    planner._frame_hints = {}
    planner._plan_mesh = None
    ctx = render.PlanContext(planner, fr, planner.window)
    node = ctx.plan(ws)
    fn = render._get_program(node.signature())
    params = node.flat_params([])
    o = fn(params)
    float(probe(o))
    t0 = time.perf_counter()
    for _ in range(frames // batch):
        o = fn(params)
    float(probe(o))
    dt_frozen = time.perf_counter() - t0
    print('frozen-params dispatch: %.2f ms/batch (%.0f fps)'
          % (dt_frozen / (frames // batch) * 1e3, frames / dt_frozen),
          flush=True)

    # (a) pre-built per-batch params from the planner, dispatched in a
    # bare loop (no generator, no prepare thread)
    planner2 = render.RenderPlanner(ws, window)
    batches = []
    for seg in planner2.segments(32, 32 + frames):
        planner2._stage_cache = {}
        planner2._frame_hints = {}
        planner2._plan_mesh = None
        fr = np.arange(seg[0], seg[1], dtype=np.int64)
        ctx = render.PlanContext(planner2, fr, planner2.window)
        node = ctx.plan(ws)
        render._commit_replicated_params(node)
        sig = render._sliced_signature(node, seg[1] - seg[0], batch)
        fn2 = render._get_program(sig)
        params = node.flat_params([])
        ops = node.flat_ops([])
        N = seg[1] - seg[0]
        for pos in range(0, N, batch):
            def cut(v, ax, pos=pos):
                sl = (slice(None),) * ax
                return v[sl + (slice(pos, pos + batch),)]
            batches.append((fn2, [
                {k: (cut(v, render._BATCH_AXIS.get(op, 0))
                     if k in render._frame_params(op) else v)
                 for k, v in p.items()}
                for p, op in zip(params, ops)]))
    # warm EVERY program: segments compile distinct geometry (the
    # animated scaler region grows per segment)
    for fn2, p in batches:
        o = fn2(p)
    float(probe(o))
    t0 = time.perf_counter()
    for fn2, p in batches:
        o = fn2(p)
    float(probe(o))
    dt_pre = time.perf_counter() - t0
    print('pre-built dispatch:     %.2f ms/batch (%.0f fps)'
          % (dt_pre / len(batches) * 1e3, frames / dt_pre), flush=True)

    # (b) the full streaming generator
    planner3 = render.RenderPlanner(ws, window)
    for (_s, _n, o) in planner3.iter_batches(0, 32, batch=batch):
        float(probe(o))
    t0 = time.perf_counter()
    last = None
    for (_s, _n, o) in planner3.iter_batches(32, 32 + frames,
                                             batch=batch):
        last = o
    float(probe(last))
    dt_gen = time.perf_counter() - t0
    print('iter_batches stream:    %.2f ms/batch (%.0f fps)'
          % (dt_gen / (frames // batch) * 1e3, frames / dt_gen),
          flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
