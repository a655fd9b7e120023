#!/usr/bin/env python
"""Bracketed sharded-vs-unsharded A/B on the real chip.

BENCHMARKS.md's config5/config4 ratio mixes tunnel phases (the two
configs run minutes apart) AND structure (config5 renders 256 frames
through one render_sharded call that concatenates on device; config4
streams 512 probing only the last batch), so the table ratio is not
the sharded-dispatch overhead. This script measures that overhead
honestly: A (plain iter_batches) and B (render_sharded, same frame
count, same batch) interleaved A/B/A/B... in ONE phase, reporting the
median ratio. The round-2 verdict item 4 target is B/A >= 0.8 on a
1-device mesh.

Run: python scripts/sharded_ab.py [--frames 256] [--batch 128] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=256)
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    import benchmarks
    import bench
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i

    benchmarks.health_gate()

    window = box2i(0, 0, 1919, 1079)
    probe = benchmarks._probe()

    def run_a():
        ws = bench.build_timeline()
        planner = render.RenderPlanner(ws, window)
        planner.plan_cache_segments = 0
        planner.pipeline_chunk = max(planner.pipeline_chunk, args.batch)
        t0 = time.perf_counter()
        last = None
        for (_s, _n, out) in planner.iter_batches(
                0, args.frames, batch=args.batch):
            last = out
        float(probe(last))
        return args.frames / (time.perf_counter() - t0)

    def run_b():
        ws = bench.build_timeline()
        t0 = time.perf_counter()
        out = render.render_sharded(ws, window, 0, args.frames,
                                    device_out=True, batch=args.batch)
        float(probe(out))
        return args.frames / (time.perf_counter() - t0)

    # Warm both arms (compiles are process-cached after this).
    run_a(), run_b()

    ratios = []
    for rep in range(args.reps):
        a = run_a()
        b = run_b()
        ratios.append(b / a)
        print('rep %d: unsharded %.1f fps, sharded %.1f fps, ratio %.3f'
              % (rep, a, b, ratios[-1]))
    print('median ratio (sharded/unsharded, 1-device mesh): %.3f'
          % float(np.median(ratios)))


if __name__ == '__main__':
    main()
