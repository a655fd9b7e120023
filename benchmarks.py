#!/usr/bin/env python
"""Full benchmark suite: the five BASELINE.md configs.

``bench.py`` prints the single headline line the driver records; this
script measures the whole matrix and writes BENCHMARKS.md. Configs:

1. Single 720p clip pull (solid source -> rec709->linear f16).
2. Two-clip 1080p crossfade.
3. DV 4:1:1 reconstruction (+ pulldown removal) on synthetic coded frames.
4. 10-layer 1080p timeline with affine motion + opacity (the headline).
5. Frame-parallel export sharding (single chip here; multi-chip via
   render_sharded is validated in __graft_entry__.dryrun_multichip).

Also reports p50 single-frame pull latency on config 4 (BASELINE's
second metric).
"""

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')

import numpy as np


def _probe():
    """Execution-forcing reduction: on this rig's remote TPU transport
    block_until_ready() does not wait for execution, so timing chains a
    tiny device-side sum per batch and fetches ONE scalar at the end
    (each host fetch costs a ~30 ms round trip)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def probe(x):
        idx = tuple(slice(None, None, 97) for _ in range(x.ndim - 2))
        return jnp.sum(x[(slice(None), slice(None)) + idx]
                       .astype(jnp.float32))
    return probe


def timeit_batches(planner, batch, n_frames, start=0):
    """Steady-state fps through the plan-once streaming path: one warm
    pass over the SAME range (pays compiles), then the timed pass.

    Forced-execution timing: the device executes dispatched programs in
    FIFO order (verified: post-hoc probes of earlier batches return in
    pure fetch-RTT), so probing the LAST batch's output and fetching
    one scalar bounds the whole range. A probe dispatch per batch costs
    ~17 ms each through this tunnel and under-reports by ~2x."""
    probe = _probe()

    def run_range():
        t0 = time.perf_counter()
        last = None
        for (_s, _n, out) in planner.iter_batches(
                start, start + n_frames, batch=batch):
            last = out
        float(probe(last))
        return n_frames / (time.perf_counter() - t0)

    run_range()
    return run_range()


def config1():
    """720p single clip: solid + rec709->linear transfer."""
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.framefuncs import LerpFunc
    from canvas_tpu.sources import (SolidColorVideoSource,
                                    VideoColorTransferFilter)

    src = VideoColorTransferFilter(
        SolidColorVideoSource(LerpFunc((0, 0, 0, 1), (1, 1, 1, 1), 1024)),
        'rec709_to_linear_scene')
    planner = render.RenderPlanner(src, box2i(0, 0, 1279, 719))
    return timeit_batches(planner, 32, 256)


def config2():
    """1080p two-clip crossfade."""
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.framefuncs import LerpFunc
    from canvas_tpu.sources import SolidColorVideoSource, VideoMixFilter

    mix = VideoMixFilter(
        SolidColorVideoSource(LerpFunc((1, 0, 0, 1), (0, 1, 0, 1), 1024)),
        SolidColorVideoSource(LerpFunc((0, 0, 1, 1), (1, 1, 0, 1), 1024)),
        LerpFunc((0.0,), (1.0,), 1024))
    planner = render.RenderPlanner(mix, box2i(0, 0, 1919, 1079))
    return timeit_batches(planner, 32, 256)


def config3():
    """DV 4:1:1 reconstruction + 2:3 pulldown removal."""
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.coded import (CodedImage, CodedImageSource,
                                  DVReconstructionFilter,
                                  Pulldown23RemovalFilter)

    rng = np.random.RandomState(0)
    y = rng.randint(16, 236, (480, 720)).astype(np.uint8)
    cb = rng.randint(16, 241, (480, 180)).astype(np.uint8)
    cr = rng.randint(16, 241, (480, 180)).astype(np.uint8)

    class Source(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            return CodedImage([y, cb, cr])

    src = Pulldown23RemovalFilter(DVReconstructionFilter(Source()), 0)
    planner = render.RenderPlanner(src, box2i(0, -1, 719, 478))
    return timeit_batches(planner, 16, 128)


def config4():
    """10-layer 1080p timeline (the bench.py headline)."""
    import bench
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i

    ws = bench.build_timeline()
    planner = render.RenderPlanner(ws, box2i(0, 0, 1919, 1079))
    fps = timeit_batches(planner, 16, 128)

    # p50 single-frame pull latency on the same graph: the low-latency
    # display path (render_display — one warm fused program rendering +
    # converting to u8 BGRA on device, single u8 fetch; what a playback
    # surface waits for). Warm the program first so we measure steady
    # state, not compilation.
    planner.render_display(199)
    lat = []
    for i in range(20):
        t0 = time.perf_counter()
        planner.render_display(200 + i)
        lat.append(time.perf_counter() - t0)
    return fps, float(np.percentile(lat, 50) * 1e3)


def config5():
    """Frame-parallel sharded render (all local devices)."""
    import bench
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i

    import jax

    ws = bench.build_timeline()
    window = box2i(0, 0, 1919, 1079)
    n = len(jax.devices())
    batch = 16 * n
    probe = _probe()

    def run_range():
        t0 = time.perf_counter()
        total = 0
        last = None
        for start in range(0, batch * 4, batch):
            last = render.render_sharded(ws, window, start, start + batch,
                                         device_out=True)
            total += batch
        float(probe(last))     # FIFO: last done => all done
        return total / (time.perf_counter() - t0)

    run_range()            # pays compiles
    return run_range()


def config6():
    """4K (2160p) 10-layer export-shaped path: streaming render +
    device u8 conversion (what write_video fetches per batch)."""
    import jax
    import jax.numpy as jnp

    import bench
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.ops import color as color_ops

    ws = bench.build_timeline()
    planner = render.RenderPlanner(ws, box2i(0, 0, 3839, 2159))
    probe = _probe()

    def run_range():
        t0 = time.perf_counter()
        last = None
        n = 0
        # post= fuses the u8 conversion into the render program — the
        # write_video export path (no intermediate f16 tensor)
        for (_s, _n, u8) in planner.iter_batches(0, 64, batch=8,
                                                 post='rgba_u8'):
            last = u8
            n += _n
        float(probe(last))     # FIFO: last done => all done
        return n / (time.perf_counter() - t0)

    run_range()
    return run_range()


def config7():
    """Mixed-content 10-layer 1080p timeline: 3 of the 10 layers are
    STAGED coded video (DV 4:1:1 reconstruct -> scaler), the rest
    solids/gain/crossfade — so the number cannot be carried by the
    solid_stack fusion alone (VERDICT round-1 item 3). Coded planes
    differ per frame (rolled), so every frame's planes really cross
    host->device."""
    import bench
    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.coded import (CodedImage, CodedImageSource,
                                  DVReconstructionFilter)
    from canvas_tpu.framefuncs import LerpFunc
    from canvas_tpu.sources import VideoScaler

    rng = np.random.RandomState(7)
    y = rng.randint(16, 236, (480, 720)).astype(np.uint8)
    cb = rng.randint(16, 241, (480, 180)).astype(np.uint8)
    cr = rng.randint(16, 241, (480, 180)).astype(np.uint8)

    class Rolled(CodedImageSource):
        def get_frame(self, frame_index, quality=0):
            return CodedImage([np.roll(y, frame_index, axis=0),
                               np.roll(cb, frame_index, axis=0),
                               np.roll(cr, frame_index, axis=0)])

    length = 256
    ws = bench.build_timeline(length)
    # Replace three solid layers (z=2,4,6) with scaled DV clips
    for z, (tx, ty) in zip((2, 4, 6), ((0, 0), (640, 120), (960, 480))):
        clip = VideoScaler(
            DVReconstructionFilter(Rolled()),
            target_point=LerpFunc((tx, ty), (tx + 60, ty + 40), length),
            source_point=(0.0, -1.0),
            scale_factors=(1.25, 1.25),
            source_rect=box2i(0, -1, 719, 478))
        for item in [it for it in ws if it.z == z]:
            ws.remove(item)
        ws.add(source=clip, x=0, length=length, z=z)

    planner = render.RenderPlanner(ws, box2i(0, 0, 1919, 1079))
    return timeit_batches(planner, 16, 128)


def config8(tmp='/tmp/canvas_bench_1080p.avi'):
    """Real decoded 1080p playback through the planar staging path
    (decode on host -> YCbCr planes staged once per segment to device
    -> reconstruction + transfer on device). The round-1 RGBA staging
    measured ~1/14th of this through the same tunnel."""
    import fractions
    import os

    from canvas_tpu import libav, render
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.coded import PlanarReconstructionFilter
    from canvas_tpu.framefuncs import LerpFunc
    from canvas_tpu.sources import SolidColorVideoSource

    if not os.path.exists(tmp):
        src = SolidColorVideoSource(LerpFunc((0, 0, 0, 1), (1, 1, 1, 1),
                                             64))
        libav.write_video(tmp, src, None, 0, 64, frame_size=(1920, 1080),
                          frame_rate=fractions.Fraction(25),
                          video_codec='mpeg4', bit_rate=8_000_000,
                          format='avi')
    filt = PlanarReconstructionFilter(libav.AVVideoDecoder(tmp),
                                      width=1920, height=1080)
    planner = render.RenderPlanner(filt, box2i(0, 0, 1919, 1079))
    return timeit_batches(planner, 8, 48)


def main():
    import jax

    results = {}
    results['config1_720p_single_clip_fps'] = round(config1(), 1)
    results['config2_1080p_crossfade_fps'] = round(config2(), 1)
    results['config3_dv_reconstruct_pulldown_fps'] = round(config3(), 1)
    fps4, p50 = config4()
    results['config4_10layer_1080p_fps'] = round(fps4, 1)
    results['config4_single_frame_p50_ms'] = round(p50, 2)
    results['config5_sharded_fps_%d_devices' % len(jax.devices())] = \
        round(config5(), 1)
    results['config6_4k_10layer_export_path_fps'] = round(config6(), 1)
    results['config7_mixed_content_10layer_fps'] = round(config7(), 1)
    results['config8_1080p_decoded_planar_fps'] = round(config8(), 1)

    print(json.dumps(results, indent=1))

    with open('BENCHMARKS.md', 'w') as f:
        f.write('# Benchmark results (BASELINE.md configs)\n\n')
        f.write('Device: %s x%d\n\n' % (jax.devices()[0].device_kind,
                                        len(jax.devices())))
        f.write('| Config | Result |\n|---|---|\n')
        for key, value in results.items():
            f.write('| %s | %s |\n' % (key, value))
        f.write('\nHeadline metric: see bench.py / BENCH_r*.json. '
                'The reference publishes no numbers (BASELINE.md); its '
                'implied target is ~30 fps realtime DV playback. '
                'Measured C-kernel baselines: cbaseline/README.md.\n\n'
                'Measurement: on this rig block_until_ready() returns '
                'before remote execution finishes, so every timing '
                'probes the LAST dispatched output with a device-side '
                'reduction and fetches one scalar (FIFO execution '
                'verified: post-hoc probes of earlier outputs return in '
                'pure fetch-RTT) — numbers are forced-execution '
                'honest.\n\n'
                'Note: this rig reaches the TPU through a network tunnel '
                '(~30 ms RTT per host fetch, ~80 MB/s H2D). Configs that '
                'stage host data per batch (config 3) are transfer-bound, '
                'and the single-frame p50 includes a full-frame D2H '
                'fetch; on a locally attached TPU those terms collapse.\n')
    return 0


if __name__ == '__main__':
    sys.exit(main())
