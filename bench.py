#!/usr/bin/env python
"""Canvas-TPU headline benchmark.

BASELINE.md primary metric: 1080p composited frames/sec/chip on a
10-layer timeline (animated opacity + gain + affine motion via scalers),
rendered through the batched device path (canvas_tpu.render).

vs_baseline: ratio against the same graph pulled frame-by-frame through
the NumPy kernels — the stand-in for the reference's single-threaded C
cprocess path (the reference publishes no numbers; see BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/canvas_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')

import numpy as np  # noqa: E402


def build_timeline(length=1024):
    """10-layer 1080p timeline: solids with animated windows/colors,
    opacity (gain) animation, and two animated scalers (affine motion)."""
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.framefuncs import LerpFunc, LinearFrameFunc
    from canvas_tpu.sources import (SolidColorVideoSource,
                                    VideoGainOffsetFilter, VideoScaler,
                                    VideoWorkspace)

    ws = VideoWorkspace()
    # Layer 0: full-frame background
    ws.add(source=SolidColorVideoSource((0.1, 0.1, 0.12, 1.0)),
           x=0, length=length, z=0)
    # Layers 1-5: animated color cards at varying windows/opacity
    for i in range(5):
        color = LerpFunc((0.9 - 0.1 * i, 0.1 * i, 0.3, 0.9),
                         (0.1 * i, 0.8, 0.9 - 0.1 * i, 0.4), length)
        win = box2i(60 * i, 40 * i, 60 * i + 900, 40 * i + 600)
        layer = VideoGainOffsetFilter(
            SolidColorVideoSource(color, window=win),
            gain=LinearFrameFunc(0.3 / length, 0.7), offset=0.0)
        ws.add(source=layer, x=0, length=length, z=i + 1)
    # Layers 6-7: animated scalers (affine motion: translate + zoom)
    for i in range(2):
        base = SolidColorVideoSource((0.2, 0.5 + 0.2 * i, 0.8, 0.8),
                                     window=box2i(0, 0, 479, 269))
        sc = VideoScaler(
            base,
            target_point=LerpFunc((200 + 300 * i, 150), (900, 700), length),
            source_point=(0.0, 0.0),
            scale_factors=LerpFunc((1.0, 1.0), (1.8, 1.8), length),
            source_rect=box2i(0, 0, 479, 269))
        ws.add(source=sc, x=0, length=length, z=6 + i)
    # Layers 8-9: crossfading cards
    from canvas_tpu.sources import VideoMixFilter
    mix = VideoMixFilter(
        SolidColorVideoSource((1.0, 0.4, 0.1, 0.6),
                              window=box2i(400, 300, 1500, 900)),
        SolidColorVideoSource((0.1, 0.4, 1.0, 0.6),
                              window=box2i(400, 300, 1500, 900)),
        LerpFunc((0.0,), (1.0,), length))
    ws.add(source=mix, x=0, length=length, z=8)
    ws.add(source=SolidColorVideoSource((1, 1, 1, 0.08),
                                        window=box2i(0, 980, 1919, 1079)),
           x=0, length=length, z=9)
    return ws


# --- Driver-safe wall-clock budget (round-4 contract) -----------------
#
# Round 3's official record was rc=124/no JSON: the 90-min tunnel wait
# ran before the watchdog even started, so the driver's own timeout
# killed the process before any line was printed. The contract now is
# the reference's always-answering timing hook
# (/root/reference/src/process/main.c:120-167): ONE JSON line in
# bounded time, whatever the tunnel does.
#
# A single budget (CANVAS_BENCH_BUDGET, default 540 s — safe under a
# 10-min driver timeout) bounds EVERYTHING: outage wait + health gates
# + the run itself. The watchdog starts before the first device op and
# emits the best result recorded so far (honest zero if none) at the
# deadline. Manual long runs can raise the budget via the env var.

_T0 = time.monotonic()
_BUDGET = float(os.environ.get('CANVAS_BENCH_BUDGET', '540'))
_STATE = {'fps': 0.0, 'vs': 0.0, 'note': None}
_EMITTED = None  # threading.Event, set in main()
_EMIT_LOCK = None  # threading.Lock, set in main()


def _remaining():
    return _BUDGET - (time.monotonic() - _T0)


def _emit(error=None):
    """Print the one JSON line exactly once (main thread or watchdog).
    The check-then-set runs under a lock: a run completing at the same
    instant the budget deadline fires must not print two lines (the
    driver contract is ONE JSON line)."""
    with _EMIT_LOCK:
        if _EMITTED.is_set():
            return False
        _EMITTED.set()
    line = {
        'metric': '1080p_10layer_composite_fps_per_chip',
        'value': round(_STATE['fps'], 2),
        'unit': 'frames/sec',
        'vs_baseline': round(_STATE['vs'], 2),
    }
    # 'error' is reserved for zero/failed measurements; informational
    # notes (e.g. budget_cut_reps_at_N next to a VALID fps) go under
    # 'note' so a driver treating any 'error' as failure doesn't
    # discard a real headline.
    if error:
        line['error'] = error
    elif _STATE['note']:
        line['note'] = _STATE['note']
    print(json.dumps(line), flush=True)
    return True


def _start_watchdog():
    """Budget guard started BEFORE any device op: at the deadline, emit
    whatever has been measured (zero if nothing) and hard-exit
    (os._exit: worker threads blocked on a down tunnel would hang a
    normal exit)."""
    import threading

    if _BUDGET <= 0:
        return

    def watch():
        while True:
            rem = _remaining()
            if rem <= 0:
                break
            if _EMITTED.wait(min(rem, 5.0)):
                return
        if _emit(error='budget_exceeded_%ds' % int(_BUDGET)):
            os._exit(2)

    threading.Thread(target=watch, daemon=True, name='bench-watchdog').start()


def main():
    import threading

    global _EMITTED, _EMIT_LOCK
    _EMITTED = threading.Event()
    _EMIT_LOCK = threading.Lock()
    _start_watchdog()

    from canvas_tpu import backend, render
    from canvas_tpu.basetypes import box2i

    # Wait out a transient tunnel outage (bounded) BEFORE the first
    # in-process device op: a fully-down transport hangs that op in
    # native code, so only killable subprocess probes can tell when
    # it's back. CANVAS_BENCH_WAIT seconds (default 300; 0 disables),
    # further clamped so the run itself keeps >=180 s of budget.
    wait_budget = float(os.environ.get('CANVAS_BENCH_WAIT', '300'))
    wait_budget = min(wait_budget, max(0.0, _remaining() - 180.0))
    wait_t0 = time.monotonic()
    while wait_budget > 0 and not backend.probe_device(
            timeout=min(45, max(5, wait_budget)), fresh=True):
        waited = time.monotonic() - wait_t0
        if waited >= wait_budget:
            _emit(error='tpu_unreachable_after_%ds_wait' % int(waited))
            os._exit(2)
        time.sleep(min(20, max(1.0, wait_budget - waited)))

    window = box2i(0, 0, 1919, 1079)

    # Batch 128 (round-3 sweep, one phase: b32 1213 / b64 1752 /
    # b128 1936 fps): true device compute is ~6-9 ms/b32
    # (scripts/device_loop_probe.py), so the per-dispatch transport
    # cost dominates at small batches and amortizes with batch size.
    # b256 exhausts HBM: async dispatch keeps several (B,4,1088,1920)
    # f16 outputs (1 GB each at 256) in flight.
    batch = int(os.environ.get('CANVAS_BENCH_BATCH', '128'))
    # In-flight pacing (render.iter_batches(max_inflight=)): batches
    # beyond 128 OOM from async dispatch queue depth alone (~4 GB f16
    # output each at 256); bounding the queue at k batches makes big-
    # batch sweeps possible. 0 = unbounded (the <=128 default).
    inflight = int(os.environ.get('CANVAS_BENCH_INFLIGHT',
                                  '3' if batch > 128 else '0')) or None
    warm_frames = batch
    timed_frames = int(os.environ.get('CANVAS_BENCH_FRAMES',
                                      str(max(384, 3 * batch))))

    # The timeline must cover warm + timed frames: layers end at the
    # timeline length, and a range past it plans EMPTY (near-free zero
    # frames) — silently inflating the metric at big batch settings.
    ws = build_timeline(max(1024, warm_frames + timed_frames))

    planner = render.RenderPlanner(ws, window)
    # The headline measures COLD streaming (plan + slice + dispatch per
    # rep): plan caching would turn best-of-3 reps over one range into
    # replay measurement (the cached-replay story is config7b in
    # benchmarks.py).
    planner.plan_cache_segments = 0
    # Batches larger than the pipeline chunk would be tail-padded to
    # the segment length; grow the chunk so big-batch sweeps measure
    # real work (the headline graph stages nothing, so longer chunks
    # cost no staging stall).
    planner.pipeline_chunk = max(planner.pipeline_chunk, batch)

    # Execution-forcing probe: on this rig's remote TPU transport,
    # block_until_ready() returns before execution finishes, so honest
    # timing needs a device-side data dependency and ONE host fetch at
    # the end (each host fetch costs a ~30 ms RTT). The device executes
    # dispatched programs in FIFO order (verified: post-hoc probes of
    # earlier batches return in pure fetch-RTT), so probing the LAST
    # batch bounds the whole range; probing every batch adds a ~17 ms
    # dispatch each and under-reports by ~2x.
    import jax
    import jax.numpy as jnp

    @jax.jit
    def probe(x):
        # The probed array is the MATERIALIZED output of an already
        # dispatched program (separate executable — no cross-program
        # DCE), so any element forces the whole batch: a tiny
        # contiguous corner keeps the probe's own dispatch near-free
        # (the old strided ::101/::97 gather cost ~17 ms through the
        # tunnel — 10-25% of a 384-frame timed range).
        return jnp.sum(x[-1:, :, :32, :128].astype(jnp.float32))

    # Health gate (round-3 integrity harness): refuse to time against a
    # collapsed tunnel — a small matmul + one scalar fetch must answer
    # promptly before each timed rep.
    health_mat = jnp.ones((256, 256), jnp.float32)

    @jax.jit
    def health_mm(x):
        return jnp.sum(x @ x)

    def health_gate(limit=0.5, dispatch_limit=0.008, max_wait=120.0):
        """Wait for a healthy transport phase: RTT under *limit* AND
        per-dispatch cost under *dispatch_limit* (phases exist where a
        single round trip looks fine but back-to-back dispatch
        marshaling is inflated several-fold, halving streaming fps).
        Best-effort: after *max_wait* (clamped so >=120 s of the global
        budget stays for the run) the bench proceeds anyway — a
        degraded number beats no recorded number."""
        max_wait = min(max_wait, max(0.0, _remaining() - 120.0))
        deadline = time.time() + max_wait
        while True:
            t0 = time.perf_counter()
            float(health_mm(health_mat))
            rtt_ok = time.perf_counter() - t0 < limit
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                out = health_mm(health_mat)
            float(out)
            disp = (time.perf_counter() - t0) / n
            if rtt_ok and disp < dispatch_limit:
                return
            if time.time() > deadline:
                return
            time.sleep(10.0)

    # Baseline read EARLY (cheap file read) so a mid-run watchdog
    # emission can carry vs_baseline alongside the best-so-far fps.
    base_fps = None
    results_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'cbaseline', 'results.json')
    try:
        with open(results_path) as f:
            base_fps = float(json.load(f)['engine10_fps'])
    except (OSError, KeyError, ValueError):
        pass

    float(health_mm(health_mat))      # compile
    health_gate()

    # Warmup / compile
    for (_s, _n, out) in planner.iter_batches(0, warm_frames, batch=batch,
                                              max_inflight=inflight):
        float(probe(out))

    # Timed: steady-state batched rendering (plan each structure segment
    # once, stream fixed-size batches through the compiled program).
    # Three reps, best-of, each health-gated: the first rep pays
    # one-time transport ramp-up and a stalled-tunnel rep cannot become
    # the recorded number.
    fps = 0.0
    start = warm_frames
    for _rep in range(3):
        if fps > 0 and _remaining() < 60:
            _STATE['note'] = 'budget_cut_reps_at_%d' % _rep
            break
        health_gate()
        t0 = time.perf_counter()
        last = None
        for (_s, _n, out) in planner.iter_batches(
                start, start + timed_frames, batch=batch,
                max_inflight=inflight):
            last = out
        float(probe(last))   # forced fetch: FIFO => whole range ran
        fps = max(fps, timed_frames / (time.perf_counter() - t0))
        # Record progress so a budget-deadline watchdog emission carries
        # the best real measurement instead of a zero.
        _STATE['fps'] = fps
        _STATE['vs'] = fps / base_fps if base_fps else 0.0

    # Baseline: the MEASURED reference C cprocess engine on this host
    # (cbaseline/ compiles /root/reference/src/cprocess in place and
    # times the same 10-layer timeline shape single-core; engine10_fps
    # in cbaseline/results.json, read above). Falls back to a
    # frame-by-frame NumPy pull if the C harness hasn't been built here.
    if not base_fps:
        times = []
        with backend.force_backend('numpy'):
            for i in range(5):
                t0 = time.perf_counter()
                ws.get_frame_f16(500 + i, window)
                times.append(time.perf_counter() - t0)
        base_fps = 1.0 / float(np.median(times))

    _STATE['fps'] = fps
    _STATE['vs'] = fps / base_fps
    _emit()
    return 0


if __name__ == '__main__':
    sys.exit(main())
