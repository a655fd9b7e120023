"""Concurrent pulls racing live edits.

The reference guards its engine with GMutex/GRWLocks (workspace.c:55,
VideoScaler.c:34, AnimationFunc.c:32, VideoSequence.c:36) because the
editor pulls frames from render/thumbnail threads while the UI thread
edits the graph. Our equivalents are the RLock on
VideoWorkspace/VideoSequence, the AnimationFunc point lock, and the
planner's plan/stage cache locks. These tests drive that contract
directly: worker threads hammer pulls while the main thread edits, and
nothing may raise, deadlock, or corrupt state — after the dust
settles, output must equal a freshly built graph's.
"""

import random
import threading

import numpy as np

from canvas_tpu import process, render
from canvas_tpu.basetypes import box2i

WINDOW = box2i(0, 0, 15, 15)


def _run_pullers(n_threads, pull, stop_event, errors):
    def worker(seed):
        rng = random.Random(seed)
        try:
            while not stop_event.is_set():
                pull(rng)
        except BaseException as exc:   # noqa: BLE001 - repanic in main
            errors.append(exc)
            stop_event.set()

    threads = [threading.Thread(target=worker, args=(1000 + i,))
               for i in range(n_threads)]
    for t in threads:
        t.start()
    return threads


def test_workspace_pulls_race_edits(numpy_backend):
    """Eager pulls from 3 threads while the main thread runs the
    random churn battery (add/update/remove)."""
    rng = random.Random(42)
    ws = process.VideoWorkspace()
    sources = [process.SolidColorVideoSource(
        process.LerpFunc((c == 0, c == 1, c == 2, 1.0),
                         (0.5, 0.5, 0.5, 1.0), 100))
        for c in range(3)]
    for i in range(8):
        ws.add(source=sources[i % 3], x=i * 10, z=i, length=30,
               offset=i)

    stop = threading.Event()
    errors = []

    def pull(prng):
        frame = ws.get_frame_f32(prng.randint(-10, 120), WINDOW)
        # touching pixels exercises current_window under mutation
        frame.pixel(3, 3)

    threads = _run_pullers(3, pull, stop, errors)
    try:
        for _ in range(600):
            action = rng.randint(1, 7)
            if action <= 3 and len(ws):
                rng.choice(ws).update(x=rng.randint(0, 100),
                                      z=rng.randint(-5, 5),
                                      length=rng.randint(1, 60))
            elif action == 4 and len(ws) > 2:
                ws.remove(rng.choice(ws))
            else:
                ws.add(source=rng.choice(sources),
                       x=rng.randint(0, 100), z=rng.randint(-5, 5),
                       length=rng.randint(1, 60),
                       offset=rng.randint(-10, 10))
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors
    assert not any(t.is_alive() for t in threads), 'puller deadlocked'

    # settled state must equal a rebuild from the same items
    rebuilt = process.VideoWorkspace()
    for item in ws:
        rebuilt.add(source=item.source, x=item.x, z=item.z,
                    length=item.length, offset=item.offset)
    for f in (0, 7, 33, 90):
        a = ws.get_frame_f32(f, WINDOW)
        b = rebuilt.get_frame_f32(f, WINDOW)
        assert a.current_window == b.current_window
        np.testing.assert_array_equal(np.asarray(a.data),
                                      np.asarray(b.data))


def test_sequence_pulls_race_edits(numpy_backend):
    """VideoSequence list edits (insert/remove/replace) racing pulls."""
    rng = random.Random(43)
    solids = [process.SolidColorVideoSource((r / 4, 0.2, 0.3, 1.0))
              for r in range(5)]

    def clip(i):
        return (solids[i % 5], 0, 10)   # (source, offset, length)

    seq = process.VideoSequence()
    for i in range(6):
        seq.append(clip(i))

    stop = threading.Event()
    errors = []

    def pull(prng):
        seq.get_frame_f32(prng.randint(-5, 100), WINDOW)

    threads = _run_pullers(3, pull, stop, errors)
    try:
        for _ in range(400):
            action = rng.randint(0, 2)
            if action == 0 and len(seq) > 2:
                del seq[rng.randrange(len(seq))]
            elif action == 1:
                seq.insert(rng.randint(0, len(seq)), clip(rng.randint(0, 4)))
            else:
                seq[rng.randrange(len(seq))] = clip(rng.randint(0, 4))
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors
    assert not any(t.is_alive() for t in threads), 'puller deadlocked'

    rebuilt = process.VideoSequence()
    for i in range(len(seq)):
        rebuilt.append(seq[i])
    for f in (0, 15, 45):
        np.testing.assert_array_equal(
            np.asarray(seq.get_frame_f32(f, WINDOW).data),
            np.asarray(rebuilt.get_frame_f32(f, WINDOW).data))


def test_animation_func_edits_race_pulls(numpy_backend):
    """AnimationFunc point mutation (the reference's GRWLock case)
    while a thread evaluates through a solid using the func."""
    func = process.AnimationFunc()
    func.add(process.AnimationPoint(process.POINT_LINEAR, 0,
                                    (0.1, 0.1, 0.1, 1.0)))
    func.add(process.AnimationPoint(process.POINT_LINEAR, 100,
                                    (0.9, 0.9, 0.9, 1.0)))
    solid = process.SolidColorVideoSource(func)

    stop = threading.Event()
    errors = []

    def pull(prng):
        solid.get_frame_f32(prng.randint(0, 100), WINDOW)

    threads = _run_pullers(2, pull, stop, errors)
    rng = random.Random(44)
    points = []
    try:
        for _ in range(400):
            if points and rng.random() < 0.4:
                func.remove(points.pop(rng.randrange(len(points))))
            else:
                p = process.AnimationPoint(
                    process.POINT_HOLD, rng.randint(1, 99),
                    (rng.random(), rng.random(), rng.random(), 1.0))
                func.add(p)
                points.append(p)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors
    assert not any(t.is_alive() for t in threads), 'puller deadlocked'


def test_planner_stream_races_invalidation():
    """iter_batches streaming while another thread fires ranged
    invalidations (the editor's frames_updated path runs on model/UI
    threads). Outputs may be either content version; shapes, dtypes,
    and the absence of exceptions are the contract — and a quiesced
    re-render matches a fresh planner."""
    ws = process.VideoWorkspace()
    ws.add(source=process.SolidColorVideoSource(
        process.LerpFunc((0.1, 0.2, 0.3, 1.0), (0.8, 0.7, 0.6, 1.0), 64)),
        x=0, length=64, z=0)
    ws.add(source=process.SolidColorVideoSource(
        (1.0, 0.0, 0.0, 0.5), window=box2i(2, 2, 10, 10)),
        x=16, length=16, z=1)

    window = box2i(0, 0, 31, 31)
    planner = render.RenderPlanner(ws, window)
    stop = threading.Event()
    errors = []

    def invalidator():
        rng = random.Random(45)
        try:
            while not stop.is_set():
                lo = rng.randint(0, 56)
                planner.invalidate_display_cache(lo, lo + rng.randint(0, 8))
        except BaseException as exc:   # noqa: BLE001
            errors.append(exc)

    thread = threading.Thread(target=invalidator)
    thread.start()
    try:
        for _round in range(6):
            for (_s, n, out) in planner.iter_batches(0, 64, batch=8):
                arr = np.asarray(out)
                assert arr.shape == (n, 4, 32, 32)
                assert arr.dtype == np.float16
    finally:
        stop.set()
        thread.join(timeout=30)
    assert not errors, errors

    got = np.asarray(planner.render(0, 24))
    fresh = render.RenderPlanner(ws, window)
    want = np.asarray(fresh.render(0, 24))
    np.testing.assert_array_equal(got, want)
    fresh.close()
    planner.close()


def test_workspace_update_atomic_under_concurrent_pulls():
    """WorkspaceItem.update()'s documented atomicity reaches concurrent
    renders: a reader compositing while another thread updates x and
    offset together (keeping x - offset constant in CONTENT terms) must
    never observe a torn pair. The tagged source's pixel value encodes
    the pulled frame, so any torn x/offset read shows up as a wrong
    pixel."""
    from canvas_tpu.frames import VideoSource

    class Tagged(VideoSource):
        def _render_f32(self, frame_index, frame):
            data = np.zeros((4, frame.full_window.height,
                             frame.full_window.width), np.float32)
            data[0] = frame_index / 1000.0
            data[3] = 1.0
            frame.data = data
            frame.current_window = frame.full_window

    ws = process.VideoWorkspace()
    item = ws.add(source=Tagged(), x=0, length=10_000, offset=0, z=0)
    window = box2i(0, 0, 7, 7)

    stop = threading.Event()
    errors = []

    def writer():
        k = 0
        while not stop.is_set():
            k = (k + 7) % 500
            # moving the clip while retiming it so the content mapping
            # frame - x + offset stays frame - 0: any consistent
            # snapshot yields pixel == frame/1000
            item.update(x=k, offset=k)
        # leave a known state
        item.update(x=0, offset=0)

    thread = threading.Thread(target=writer)
    thread.start()
    try:
        for i in range(300):
            f = i % 50
            frame = ws.get_frame_f32(f, window)
            px = frame.pixel(0, 0)
            if px is None:
                continue       # clip moved past f: consistent, fine
            got = round(px.r * 1000)
            if got != f:
                errors.append((f, got))
    finally:
        stop.set()
        thread.join(timeout=30)
    assert not errors, errors[:5]
