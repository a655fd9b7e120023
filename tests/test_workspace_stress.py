"""Randomized VideoWorkspace stress test (port of
/root/reference/tests/process/video/VideoWorkspace.py:13-39) plus a
batched-render consistency sweep."""

import random

import numpy as np
import pytest

from canvas_tpu import process, render
from canvas_tpu.basetypes import box2i


def make_sources():
    return (
        process.SolidColorVideoSource(
            process.LerpFunc((0, 0, 0, 1), (100, 0, 0, 1), 100)),
        process.SolidColorVideoSource(
            process.LerpFunc((0, 0, 0, 1), (0, 100, 0, 1), 100)),
        process.SolidColorVideoSource(
            process.LerpFunc((0, 0, 0, 1), (0, 0, 100, 1), 100)))


def getcolor(source, frame):
    return source.get_frame_f32(frame, box2i(0, 0, 0, 0)).pixel(0, 0)


def test_random_workspace_churn(numpy_backend):
    """10,000 random add/move/remove/pull operations must never crash or
    corrupt the workspace."""
    rng = random.Random(12345)
    workspace = process.VideoWorkspace()
    sources = make_sources()

    def randaction(action):
        if action == 1 and len(workspace):
            rng.choice(workspace).update(x=rng.randint(0, 1000))
        elif action == 2 and len(workspace):
            rng.choice(workspace).update(z=rng.randint(-10, 10))
        elif action == 3 and len(workspace):
            rng.choice(workspace).update(length=rng.randint(1, 100))
        elif action == 4 and len(workspace):
            rng.choice(workspace).update(offset=rng.randint(-20, 20))
        elif action == 5 and len(workspace):
            workspace.remove(rng.choice(workspace))
        elif action == 6:
            for _ in range(10):
                getcolor(workspace, rng.randint(-100, 1100))
        else:
            workspace.add(source=rng.choice(sources),
                          x=rng.randint(0, 1000),
                          z=rng.randint(-10, 10),
                          length=rng.randint(1, 100),
                          offset=rng.randint(-20, 20))

    for _ in range(10000):
        randaction(rng.randint(1, 7))


def test_random_workspace_batched_matches_pull():
    """After random churn, the batched device render must agree with the
    per-frame pull path across the timeline."""
    rng = random.Random(99)
    workspace = process.VideoWorkspace()
    sources = make_sources()
    for _ in range(30):
        workspace.add(source=rng.choice(sources),
                      x=rng.randint(0, 200), z=rng.randint(-5, 5),
                      length=rng.randint(1, 60),
                      offset=rng.randint(-20, 20))

    window = box2i(0, 0, 7, 7)
    got = render.render_frames(workspace, window, 0, 64)
    for i in range(0, 64, 7):
        frame = workspace.get_frame_f16(i, window)
        np.testing.assert_allclose(
            got[i].astype(np.float32),
            np.asarray(frame.data, np.float32), atol=2e-3,
            err_msg='frame %d' % i)


def test_five_thousand_clip_timeline_plans_fast():
    """Cost is independent of timeline length (the reference's interval
    design axiom, workspace.c:27-60): planning mid-way into a 5000-clip
    timeline touches only the <=8 active layers."""
    import time

    from canvas_tpu import render
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.sources import SolidColorVideoSource, VideoWorkspace

    ws = VideoWorkspace()
    for i in range(5000):
        ws.add(source=SolidColorVideoSource((0.1, 0.2, 0.3, 0.8),
                                            window=box2i(0, 0, 63, 63)),
               x=i * 10, length=80, z=i % 8)
    planner = render.RenderPlanner(ws, box2i(0, 0, 127, 127))
    t0 = time.perf_counter()
    segs = planner.segments(25000, 25100)
    plan_ms = (time.perf_counter() - t0) * 1e3
    assert segs
    assert plan_ms < 500, plan_ms          # ~5 ms measured; huge margin

    out = planner.render(25000, 25002)     # compiles once
    t0 = time.perf_counter()
    out = planner.render(25002, 25004)
    warm_ms = (time.perf_counter() - t0) * 1e3
    assert out.shape[0] == 2
    assert warm_ms < 2000, warm_ms         # ~10 ms measured
