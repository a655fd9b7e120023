"""Frame function semantics (reference: tests/process/frame_func.py +
basicframefuncs.c / AnimationFunc.c)."""

import numpy as np
import pytest

from canvas_tpu import framefuncs
from canvas_tpu.basetypes import box2i, box2f, rgba, v2i, v2f
from canvas_tpu.framefuncs import (AnimationFunc, AnimationPoint,
                                   ConstFrameFunc, FrameFuncPassThroughFilter,
                                   LerpFunc, LinearFrameFunc, POINT_HOLD,
                                   POINT_LINEAR, as_framefunc)


class TestLinear:
    def test_values(self):
        f = LinearFrameFunc(a=2.0, b=1.0)
        assert f.get_values(3)[0] == (7.0, 0.0, 0.0, 0.0)
        assert f.get_values([0, 1]) == [(1.0, 0.0, 0.0, 0.0),
                                        (3.0, 0.0, 0.0, 0.0)]


class TestLerp:
    def test_endpoints_and_extrapolation(self):
        f = LerpFunc((0.5, 0.25, 2.0, 1.0), (-0.5, -0.25, -2.0, 0.0), 2)
        assert f.get_values(0)[0] == (0.5, 0.25, 2.0, 1.0)
        assert f.get_values(1)[0] == (0.0, 0.0, 0.0, 0.5)
        assert f.get_values(2)[0] == (-0.5, -0.25, -2.0, 0.0)
        # extrapolates beyond length (basicframefuncs.c:160-166)
        assert f.get_values(4)[0] == (-1.5, -0.75, -6.0, -1.0)

    def test_short_tuples_pad_zero(self):
        f = LerpFunc((1,), (3,), 2)
        assert f.get_values(1)[0] == (2.0, 0.0, 0.0, 0.0)

    def test_bad_length(self):
        with pytest.raises(ValueError):
            LerpFunc((0,), (1,), 0)


class TestAsFramefunc:
    def test_constants(self):
        assert as_framefunc(5).get_values(0)[0] == (5.0, 0.0, 0.0, 0.0)
        assert as_framefunc((1, 2)).get_values(0)[0] == (1.0, 2.0, 0.0, 0.0)
        assert as_framefunc(box2i(1, 2, 3, 4)).get_values(0)[0] == (1, 2, 3, 4)
        assert as_framefunc(box2f(v2f(0.5, 1), v2f(2, 3))).get_values(0)[0] == \
            (0.5, 1.0, 2.0, 3.0)
        assert as_framefunc(v2i(7, 8)).get_values(0)[0] == (7.0, 8.0, 0.0, 0.0)
        assert as_framefunc(None).get_values(0)[0] == (0.0, 0.0, 0.0, 0.0)
        # rgba is a 4-tuple
        assert as_framefunc(rgba(1, 0.5, 0.25, 1)).get_values(0)[0] == \
            (1.0, 0.5, 0.25, 1.0)

    def test_passthrough(self):
        f = LinearFrameFunc(1.0, 0.0)
        assert as_framefunc(f) is f

    def test_errors(self):
        with pytest.raises(ValueError):
            as_framefunc(())
        with pytest.raises(ValueError):
            as_framefunc((1, 2, 3, 4, 5))


class TestTypedEval:
    def test_box2i_rounds_half_away_from_zero(self):
        f = ConstFrameFunc((0.5, -0.5, 2.5, -2.5))
        assert framefuncs.get_box2i(f, 0) == box2i(1, -1, 3, -3)

    def test_rgba_clamps_alpha_only(self):
        f = ConstFrameFunc((2.0, -1.0, 0.5, 3.0))
        c = framefuncs.get_rgba_f32(f, 0)
        assert c == rgba(2.0, -1.0, 0.5, 1.0)
        f2 = ConstFrameFunc((0.0, 0.0, 0.0, -0.5))
        assert framefuncs.get_rgba_f32(f2, 0).a == 0.0


class TestAnimationFunc:
    def test_empty(self):
        f = AnimationFunc()
        assert f.get_values(5)[0] == (0.0, 0.0, 0.0, 0.0)

    def test_hold_and_linear(self):
        f = AnimationFunc()
        f.add(POINT_LINEAR, 0, (0.0, 0.0, 0.0, 0.0))
        f.add(POINT_HOLD, 10, (10.0, 0.0, 0.0, 0.0))
        f.add(POINT_LINEAR, 20, (20.0, 0.0, 0.0, 0.0))
        f.add(POINT_LINEAR, 30, (0.0, 0.0, 0.0, 0.0))

        # linear 0..10
        assert f.get_values(5)[0][0] == 5.0
        # hold 10..20
        assert f.get_values(15)[0][0] == 10.0
        assert f.get_values(19.999)[0][0] == 10.0
        # linear 20..30
        assert f.get_values(25)[0][0] == 10.0  # lerp 20 -> 0 at t=0.5
        # before first: first value; after last: last value
        assert f.get_values(-5)[0][0] == 0.0
        assert f.get_values(99)[0][0] == 0.0

    def test_point_mutation_resorts(self):
        f = AnimationFunc()
        p1 = f.add(POINT_LINEAR, 0, (0.0,))
        p2 = f.add(POINT_LINEAR, 10, (10.0,))
        p1.frame = 20  # now p2 comes first
        assert f.get_values(15)[0][0] == pytest.approx(5.0)
        assert [p.frame for p in [f[0], f[1]]] == [10, 20]
        f.remove(p2)
        assert len(f) == 1

    def test_add_point_object(self):
        f = AnimationFunc()
        p = AnimationPoint(POINT_HOLD, 3, (1.0, 2.0))
        f.add(p)
        assert f.get_values(7)[0] == (1.0, 2.0, 0.0, 0.0)


class TestPassThroughFunc:
    def test_offset(self):
        inner = LinearFrameFunc(1.0, 0.0)
        f = FrameFuncPassThroughFilter(inner, offset=5.0)
        assert f.get_values(0)[0] == (5.0, 0.0, 0.0, 0.0)
        # constants are accepted
        f2 = FrameFuncPassThroughFilter((1.0, 2.0), offset=3.0)
        assert f2.get_values(0)[0] == (1.0, 2.0, 0.0, 0.0)


def _close(a, b):
    assert len(a) == len(b)
    for c, d in zip(a, b):
        assert c == pytest.approx(d)


def test_lerp_quad_reference():
    """Port of tests/process/frame_func.py test_quad."""
    func = LerpFunc((1.0, 2.0, 3.0, 4.0), (-1.0, -2.0, -3.0, -4.0), 4)
    _close((1.0, 2.0, 3.0, 4.0), func.get_values(0)[0])
    _close((0.5, 1.0, 1.5, 2.0), func.get_values(1)[0])
    _close((0.0, 0.0, 0.0, 0.0), func.get_values(2)[0])
    _close((-0.5, -1.0, -1.5, -2.0), func.get_values(3)[0])
    _close((-1.0, -2.0, -3.0, -4.0), func.get_values(4)[0])

    want = [(-1.0, -2.0, -3.0, -4.0), (0.5, 1.0, 1.5, 2.0),
            (0.0, 0.0, 0.0, 0.0), (1.0, 2.0, 3.0, 4.0),
            (-0.5, -1.0, -1.5, -2.0)]
    got = func.get_values([4, 1, 2, 0, 3])
    for a, b in zip(want, got):
        _close(a, b)


def test_animation_reference_curve():
    """Port of tests/process/frame_func.py test_AnimationFunc.test_basic:
    hold then two linear segments, evaluated at fractional frames in and
    out of order."""
    func = AnimationFunc()
    func.add(AnimationPoint(POINT_HOLD, 0.0, 4.0))
    func.add(AnimationPoint(POINT_LINEAR, 1.0, 2.0))
    func.add(AnimationPoint(POINT_LINEAR, 2.0, 6.0))

    expectations = [(-0.5, 4.0), (0.0, 4.0), (0.25, 4.0), (0.5, 4.0),
                    (0.75, 4.0), (1.0, 2.0), (1.25, 3.0), (1.5, 4.0),
                    (1.75, 5.0), (2.0, 6.0), (2.5, 6.0)]
    for frame, want in expectations:
        assert func.get_values(frame)[0][0] == pytest.approx(want), frame
    # random order re-reads are stable
    import random
    rng = random.Random(0)
    shuffled = expectations[:]
    rng.shuffle(shuffled)
    for frame, want in shuffled:
        assert func.get_values(frame)[0][0] == pytest.approx(want), frame
