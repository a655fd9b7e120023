"""Timecode semantics (reference: tests/timecode.py behavior)."""

from canvas_tpu.timecode import Frames, NtscDropFrame, TimeAndFrames


class TestFrames:
    def test_roundtrip(self):
        tc = Frames()
        assert tc.format(42) == '42'
        assert tc.parse('42') == 42
        assert tc.format(-7) == '-7'
        assert tc.parse('-7') == -7


class TestTimeAndFrames:
    def test_format(self):
        tc = TimeAndFrames(30)
        assert tc.format(0) == '00:00:00:00'
        assert tc.format(29) == '00:00:00:29'
        assert tc.format(30) == '00:00:01:00'
        assert tc.format(30 * 60) == '00:01:00:00'
        assert tc.format(30 * 60 * 60) == '01:00:00:00'
        assert tc.format(-30) == '-00:00:01:00'

    def test_parse(self):
        tc = TimeAndFrames(30)
        assert tc.parse('00:00:01:00') == 30
        assert tc.parse('01:00:00:00') == 30 * 60 * 60
        assert tc.parse('-00:00:01:00') == -30
        assert tc.parse('1:00') == 30
        assert tc.parse('') == 0

    def test_custom_separator(self):
        tc = TimeAndFrames(24, frames_separator='.')
        assert tc.format(25) == '00:00:01.01'
        assert tc.parse('00:00:01.01') == 25

    def test_ticks(self):
        assert TimeAndFrames(30).get_major_ticks() == [30, 1800, 108000]

    def test_roundtrip_range(self):
        tc = TimeAndFrames(25)
        for frame in range(0, 25 * 60 * 61, 337):
            assert tc.parse(tc.format(frame)) == frame


class TestNtscDropFrame:
    def test_drop_rules(self):
        tc = NtscDropFrame()
        # 00:00:59;29 -> 00:01:00;02
        assert tc.format(30 * 60 - 1) == '00:00:59;29'
        assert tc.format(30 * 60) == '00:01:00;02'
        # minute 10 does not drop: ...09:59;29 -> 00:10:00;00
        ten_min = tc.parse('00:09:59;29') + 1
        assert tc.format(ten_min) == '00:10:00;00'

    def test_roundtrip(self):
        tc = NtscDropFrame()
        for frame in range(0, 30 * 60 * 30, 113):
            assert tc.parse(tc.format(frame)) == frame


def test_drop_frame_canonical_smpte():
    """Canonical SMPTE drop-frame (17982/1798 blocks): the reference's
    naive 1800-frame boundaries produced invalid dropped labels from
    minute 2 on and drifted from external decks (~16 frames per
    10-minute block) — a deliberate reference-bug fix."""
    tc = NtscDropFrame()
    assert tc.format(1799) == '00:00:59;29'
    assert tc.format(1800) == '00:01:00;02'     # minute 1 drops ;00 ;01
    assert tc.format(3598) == '00:02:00;02'     # minute 2 drops too
    assert tc.format(17982) == '00:10:00;00'    # minute 10 does not
    assert tc.format(17983) == '00:10:00;01'
    assert tc.format(107892) == '01:00:00;00'   # exact hour
    for f in (0, 1, 1799, 1800, 3597, 3598, 17981, 17982, 107891,
              107892, 999999):
        assert tc.parse(tc.format(f)) == f, f
