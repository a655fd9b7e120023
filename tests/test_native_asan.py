"""Sanitizer coverage for the native layer (SURVEY §5: host C++ runs
under ASAN in CI). Builds and runs the canvas_av self-test — mux ->
probe -> demux -> decode -> planar-encode — under AddressSanitizer
(leak checking included via LSAN)."""

import os
import shutil
import subprocess

import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, 'native')


def test_canvas_av_selftest_under_asan():
    if shutil.which('g++') is None:
        pytest.skip('no g++')
    proc = subprocess.run(
        ['make', '-C', NATIVE_DIR, 'asan-test'],
        capture_output=True, text=True, timeout=600)
    output = proc.stdout + proc.stderr
    if 'avformat' in output and proc.returncode != 0 and \
            'No such file' in output:
        pytest.skip('libav dev headers unavailable')
    assert proc.returncode == 0, output
    assert 'canvas_av selftest OK' in output
    assert 'ERROR: AddressSanitizer' not in output
    assert 'LeakSanitizer' not in output


def test_canvas_av_selftest_under_tsan():
    """SURVEY §5 race detection: the self-test's threaded phase (four
    concurrent mux/demux/decode instances) under ThreadSanitizer.
    System libav's own internals are suppressed (not TSAN-built); our
    wrapper code is fully checked."""
    if shutil.which('g++') is None:
        pytest.skip('no g++')
    proc = subprocess.run(
        ['make', '-C', NATIVE_DIR, 'tsan-test'],
        capture_output=True, text=True, timeout=600)
    output = proc.stdout + proc.stderr
    if 'avformat' in output and proc.returncode != 0 and \
            'No such file' in output:
        pytest.skip('libav dev headers unavailable')
    assert proc.returncode == 0, output
    assert 'canvas_av selftest OK' in output
    assert 'WARNING: ThreadSanitizer' not in output
