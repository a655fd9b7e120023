#!/usr/bin/env python
"""Line coverage for canvas_tpu/ without the coverage package.

Uses sys.monitoring (PEP 669, Python 3.12) LINE events restricted to
files under canvas_tpu/, runs pytest in-process, and writes a per-file
summary (executed lines / executable-ish lines from the code objects)
to /tmp/mini_cov.txt sorted by most-missed.

Usage: python scripts/mini_cov.py [pytest args...]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
PKG = os.path.join(ROOT, 'canvas_tpu') + os.sep

mon = sys.monitoring
TOOL = mon.COVERAGE_ID
mon.use_tool_id(TOOL, 'mini_cov')

executed = {}   # filename -> set of lines
known = {}      # filename -> set of lines (from code objects seen)


def on_line(code, line):
    fn = code.co_filename
    if not fn.startswith(PKG):
        return mon.DISABLE
    executed.setdefault(fn, set()).add(line)
    # One hit per (code, line) is enough — DISABLE keeps this cheap.
    return mon.DISABLE


def on_start(code, _off):
    fn = code.co_filename
    if not fn.startswith(PKG):
        return
    lines = known.setdefault(fn, set())
    for _, _, l in code.co_lines():
        if l is not None:
            lines.add(l)


mon.register_callback(TOOL, mon.events.LINE, on_line)
mon.register_callback(TOOL, mon.events.PY_START, on_start)
mon.set_events(TOOL, mon.events.LINE | mon.events.PY_START)

import pytest  # noqa: E402

rc = pytest.main(sys.argv[1:] or ['tests/', '-q', '-x'])

mon.set_events(TOOL, 0)

# PY_START only sees functions that actually ran; compile every file so
# never-imported/never-called code still counts as missable.
for dirpath, _dirs, files in os.walk(os.path.join(ROOT, 'canvas_tpu')):
    for name in files:
        if not name.endswith('.py'):
            continue
        fn = os.path.join(dirpath, name)
        try:
            with open(fn) as f:
                top = compile(f.read(), fn, 'exec')
        except SyntaxError:
            continue
        lines = known.setdefault(fn, set())
        stack = [top]
        while stack:
            code = stack.pop()
            for _, _, l in code.co_lines():
                if l is not None:
                    lines.add(l)
            for const in code.co_consts:
                if hasattr(const, 'co_lines'):
                    stack.append(const)

rows = []
for fn, lines in sorted(known.items()):
    hit = len(executed.get(fn, set()) & lines)
    total = len(lines)
    rows.append((total - hit, hit, total, fn[len(ROOT) + 1:]))
rows.sort(reverse=True)

out = ['%6s %6s %6s  %s' % ('miss', 'hit', 'total', 'file')]
for miss, hit, total, rel in rows:
    out.append('%6d %6d %6d  %s' % (miss, hit, total, rel))
text = '\n'.join(out) + '\n'
with open('/tmp/mini_cov.txt', 'w') as f:
    f.write(text)

with open('/tmp/mini_cov_lines.txt', 'w') as f:
    for _miss, _hit, _total, rel in rows:
        fn = os.path.join(ROOT, rel)
        missed = sorted(known[fn] - executed.get(fn, set()))
        if missed:
            f.write('%s: %s\n' % (rel, ','.join(map(str, missed))))
print(text[:2000])
print('full report: /tmp/mini_cov.txt')
sys.exit(rc)
