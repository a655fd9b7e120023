#!/usr/bin/env python
"""Opportunistic on-chip work queue for a flapping tunnel.

Runs the round's queued on-chip items sequentially, each in its own
killable subprocess with a hard timeout, waiting for tunnel health
(subprocess probe) before each. One item's hang or failure never
blocks the next; everything logs to stdout with flushes so a driver
tail shows live progress.

Usage: python scripts/onchip_queue.py [item ...]
Items (default all): matrix suite bw bw16 dlp
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print('[%s] %s' % (time.strftime('%H:%M:%S'), msg), flush=True)


def wait_health(max_wait=1800):
    """Killable-subprocess health probe (compute + fetch), retried."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            r = subprocess.run(
                [sys.executable, '-c',
                 'import jax, jax.numpy as jnp; '
                 'assert float(jnp.sum(jnp.ones((256,256)) @ '
                 'jnp.ones((256,256)))) == 16777216.0'],
                timeout=90, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        log('tunnel down; retrying in 60 s')
        time.sleep(60)
    return False


def run(name, cmd, timeout, env=None):
    log('=== %s: %s (timeout %ds)' % (name, ' '.join(cmd), timeout))
    if not wait_health():
        log('%s: SKIPPED (tunnel never came up)' % name)
        return
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    try:
        r = subprocess.run(cmd, timeout=timeout, cwd=ROOT, env=e,
                           stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT, text=True)
        tail = '\n'.join(r.stdout.strip().splitlines()[-25:])
        log('%s: rc=%d in %.0fs\n%s' % (name, r.returncode,
                                        time.time() - t0, tail))
    except subprocess.TimeoutExpired as ex:
        out = ex.stdout
        if isinstance(out, bytes):
            out = out.decode('utf-8', 'replace')
        tail = '\n'.join((out or '').strip().splitlines()[-15:])
        log('%s: TIMEOUT after %.0fs\n%s' % (name, time.time() - t0,
                                             tail))


ITEMS = {
    'matrix': ('python benchmarks.py'.split(), 7200, None),
    'suite': ('python -m pytest tests/ -q'.split(), 5400,
              {'CANVAS_TEST_TPU': '1'}),
    'bw': ('python -u scripts/pass_bandwidth_probe.py'.split(), 1500,
           None),
    'bw16': ('python -u scripts/pass_bandwidth_probe.py --acc16'.split(),
             1500, None),
    'dlp': ('python scripts/device_loop_probe.py --quality 9'.split(),
            900, None),
}


def main():
    names = sys.argv[1:] or ['bw', 'bw16', 'matrix', 'suite', 'dlp']
    unknown = [n for n in names if n not in ITEMS]
    if unknown:
        log('unknown item(s) %s — valid: %s'
            % (unknown, sorted(ITEMS)))
        return 2
    for n in names:
        cmd, t, env = ITEMS[n]
        run(n, cmd, t, env)
    log('queue done')
    return 0


if __name__ == '__main__':
    sys.exit(main())
