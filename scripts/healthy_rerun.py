#!/usr/bin/env python
"""Wait for a HEALTHY tunnel phase, then refresh the phase-sensitive
benchmark rows (latency p50s, config4 streaming, sharded pair) via
``benchmarks.py --only`` and record a bench.py headline.

The latency targets (viewport p50 <= 100 ms) are only meetable with
bulk D2H >= ~28 MB/s; a degraded phase produces honest-but-failing
rows (marked with their link state). This watcher probes in a killable
subprocess every few minutes and fires when the link clears the bar.

Usage: python scripts/healthy_rerun.py [--d2h 28] [--max-hours 6]
       [--once]  (--once: skip the wait, run immediately)
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r'''
import time
import numpy as np, jax, jax.numpy as jnp
a = jnp.ones((256,256), jnp.bfloat16)
t0=time.time(); v=float((a@a).sum()); rtt=time.time()-t0
x = np.ones((4<<20,), np.float32)
t0=time.time(); d=jax.device_put(x); d.block_until_ready(); h2d=16/(time.time()-t0)
t0=time.time(); _=np.asarray(d); d2h=16/(time.time()-t0)
print('%f %f %f' % (rtt, h2d, d2h))
'''

ONLY = ('config4_10layer_1080p_fps,config4_single_frame_p50_ms,'
        'config4_viewport_960x540_p50_ms,config4_viewport_rgb24_p50_ms,config4_viewport_yuv420_p50_ms,config5_sharded,'
        'config3_dv_reconstruct,config6')


def log(msg):
    print('[%s] %s' % (time.strftime('%H:%M:%S'), msg), flush=True)


def probe():
    try:
        r = subprocess.run([sys.executable, '-c', PROBE], timeout=120,
                           capture_output=True, text=True, cwd=ROOT)
        if r.returncode == 0:
            rtt, h2d, d2h = map(float, r.stdout.split()[-3:])
            return rtt, h2d, d2h
    except subprocess.TimeoutExpired:
        pass
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--d2h', type=float, default=28.0)
    ap.add_argument('--max-hours', type=float, default=6.0)
    ap.add_argument('--once', action='store_true')
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    while True:
        if args.once:
            break
        h = probe()
        if h:
            log('probe rtt %.0fms H2D %.0f D2H %.0f' %
                (h[0] * 1e3, h[1], h[2]))
            if h[2] >= args.d2h:
                break
        else:
            log('probe timed out')
        if time.time() > deadline:
            log('GAVE UP: no healthy phase within the window')
            return 1
        time.sleep(180)

    log('healthy phase: refreshing latency rows (%s)' % ONLY)
    r = subprocess.run([sys.executable, 'benchmarks.py', '--only', ONLY],
                       cwd=ROOT, timeout=3600, capture_output=True,
                       text=True)
    sys.stdout.write(r.stdout[-4000:])
    log('benchmarks --only rc=%d' % r.returncode)

    log('bench.py headline')
    r = subprocess.run([sys.executable, 'bench.py'], cwd=ROOT,
                       timeout=900, capture_output=True, text=True)
    sys.stdout.write(r.stdout[-1000:])
    log('bench rc=%d' % r.returncode)
    return 0


if __name__ == '__main__':
    sys.exit(main())
