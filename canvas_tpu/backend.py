"""Array backend dispatch: NumPy for tiny frames, JAX for real ones.

Every pixel op in ``canvas_tpu.ops`` has two implementations with identical
semantics: a NumPy one (which doubles as the golden reference used by the
kernel tests, mirroring the role of the C code in
/root/reference/src/cprocess/) and a JAX/Pallas one. Device dispatch costs
O(100µs) per call, so frames below a pixel threshold run the NumPy path —
the reference's 1×1-pixel test pulls and the editor's host-side bookkeeping
stay fast — while production-size frames run on the TPU.

The batched render path (canvas_tpu.render) always uses JAX.

Environment / runtime overrides:
    CANVAS_TPU_BACKEND = auto (default) | numpy | jax
"""

import os
import threading

import numpy as np

__all__ = ['get_backend', 'set_backend', 'use_jax_for', 'asnumpy', 'is_jax_array',
           'jax', 'jnp', 'device_pixel_threshold']

# Pixels (per frame) at or above which the JAX path is used in 'auto' mode.
# 2**14 = a 128x128 tile; below that, dispatch overhead beats compute.
device_pixel_threshold = 1 << 14

_state = threading.local()
_DEFAULT = os.environ.get('CANVAS_TPU_BACKEND', 'auto')

_jax = None
_jnp = None
_jax_failed = False


def _load_jax():
    global _jax, _jnp, _jax_failed
    if _jax is None and not _jax_failed:
        try:
            import jax as jax_mod
            import jax.numpy as jnp_mod
            _jax, _jnp = jax_mod, jnp_mod
        except Exception:
            _jax_failed = True
    return _jax


class _LazyModule:
    """Attribute access proxy so ``backend.jnp.float16`` works lazily."""

    def __init__(self, getter):
        self._getter = getter

    def __getattr__(self, name):
        mod = self._getter()
        if mod is None:
            raise RuntimeError('JAX is not available')
        return getattr(mod, name)


jax = _LazyModule(_load_jax)
jnp = _LazyModule(lambda: _load_jax() and _jnp)


def jax_available():
    return _load_jax() is not None


_initialized = False
_init_lock = threading.Lock()
_probe_result = None


def _configured_platforms():
    """The platform list jax will initialize with, WITHOUT initializing:
    in-process config (tests pin 'cpu' here) wins over the environment."""
    if _load_jax() is None:
        return ''
    try:
        value = _jax.config.jax_platforms
    except AttributeError:
        value = None
    return value or os.environ.get('JAX_PLATFORMS', '') or ''


def probe_device(timeout=None, fresh=False):
    """True when the configured JAX platform initializes within
    *timeout* seconds — probed in a SUBPROCESS, because a down remote
    TPU transport hangs ``jax.devices()`` inside native code where no
    in-process watchdog can interrupt it (only a killable process
    bounds it). Cached for the process lifetime (``fresh=True``
    re-probes — retry loops waiting out an outage need live answers);
    CPU-configured processes skip the probe entirely.

    CANVAS_DEVICE_PROBE_TIMEOUT overrides the default 45 s; <= 0
    disables probing (always 'reachable')."""
    global _probe_result
    if fresh:
        _probe_result = None
    if _probe_result is not None:
        return _probe_result
    platforms = _configured_platforms()
    plist = [p for p in platforms.split(',') if p]
    if plist and all(p == 'cpu' for p in plist):
        # every configured platform is CPU: nothing remote to probe.
        # (checking only the FIRST entry would skip the probe for
        # 'cpu,axon', whose init still touches the tunnel)
        _probe_result = True
        return True
    if not plist:
        # jax's own default discovery: '' with a TPU lib present still
        # probes below
        pass
    if timeout is None:
        # the probe computes through the transport, so a cold child
        # pays first-compile (~20-40 s on the tunnel): default must
        # clear that comfortably
        timeout = float(os.environ.get('CANVAS_DEVICE_PROBE_TIMEOUT',
                                       '75'))
    if timeout <= 0 or _load_jax() is None:
        _probe_result = True
        return True
    import subprocess
    import sys
    try:
        # The child must probe the SAME platform the parent will use:
        # an in-process jax.config.update('jax_platforms', ...) is not
        # inherited through the environment, and a child probing jax's
        # default CPU would report a down tunnel as reachable.
        env = dict(os.environ)
        if platforms:
            env['JAX_PLATFORMS'] = platforms
        # share the persistent compile cache so repeat probes skip the
        # 20-40 s first-compile through the tunnel
        env.setdefault('JAX_COMPILATION_CACHE_DIR',
                       '/tmp/canvas_tpu_jax_cache')
        # The child must COMPUTE AND FETCH, not just init: an observed
        # half-up tunnel state lets jax.devices() succeed while the
        # first executed program (or its result fetch) hangs forever.
        _probe_result = subprocess.run(
            [sys.executable, '-c',
             'import jax, jax.numpy as jnp; jax.devices(); '
             'assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0'],
            timeout=timeout, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, env=env).returncode == 0
    except Exception:
        _probe_result = False
    return _probe_result


def ensure_initialized(probe=False):
    """Initialize the JAX backend from the *calling* thread.

    Some TPU runtimes hang if first touched from a non-main thread;
    engine components that spawn render/prefetch threads call this in
    their constructors (normally on the main thread) so device discovery
    and client setup happen before any worker thread runs JAX.

    ``probe=True`` (interactive entry points — playback engine, editor
    app) first checks device reachability in a killable subprocess and
    falls back to CPU when the remote transport is down, so the app
    starts with a logged warning instead of hanging forever on the
    first device op (the editor's alert-not-crash contract,
    _base.py:70-179 in the reference)."""
    global _initialized
    if _initialized:
        return
    # Serialized: a worker thread racing past the flag while the main
    # thread is still inside the (possibly 45 s) probe would first-touch
    # jax off the main thread — the exact hang ensure_initialized
    # exists to prevent. Late callers block here until init completes.
    with _init_lock:
        if _initialized:
            return
        _ensure_initialized_locked(probe)
        _initialized = True


def _ensure_initialized_locked(probe):
    if _load_jax() is not None:
        # Persistent compilation cache for EVERY entry point (scripts,
        # playback, editor — not just the test suite's conftest): first
        # compiles cost seconds on CPU and tens of seconds on the
        # remote chip; the cache makes every later process start warm.
        # config.update (not the env var): jax was already imported by
        # this rig's sitecustomize, so its env snapshot is long taken.
        try:
            if not (_jax.config.jax_compilation_cache_dir
                    or os.environ.get('JAX_COMPILATION_CACHE_DIR')):
                _jax.config.update('jax_compilation_cache_dir',
                                   '/tmp/canvas_tpu_jax_cache')
        except Exception:
            pass
        if probe and not probe_device():
            import logging
            logging.getLogger('canvas_tpu.backend').warning(
                'JAX device platform %r is unreachable (probe timed '
                'out); falling back to CPU for this session',
                _configured_platforms() or 'default')
            try:
                _jax.config.update('jax_platforms', 'cpu')
            except Exception:
                pass
        try:
            _jax.devices()
            import jax.numpy as jnp_mod
            jnp_mod.zeros(8).block_until_ready()
        except Exception:
            pass


def get_backend():
    return getattr(_state, 'backend', _DEFAULT)


def set_backend(name):
    """Set the backend for this thread: 'auto', 'numpy', or 'jax'."""
    if name not in ('auto', 'numpy', 'jax'):
        raise ValueError(name)
    _state.backend = name


class force_backend:
    """Context manager to pin the backend (used heavily in tests)."""

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.saved = get_backend()
        set_backend(self.name)
        return self

    def __exit__(self, *exc):
        set_backend(self.saved)
        return False


def use_jax_for(shape):
    """Decide whether an op over an array of this shape should run on JAX."""
    mode = get_backend()
    if mode == 'numpy':
        return False
    if not jax_available():
        return False
    if mode == 'jax':
        return True
    pixels = 1
    for dim in shape[-2:]:
        pixels *= int(dim)
    return pixels >= device_pixel_threshold


def is_jax_array(arr):
    # load on demand: jax may have been imported outside this module
    # (sitecustomize imports it at interpreter start on this rig), and
    # a stale None here silently routed device arrays down numpy paths
    jax = _jax if _jax is not None else _load_jax()
    if jax is None:
        return False
    return isinstance(arr, jax.Array)


def asnumpy(arr):
    if arr is None:
        return None
    if isinstance(arr, np.ndarray):
        return arr
    return np.asarray(arr)


# --- staging transfer accounting --------------------------------------------

#: Cumulative host->device staging bytes (frame/plane stacks shipped by
#: the render planner). Tests use this to assert that cached replays
#: cross the link zero times; benchmarks report it per config.
transfer_stats = {'h2d_bytes': 0, 'h2d_calls': 0}
_stats_lock = threading.Lock()


def stage_to_device(host_array, mesh=None):
    """device_put for STAGED render inputs, with transfer accounting.

    All planner staging (frame stacks, coded plane stacks) goes through
    here so `transfer_stats` reflects real H2D traffic; replicates over
    *mesh* when sharded programs will consume the array."""
    ensure_initialized()
    jax = _load_jax()
    if jax is None:
        raise RuntimeError('JAX is not available')
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        out = jax.device_put(
            host_array, NamedSharding(mesh, PartitionSpec()))
    else:
        out = jax.device_put(host_array)
    # count AFTER device_put succeeds (a failed staging must not leave
    # phantom traffic in the zero-H2D replay assertions), under the
    # stats lock (prepare thread and main thread both stage)
    with _stats_lock:
        transfer_stats['h2d_bytes'] += int(host_array.nbytes)
        transfer_stats['h2d_calls'] += 1
    return out
