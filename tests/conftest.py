"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware. Must run before jax
initializes a backend.

Set CANVAS_TEST_TPU=1 to run against the real device instead (slower;
use a subset, e.g. ``CANVAS_TEST_TPU=1 pytest tests/test_render.py``).
"""

import os

_use_tpu = bool(os.environ.get('CANVAS_TEST_TPU'))

# The TPU machine's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so env vars are already consumed; only
# jax.config.update can redirect tests onto the virtual 8-device CPU
# platform. XLA_FLAGS is still read lazily at first backend init.
if not _use_tpu:
    _flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in _flags:
        os.environ['XLA_FLAGS'] = (
            _flags + ' --xla_force_host_platform_device_count=8').strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/canvas_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')

import jax  # noqa: E402

if not _use_tpu:
    jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


@pytest.fixture
def jax_backend():
    """Force the JAX op path regardless of frame size."""
    from canvas_tpu import backend
    with backend.force_backend('jax'):
        yield


@pytest.fixture
def numpy_backend():
    from canvas_tpu import backend
    with backend.force_backend('numpy'):
        yield


@pytest.fixture(params=['numpy', 'jax'])
def any_backend(request):
    """Parametrize a test over both op backends."""
    from canvas_tpu import backend
    with backend.force_backend(request.param):
        yield request.param
