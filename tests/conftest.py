import os

# CPU-only tests with 8 virtual devices for sharding tests; must be set
# before jax import.
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent compilation cache: repeated test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# The environment forces JAX_PLATFORMS=axon (sitecustomize registers the
# tunnel PJRT plugin at interpreter start, before this file runs), so the
# setdefault above does not take and even `jax.devices("cpu")` would
# initialize the axon backend first — which HANGS indefinitely when the
# tunnel is down (round-4/5 post-mortem).  Restrict the platform list to
# cpu before any backend init: tests are CPU-only by design, and this
# also stops pytest from registering a TPU session that a concurrent
# bench run would queue behind (CLAUDE.md gotcha).
from jax._src import xla_bridge as _xb  # noqa: E402
if not _xb._backends:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    jax.config.update("jax_platforms", "cpu")
# Pin default device to CPU explicitly so tests never touch the
# (slow-to-compile) TPU even if a backend was already live.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

# The default matmul precision on this backend is bfloat16 (measured:
# f32 inputs, ~5e-3 relative error). Parity tests compare against torch
# f32 matmuls — pin full f32 so mismatches mean semantics, not precision.
# Production TPU code intentionally keeps the fast default.
jax.config.update("jax_default_matmul_precision", "float32")

import sys  # noqa: E402

import pytest  # noqa: E402

# Pre-import the repo's root entry points so that even if a test later puts
# /root/reference on sys.path (reference_adapter), `import train` etc. keep
# resolving to OUR modules via the sys.modules cache (the reference has
# same-named train.py/translate.py that require `wget`).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
import train  # noqa: E402,F401
import translate  # noqa: E402,F401
import eval_json  # noqa: E402,F401


def pytest_addoption(parser):
    parser.addoption("--regen-golden", action="store_true", default=False,
                     help="regenerate golden decode fixtures")


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
