"""Default-device pinning that honors JAX_PLATFORMS.

Under the axon TPU plugin ``JAX_PLATFORMS=cpu`` does NOT demote the default
backend (CLAUDE.md gotcha): programs silently compile through the TPU
tunnel.  CLI entry points call :func:`honor_jax_platforms` so an explicit
platform request (tests, CPU smoke runs) actually pins the default device;
with JAX_PLATFORMS unset, nothing changes (TPU remains default).
"""

import os


def honor_jax_platforms():
    plat = os.environ.get("JAX_PLATFORMS", "")
    if not plat:
        return
    try:
        import jax
        first = plat.split(",")[0].strip()
        jax.config.update("jax_default_device", jax.devices(first)[0])
    except Exception:
        pass
