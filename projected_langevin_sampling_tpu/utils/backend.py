"""Hardware-backend liveness probe with a bounded CPU fallback.

Operational guard for driver-facing entry points (``bench.py``,
``__graft_entry__.entry``): when a hardware plugin is registered but its
transport is dead (e.g. the axon TPU tunnel drops), the first
``jax.devices()`` call blocks indefinitely — there is no client-side
timeout in the plugin discovery path. Probing backend initialisation in a
*subprocess* under a timeout keeps the parent process unpoisoned: backend
init is process-global in JAX, so a failed in-process attempt could not be
retried on CPU afterwards.

No reference-repo counterpart (torch initialises CUDA lazily per call and
raises instead of hanging); this is TPU-tunnel-specific operational code.
"""

from __future__ import annotations

import os
import subprocess
import sys


def backend_initialises(timeout_s: float = 180.0) -> bool:
    """Return True if the default JAX backend initialises within the budget.

    Runs ``jax.devices()`` in a subprocess with the caller's environment so
    the probe sees the same plugin registration (sitecustomize, JAX_PLATFORMS)
    as the caller would.
    """
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s,
                capture_output=True,
                env=os.environ,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def ensure_live_backend(timeout_s: float = 180.0) -> bool:
    """Force the CPU backend when the default backend cannot initialise.

    Returns True when the fallback was applied (callers should tell the
    user which backend actually ran). Must be called before the parent
    process touches any JAX device — backend choice is process-global.
    """
    if backend_initialises(timeout_s):
        return False
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True
