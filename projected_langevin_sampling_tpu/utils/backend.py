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

_PROBE_CACHE: dict[float, bool] = {}


def backend_initialises(timeout_s: float = 180.0) -> bool:
    """Return True if the default JAX backend initialises within the budget.

    Runs ``jax.devices()`` in a subprocess (inheriting the caller's
    environment, so the probe sees the same plugin registration —
    sitecustomize, JAX_PLATFORMS — as the caller would). On failure the
    child's stderr is echoed to the parent's stderr: a dead tunnel and an
    unrelated crash (broken sitecustomize, OOM) must stay distinguishable,
    or a CPU-fallback headline number becomes undiagnosable.

    The probe is skipped (True) when the environment already forces the CPU
    backend — CPU init cannot hang, and the subprocess jax import is not
    free. Results are memoised per (process, timeout) — entry points may be
    called repeatedly.
    """
    forced = os.environ.get("JAX_PLATFORMS", "") or os.environ.get(
        "PLST_PLATFORM", ""
    )
    if forced.strip().lower() == "cpu":
        return True
    if timeout_s in _PROBE_CACHE:
        return _PROBE_CACHE[timeout_s]
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        ok = proc.returncode == 0
        if not ok:
            tail = proc.stderr.decode(errors="replace").strip().splitlines()[-8:]
            print(
                "[backend probe] init subprocess failed "
                f"(exit {proc.returncode}); stderr tail:\n" + "\n".join(tail),
                file=sys.stderr,
            )
    except subprocess.TimeoutExpired:
        print(
            f"[backend probe] init subprocess timed out after {timeout_s:.0f}s "
            "(dead transport?)",
            file=sys.stderr,
        )
        ok = False
    _PROBE_CACHE[timeout_s] = ok
    return ok


def ensure_live_backend(timeout_s: float = 180.0, context: str = "") -> bool:
    """Force the CPU backend when the default backend cannot initialise.

    Returns True when the fallback was applied. Must be called before the
    parent process touches any JAX device — backend choice is
    process-global. ``context`` (e.g. "bench") names the caller in the
    single warning line printed on fallback, so entry points don't each
    hand-roll the message.
    """
    if backend_initialises(timeout_s):
        return False
    import jax

    jax.config.update("jax_platforms", "cpu")
    where = f" [{context}]" if context else ""
    print(
        f"WARNING{where}: default JAX backend failed to initialise — "
        "falling back to CPU; numbers below are NOT hardware numbers",
        file=sys.stderr,
    )
    return True
