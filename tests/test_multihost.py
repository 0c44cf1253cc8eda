"""Multi-HOST (multi-process) capability test: 2 processes x 4 simulated CPU
devices each -> one 8-device global mesh, gloo cross-process collectives.

Proves the shard_map training path is process-count-invariant (round-4
VERDICT item 3): the injected-noise chain over a mesh whose data axis (2x4)
or particle axis (1x8) SPANS the process boundary is bit-compared against
the single-device loop inside each worker (``tests/multihost_worker.py``).

Runs in subprocesses because ``jax.distributed.initialize`` is
once-per-process; the in-process test suite keeps its own single-process
8-device backend untouched.
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("num_processes", [2])
def test_two_process_parity(num_processes):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # the worker pins itself to the simulated CPU backend via
    # initialize_multi_host(simulate_cpu_devices=4); scrub any outer backend
    # pinning so that code path is what's under test
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(num_processes), str(port)],
            env=env,
            cwd=ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(num_processes)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MULTIHOST_WORKER_OK" in out, f"worker {i} output:\n{out}"


def test_initialize_multi_host_single_process_noop():
    """No coordinator anywhere -> (0, 1) and JAX stays uninitialised for
    distributed use (safe to call unconditionally at experiment start)."""
    import jax

    from projected_langevin_sampling_tpu.parallel import initialize_multi_host

    assert not jax.distributed.is_initialized()
    assert initialize_multi_host() == (0, 1)
    assert not jax.distributed.is_initialized()
