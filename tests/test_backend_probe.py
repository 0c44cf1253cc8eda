"""Tests for the hardware-backend liveness probe (utils/backend.py).

The probe guards driver-facing entry points against a dead TPU tunnel
(whose first device query hangs with no client-side timeout). No reference
counterpart — torch raises on a dead CUDA context instead of hanging.
"""

import subprocess

import pytest

from projected_langevin_sampling_tpu.utils import (
    backend_initialises,
    ensure_live_backend,
)
from projected_langevin_sampling_tpu.utils import backend as backend_module


@pytest.fixture(autouse=True)
def _fresh_probe(monkeypatch):
    """The probe short-circuits under a forced-CPU env (the test conftest
    forces CPU!) and memoises per process — give every test a hardware-like
    env and an empty cache."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("PLST_PLATFORM", raising=False)
    monkeypatch.setattr(backend_module, "_PROBE_CACHE", {})


def test_probe_true_on_clean_exit(monkeypatch):
    # NOTE: a real subprocess probe would init whatever hardware plugin is
    # registered (and hang/fail during a tunnel outage) — the suite must not
    # depend on external tunnel state, so the subprocess is stubbed.
    monkeypatch.setattr(
        backend_module.subprocess,
        "run",
        lambda *a, **k: subprocess.CompletedProcess(a, returncode=0),
    )
    assert backend_initialises(timeout_s=120.0)


def test_probe_false_on_timeout(monkeypatch):
    def fake_run(*args, **kwargs):
        raise subprocess.TimeoutExpired(cmd=args[0], timeout=kwargs["timeout"])

    monkeypatch.setattr(backend_module.subprocess, "run", fake_run)
    assert not backend_initialises(timeout_s=0.01)


def test_probe_false_on_nonzero_exit_echoes_stderr(monkeypatch, capsys):
    monkeypatch.setattr(
        backend_module.subprocess,
        "run",
        lambda *a, **k: subprocess.CompletedProcess(
            a, returncode=1, stderr=b"RuntimeError: axon plugin exploded"
        ),
    )
    assert not backend_initialises()
    # the child's error must reach the parent's stderr — a CPU-fallback
    # headline number is undiagnosable otherwise
    assert "axon plugin exploded" in capsys.readouterr().err


def test_probe_skipped_under_forced_cpu(monkeypatch):
    """JAX_PLATFORMS=cpu cannot hang: the subprocess must not run at all."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):
        raise AssertionError("probe subprocess must not run under forced CPU")

    monkeypatch.setattr(backend_module.subprocess, "run", boom)
    assert backend_initialises()


def test_probe_memoised_per_process(monkeypatch):
    calls = []

    def fake_run(*a, **k):
        calls.append(1)
        return subprocess.CompletedProcess(a, returncode=0)

    monkeypatch.setattr(backend_module.subprocess, "run", fake_run)
    assert backend_initialises(timeout_s=120.0)
    assert backend_initialises(timeout_s=120.0)
    assert len(calls) == 1  # second call served from the cache


@pytest.mark.parametrize("live", [True, False])
def test_ensure_live_backend_fallback(monkeypatch, live):
    import jax

    monkeypatch.setattr(
        backend_module, "backend_initialises", lambda *a, **k: live
    )
    calls = []
    monkeypatch.setattr(
        jax.config, "update", lambda *a: calls.append(a), raising=False
    )
    fell_back = ensure_live_backend(context="test")
    assert fell_back is (not live)
    # only the dead-backend path touches the platform config
    assert calls == ([] if live else [("jax_platforms", "cpu")])
