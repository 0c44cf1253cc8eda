"""PSD factorisation / MVN sampling tests (reference ``tests/test_samplers.py``
strategy: exact distributional behaviour, regenerated for the JAX PRNG)."""

import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.ops.linalg import (
    cholesky_solve,
    psd_sqrt,
    robust_cholesky,
    sample_multivariate_normal,
    sample_with_factor,
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    return jnp.asarray(a @ a.T + n * np.eye(n))


def test_psd_sqrt_reconstructs():
    cov = _spd(6)
    s = psd_sqrt(cov)
    np.testing.assert_allclose(np.asarray(s @ s.T), np.asarray(cov), rtol=1e-8, atol=1e-10)


def test_psd_sqrt_clips_negative_eigenvalues():
    # indefinite matrix: factor reconstructs only the PSD part
    cov = jnp.asarray(np.diag([2.0, -1.0]))
    s = psd_sqrt(cov)
    np.testing.assert_allclose(np.asarray(s @ s.T), np.diag([2.0, 0.0]), atol=1e-12)


def test_sample_multivariate_normal_moments():
    cov = _spd(3, seed=1)
    mean = jnp.asarray([1.0, -2.0, 0.5])
    samples = sample_multivariate_normal(jax.random.key(0), mean, cov, size=(200_000,))
    assert samples.shape == (200_000, 3)
    emp_mean = np.mean(np.asarray(samples), axis=0)
    emp_cov = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(emp_mean, np.asarray(mean), atol=3e-2)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), rtol=0.05, atol=5e-2)


def test_sample_with_factor_deterministic_given_key():
    cov = _spd(4, seed=2)
    f = psd_sqrt(cov)
    a = sample_with_factor(jax.random.key(7), f, 10)
    b = sample_with_factor(jax.random.key(7), f, 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cholesky_solve_roundtrip():
    a = _spd(5, seed=3)
    chol, jitter = robust_cholesky(a)
    assert jitter == 0.0
    rhs = jnp.asarray(np.random.default_rng(4).normal(size=(5, 2)))
    x = cholesky_solve(chol, rhs)
    np.testing.assert_allclose(np.asarray(a @ x), np.asarray(rhs), rtol=1e-8, atol=1e-10)


def test_robust_cholesky_adds_jitter_for_singular():
    a = jnp.asarray(np.ones((3, 3)))  # rank-1
    chol, jitter = robust_cholesky(a)
    assert jitter > 0.0
    assert np.all(np.isfinite(np.asarray(chol)))


def test_robust_cholesky_zero_initial_jitter_still_escalates():
    """An explicit initial_jitter=0.0 (or a zero-diagonal matrix) must not
    degenerate into max_tries identical jitter-free attempts."""
    import numpy as np
    from projected_langevin_sampling_tpu.ops.linalg import robust_cholesky

    # PSD apart from an eps-scale negative eigenvalue: fails at jitter 0,
    # succeeds once the derived eps-level escalation lands
    m = np.eye(3)
    m[0, 0] = -1e-18
    chol, jitter = robust_cholesky(jnp.asarray(m), initial_jitter=0.0)
    assert jitter > 0.0
    assert bool(jnp.isfinite(chol).all())


def test_robust_cholesky_failure_reports_tried_jitter():
    """The PSD failure must report the largest jitter actually attempted."""
    import numpy as np
    import pytest
    from projected_langevin_sampling_tpu.ops.linalg import robust_cholesky

    m = np.diag([-1.0, 1.0])  # indefinite at any tried jitter level
    with pytest.raises(ValueError) as err:
        robust_cholesky(jnp.asarray(m), max_tries=3, initial_jitter=1e-6)
    # tried jitters: 0, 1e-6, 1e-5, 1e-4 — the message must report ~1e-4 (the
    # largest TRIED), not the never-attempted next escalation 1e-3
    reported = float(str(err.value).rsplit("=", 1)[1])
    assert reported == pytest.approx(1e-4, rel=1e-6)


def test_psd_safe_cholesky_escalates_and_preserves_first_candidate():
    """psd_safe_cholesky must (a) be bit-identical to a plain jittered
    cholesky on well-conditioned input, (b) recover a finite factor on a
    matrix whose base-jitter factorisation NaNs in fp32 (the Poisson-study
    K_zz failure: cond ~1e8, diag ~86 — CPU LAPACK NaNs at 1e-6, 1e-5
    factorises), and (c) work under jit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from projected_langevin_sampling_tpu.ops.linalg import psd_safe_cholesky

    # (a) well-conditioned: identical to the single-attempt factorisation
    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 8))
    good = jnp.asarray(a @ a.T + 8 * np.eye(8), dtype=jnp.float32)
    expected = jnp.linalg.cholesky(good + 1e-6 * jnp.eye(8, dtype=good.dtype))
    np.testing.assert_array_equal(
        np.asarray(psd_safe_cholesky(good, 1e-6)), np.asarray(expected)
    )

    # (b) borderline: eigenvalues spanning ~1e8 with a large diagonal, like
    # the squared-spectrum PLS r-kernel K_zz. Construct Q diag(ev) Q^T in
    # fp64, cast to fp32 — the rounding makes the base attempt indefinite.
    q, _ = np.linalg.qr(rng.normal(size=(24, 24)))
    ev = np.geomspace(3e-6, 400.0, 24)
    bad = jnp.asarray(q @ np.diag(ev) @ q.T, dtype=jnp.float32)
    base = jnp.linalg.cholesky(bad + 1e-6 * jnp.eye(24, dtype=bad.dtype))
    safe = psd_safe_cholesky(bad, 1e-6)
    assert bool(jnp.all(jnp.isfinite(safe)))
    recon = np.asarray(safe) @ np.asarray(safe).T
    np.testing.assert_allclose(recon, np.asarray(bad), atol=2e-2, rtol=1e-3)
    if bool(jnp.all(jnp.isfinite(base))):
        # platform factorised the base attempt (TPU's blocked algorithm
        # does): the safe version must then have used it verbatim
        np.testing.assert_array_equal(np.asarray(safe), np.asarray(base))

    # (c) under jit
    jitted = jax.jit(lambda mat: psd_safe_cholesky(mat, 1e-6))(bad)
    np.testing.assert_array_equal(np.asarray(jitted), np.asarray(safe))


def test_nan_rescued_cholesky_bit_identical_when_healthy():
    import numpy as np
    from projected_langevin_sampling_tpu.ops.linalg import nan_rescued_cholesky

    rng = np.random.default_rng(0)
    a = rng.normal(size=(12, 12)).astype(np.float32)
    spd = a @ a.T + 12 * np.eye(12, dtype=np.float32)
    plain = np.asarray(jnp.linalg.cholesky(jnp.asarray(spd)))
    rescued = np.asarray(nan_rescued_cholesky(jnp.asarray(spd)))
    np.testing.assert_array_equal(plain, rescued)  # bit-identical, no jitter


def test_nan_rescued_cholesky_rescues_duplicate_rows():
    """iris_petal failure mode: exact duplicate inputs + collapsed noise
    make K + sigma^2 I numerically singular in fp32 — the plain
    factorisation NaNs, the rescue escalates jitter like gpytorch."""
    import numpy as np
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel
    from projected_langevin_sampling_tpu.ops.linalg import nan_rescued_cholesky

    x = np.asarray(
        [[0.0], [0.0], [0.0], [1.0], [1.0], [2.0], [3.0], [4.0]], dtype=np.float32
    )
    k = ARDKernel(jnp.asarray([1.0]), jnp.asarray(25.0))(jnp.asarray(x), jnp.asarray(x))
    # the failure is an fp32 phenomenon (the sweeps run PLST_X64=0); the
    # test conftest enables x64, so pin the dtype explicitly
    k_noisy = (k + 1e-9 * jnp.eye(len(x), dtype=k.dtype)).astype(jnp.float32)
    plain = jnp.linalg.cholesky(k_noisy)
    rescued = nan_rescued_cholesky(k_noisy)
    assert not bool(jnp.all(jnp.isfinite(plain)))  # the failure is real
    assert bool(jnp.all(jnp.isfinite(rescued)))


def test_nan_rescued_cholesky_gradient_is_finite_on_rescue():
    """The rescue must be GRAD-safe: a jnp.where over candidates leaks NaN
    cotangents from the failed plain branch, which NaN'd the exact-GP MLL
    gradient (and then the parameters) on numerically singular kernels."""
    import numpy as np
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel
    from projected_langevin_sampling_tpu.ops.linalg import nan_rescued_cholesky

    x = jnp.asarray(
        [[0.0], [0.0], [0.0], [1.0], [1.0], [2.0], [3.0], [4.0]],
        dtype=jnp.float32,
    )

    def loss(log_outputscale):
        k = ARDKernel(jnp.asarray([1.0], dtype=jnp.float32), jnp.exp(log_outputscale))(x, x)
        k_noisy = (k + 1e-9 * jnp.eye(len(x), dtype=k.dtype)).astype(jnp.float32)
        chol = nan_rescued_cholesky(k_noisy)
        return jnp.sum(jnp.log(jnp.diagonal(chol)))

    g = jax.grad(loss)(jnp.asarray(jnp.log(25.0), dtype=jnp.float32))
    assert bool(jnp.isfinite(g))
