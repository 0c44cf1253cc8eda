"""Numerics utilities: PSD factorisation, MVN sampling, solves.

The reference's ``sample_multivariate_normal`` (``src/samplers.py:6-44``)
runs ``torch.linalg.eigh`` on the covariance at EVERY call — including once
per Langevin step inside the hot loop (``basis/orthonormal.py:141-145``,
``basis/inducing_point.py:133-137``), where the covariance is constant (I or
k(Z,Z)). The TPU-native design splits this into:

  * ``psd_sqrt(cov)``    — factor once (eigh + clip negative eigenvalues,
                           identical semantics to reference ``samplers.py:27-29``);
  * ``sample_with_factor`` — cheap per-step sampling (one matmul + iid normals).

``sample_multivariate_normal`` keeps the reference's one-shot convenience API
for cold paths (predictive-noise sampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def psd_sqrt(cov: Array) -> Array:
    """Symmetric factor S with S @ S.T == clip_psd(cov).

    eigh + clip negative eigenvalues to zero, matching the reference's
    workaround for non-PSD covariances (``samplers.py:27-29``).
    """
    eigenvalues, eigenvectors = jnp.linalg.eigh(cov)
    eigenvalues = jnp.clip(eigenvalues, 0.0, None)
    return eigenvectors * jnp.sqrt(eigenvalues)[None, :]


def psd_sqrt_host(cov: Array) -> Array:
    """``psd_sqrt`` computed eagerly in HOST float64 (then cast back).

    For build-time factorisations in fp32 production runs: the TPU's device
    eigh is reduced-precision, and LAPACK's fp32 eigh loses digits — the
    factor is constant per model, so it is computed once on the host in fp64
    (the same policy as the ONB basis build and ``spectral_system_host``)."""
    import numpy as np

    cov64 = np.asarray(jax.device_get(cov), dtype=np.float64)
    eigenvalues, eigenvectors = np.linalg.eigh(cov64)
    eigenvalues = np.clip(eigenvalues, 0.0, None)
    factor = eigenvectors * np.sqrt(eigenvalues)[None, :]
    return jnp.asarray(factor, dtype=cov.dtype)


def sample_with_factor(key: jax.Array, factor: Array, size: int, mean: Array | None = None) -> Array:
    """Draw ``size`` MVN samples given a precomputed factor (M, M) -> (M, size)."""
    z = jax.random.normal(key, (factor.shape[1], size), dtype=factor.dtype)
    samples = factor @ z
    if mean is not None:
        samples = samples + mean[:, None]
    return samples


def sample_multivariate_normal(
    key: jax.Array,
    mean: Array,
    cov: Array,
    size: tuple[int, ...] | int | None = None,
) -> Array:
    """One-shot MVN sampling with negative-eigenvalue clipping.

    Mirrors reference ``samplers.py:6-44``: returns shape (*size, M) — the
    transpose convention of the torch version (samples in rows).
    """
    if size is None:
        size = (1,)
    if isinstance(size, int):
        size = (size,)
    factor = psd_sqrt(cov)
    num = 1
    for s in size:
        num *= s
    samples = sample_with_factor(key, factor, num, mean=mean)  # (M, num)
    return samples.T.reshape(*size, mean.shape[0])


def cholesky_factor(matrix: Array, jitter: float = 0.0) -> Array:
    """Lower-Cholesky factor with optional diagonal jitter.

    Replaces the reference's ``gpytorch.solve`` machinery
    (``basis/inducing_point.py:89-93,130-132``): factor once at basis build,
    reuse every step.

    Jit-safe, which means NO PSD error: ``jnp.linalg.cholesky`` returns NaNs
    on a non-PSD input instead of raising. For host-side build-time
    factorisations of borderline grams use :func:`robust_cholesky`, which
    escalates jitter and raises.
    """
    if jitter:
        matrix = matrix + jitter * jnp.eye(matrix.shape[0], dtype=matrix.dtype)
    return jnp.linalg.cholesky(matrix)


def cholesky_solve(chol: Array, rhs: Array) -> Array:
    """Solve A x = rhs given lower Cholesky factor of A."""
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


def psd_safe_cholesky(matrix: Array, base_jitter: float, max_tries: int = 3) -> Array:
    """JIT-SAFE escalating-jitter lower Cholesky — gpytorch's
    ``psd_safe_cholesky`` retry loop (jitter × 10 per attempt, 3 retries)
    expressed as data flow: every candidate factorisation is computed and the
    first finite one is selected. The first candidate uses ``base_jitter``
    exactly, so inputs that never needed escalation are bit-identical to a
    plain ``cholesky(A + base_jitter I)``.

    Why it exists: CPU LAPACK ``spotrf`` NaNs on borderline-PSD fp32 inputs
    that the TPU's blocked algorithm happens to survive — observed on the
    Poisson-study K_zz (diag ~86, cond ~1e8: the 1e-6 fp32 floor NaNs, 1e-5
    factorises), which silently killed every SVGP learning-rate candidate on
    the CPU backend while the same protocol trained fine on the chip.

    Cost: ``max_tries`` extra M^3/3 factorisations; loop-invariant under a
    frozen kernel (XLA hoists them out of the training scan).
    """
    m = matrix.shape[-1]
    eye = jnp.eye(m, dtype=matrix.dtype)
    chol = jnp.linalg.cholesky(matrix + base_jitter * eye)
    for k in range(1, max_tries + 1):
        candidate = jnp.linalg.cholesky(matrix + (base_jitter * 10.0**k) * eye)
        bad = ~jnp.all(jnp.isfinite(chol))
        chol = jnp.where(bad, candidate, chol)
    return chol


def nan_rescued_cholesky(matrix: Array, base_jitter: float = 1e-6, max_tries: int = 5) -> Array:
    """gpytorch ``psd_safe_cholesky`` semantics, jit-safe AND grad-safe: try
    the PLAIN factorisation first (healthy inputs are BIT-IDENTICAL to
    ``jnp.linalg.cholesky``), then escalate jitter 1e-6 -> 1e-5 -> 1e-4 and
    keep the first finite candidate. Rescues numerically singular
    ``K + sigma^2 I`` (e.g. iris_petal: exact duplicate rows + an
    MLL-collapsed noise) exactly the way the reference's gpytorch solve does,
    without perturbing any factorisation that never needed it. The ladder
    extends two steps past gpytorch's 1e-4 cap (to 1e-2): the fp32 matmul
    distance expansion can leave a same-input gram indefinite by ~5e-3 on
    datasets with duplicate rows (iris_petal), where gpytorch's own fp32
    ladder would throw NotPSDError; a last-resort 1e-2 jitter on an O(1)-
    scale kernel trades <1% variance for a finite factorisation and only
    ever fires when every smaller candidate is NaN.

    Implementation note: the candidates are probed under ``stop_gradient``
    and only the SELECTED jitter's factorisation is differentiated. A
    ``jnp.where`` over candidate factors would leak NaN cotangents from the
    failed branch (where() does not block NaN gradients of the unselected
    arm) — the exact-GP MLL gradient would NaN the parameters on the first
    singular epoch, which is how iris_petal kept failing after the forward
    pass alone was rescued."""
    m = matrix.shape[-1]
    eye = jnp.eye(m, dtype=matrix.dtype)
    probe = jax.lax.stop_gradient(matrix)
    jitters = jnp.asarray(
        [0.0] + [base_jitter * 10.0**k for k in range(max_tries)],
        dtype=matrix.dtype,
    )
    ok = jnp.stack(
        [
            jnp.all(jnp.isfinite(jnp.linalg.cholesky(probe + j * eye)))
            for j in [0.0] + [base_jitter * 10.0**k for k in range(max_tries)]
        ]
    )
    selected = jitters[jnp.argmax(ok)]  # first finite candidate (0 if none)
    return jnp.linalg.cholesky(matrix + selected * eye)


def robust_cholesky(matrix: Array, max_tries: int = 6, initial_jitter: float | None = None):
    """Cholesky with escalating jitter, mirroring gpytorch's psd_safe_cholesky
    behaviour that the reference leans on implicitly via ``gpytorch.solve``.

    Host-side (concrete arrays): runs at basis-build time only.
    Returns (chol, jitter_used).
    """
    import numpy as np

    m = np.asarray(matrix)
    if not initial_jitter:  # None or an explicit 0.0: derive a positive floor
        initial_jitter = float(np.finfo(m.dtype).eps) * float(
            np.mean(np.abs(np.diag(m)))
        )
        if initial_jitter <= 0.0:  # zero/neg diagonal: eps itself is the floor
            initial_jitter = float(np.finfo(m.dtype).eps)
    # exact attempt first, then max_tries escalations; the raise reports the
    # largest jitter that was actually TRIED
    jitters = [0.0] + [initial_jitter * 10.0**k for k in range(max_tries)]
    for jitter in jitters:
        try:
            chol = np.linalg.cholesky(m + jitter * np.eye(m.shape[0], dtype=m.dtype))
            return jnp.asarray(chol), jitter
        except np.linalg.LinAlgError:
            continue
    raise ValueError(f"Matrix not PSD even with jitter={jitters[-1]}")
