"""Measure the PyTorch REFERENCE implementation's training-step throughput.

gpytorch is not installed in this image, so this re-creates the reference's
exact per-step op sequence (from /root/reference, NOT imported, NOT copied):

  one training step == train_pls body (experiments/trainers.py:149-161):
    1. calculate_untransformed_train_prediction_samples:
       (k(Z,X)^T @ Vt) @ U  — the (N,M)@(M,M_k) product is NOT cached by the
       reference; it is recomputed every step (orthonormal.py:106-108)
    2. cost derivative (Gaussian, identity link): (pred - y)/sigma2
       (costs/gaussian.py:75-88)
    3. particle update: Vt^T @ k(Z,X) @ dc - diag(1/lam) @ U + sqrt(2 eta) e,
       where e is sampled via a FULL eigh of the (constant, identity)
       covariance every step (samplers.py:27, orthonormal.py:140-145)
    4. particles += update
    5. energy potential: recompute train predictions, cost, prior quadratic
       (orthonormal.py:110-126)

  float64 end-to-end (the reference sets torch.set_default_dtype(float64),
  experiments/curves/regression/main.py:401), CPU (torch build is CPU-only
  here; the reference's own profiler measures CPU, profiler/main.py:151).

Writes BENCH_BASELINE.json with updates/sec for the bench config.
"""

import json
import math
import time

import numpy as np
import torch

N, M, J = 5000, 512, 1000
STEP_SIZE = 1e-4
SIGMA2 = 0.1


def build(dtype=torch.float64):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-3, 3, (N, 1)), axis=0)
    z = np.linspace(-3, 3, M)[:, None]
    y = np.sin(2 * x[:, 0]) + 0.2 * rng.normal(size=N)
    # short lengthscale -> well-conditioned k(Z,Z), all M eigenvalues kept
    ls = 0.01

    def rbf(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) / ls) ** 2
        return torch.exp(-0.5 * torch.as_tensor(d2.sum(-1), dtype=dtype))

    k_zz = rbf(z, z)
    k_zx = rbf(z, x)
    lam, v = torch.linalg.eigh(k_zz / M)
    keep = lam > 0.0
    lam, v = lam[keep], v[:, keep]
    scaled_v = v / torch.sqrt(lam.shape[0] * lam)[None, :]
    y_t = torch.as_tensor(y, dtype=dtype)
    return k_zx, scaled_v, lam, y_t


def reference_train_step(particles, k_zx, scaled_v, lam, y, step_size=STEP_SIZE):
    # 1-2: train predictions + Gaussian cost derivative (identity link)
    pred = k_zx.T @ scaled_v @ particles  # (N, M_k) product NOT cached per step
    cost_derivative = (pred - y[:, None]) / SIGMA2
    # 3: noise via the reference's sample_multivariate_normal: eigh EVERY call
    cov = torch.eye(particles.shape[0], dtype=particles.dtype)
    eigenvalues, eigenvectors = torch.linalg.eigh(cov)
    eigenvalues = torch.clip(eigenvalues, 0, None)
    z = torch.normal(0.0, 1.0, size=(eigenvalues.shape[0], particles.shape[1]),
                     dtype=particles.dtype)
    noise = eigenvectors @ torch.diag(torch.sqrt(eigenvalues)) @ z
    update = (
        -step_size * scaled_v.T @ k_zx @ cost_derivative
        - step_size * torch.diag(torch.reciprocal(lam)) @ particles
        + math.sqrt(2.0 * step_size) * noise
    )
    particles = particles + update
    # 5: energy potential (recomputes train predictions + cost)
    pred2 = k_zx.T @ scaled_v @ particles
    cost = (1.0 / (2.0 * SIGMA2)) * torch.square(pred2 - y[:, None]).sum(dim=0)
    energy = (cost + 0.5 * (particles * (torch.diag(torch.reciprocal(lam)) @ particles)).sum(dim=0)).mean().item()
    return particles, energy


def main():
    k_zx, scaled_v, lam, y = build()
    m_k = lam.shape[0]
    particles = torch.normal(0.0, 1.0, size=(m_k, J), dtype=torch.float64)
    # warmup
    particles, _ = reference_train_step(particles, k_zx, scaled_v, lam, y)
    n_steps = 10
    start = time.perf_counter()
    for _ in range(n_steps):
        particles, energy = reference_train_step(particles, k_zx, scaled_v, lam, y)
    elapsed = time.perf_counter() - start
    ups = n_steps / elapsed
    result = {
        "config": {"N": N, "M": M, "M_k": m_k, "J": J, "dtype": "float64",
                   "device": "cpu", "threads": torch.get_num_threads()},
        "updates_per_sec": ups,
        "sec_per_update": elapsed / n_steps,
        "note": "faithful re-implementation of the reference hot loop "
                "(per-step eigh + uncached projection), gpytorch unavailable",
    }
    with open("BENCH_BASELINE.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
