"""Benchmark: Langevin particle-update throughput at J=1000, M=512, N=5000.

Measures the PRODUCTION training path (the jitted lax.scan in
``training.py`` — update + energy potential + early-stop bookkeeping every
step, exactly what ``train_pls`` runs) on the default JAX backend (the real
TPU chip under the driver; CPU if forced).

One training step is semantically identical to the reference's
``train_pls`` body (experiments/trainers.py:149-161); the baseline in
BENCH_BASELINE.json is the reference op sequence measured in float64 torch
on this machine's CPU (see bench_reference.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def build(dtype_name="float32"):
    import jax.numpy as jnp

    from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
    from projected_langevin_sampling_tpu.models.costs import GaussianCost
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

    dtype = jnp.dtype(dtype_name)
    n, m, j = 5000, 512, 1000
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, (n, 1)), axis=0), dtype=dtype)
    y = jnp.asarray(
        np.sin(2 * np.asarray(x)[:, 0]) + 0.2 * rng.normal(size=n), dtype=dtype
    )
    # short lengthscale -> k(Z,Z) ~ I: all M eigenpairs kept, M_k == M == 512
    kernel = PLSKernel(
        base_kernel=ARDKernel(
            lengthscales=jnp.asarray([0.01], dtype=dtype),
            outputscale=jnp.asarray(1.0, dtype=dtype),
        ),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-3, 3, m)[:, None], dtype=dtype)
    basis = build_orthonormal_basis(kernel, z, x, verbose=False)
    assert basis.approximation_dimension == m, basis.approximation_dimension
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1, dtype=dtype))
    return basis, cost, j


def main():
    import jax

    # persistent compile cache: repeated bench runs skip the (slow, tunneled)
    # TPU compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from projected_langevin_sampling_tpu.training import _train_pls_scan

    basis, cost, j = build()
    key = jax.random.key(0)
    particles = basis.initialise_particles(j, key=0)
    # long scan: the axon tunnel adds ~35ms fixed dispatch latency per
    # execution, which would dominate a short run; production Langevin runs
    # are 1e5-1e7 steps (reference uci config maximum_number_of_steps)
    n_steps = 20_000
    patience = float("inf")

    # the fused Pallas tier needs the TPU's hardware PRNG; fall back to the
    # XLA spectral tier elsewhere
    fast_path = "spectral_fused" if jax.default_backend() != "cpu" else "auto"

    # warmup / compile
    result = _train_pls_scan(
        basis, cost, particles, key, 1e-4, patience, n_steps, fast_path
    )
    jax.block_until_ready(result.particles)

    times = []
    for rep in range(3):
        start = time.perf_counter()
        result = _train_pls_scan(
            basis, cost, particles, key, 1e-4, patience, n_steps, fast_path
        )
        jax.block_until_ready(result.particles)
        times.append(time.perf_counter() - start)
    ups = n_steps / min(times)

    try:
        with open("BENCH_BASELINE.json") as f:
            baseline = json.load(f)["updates_per_sec"]
    except (OSError, KeyError):
        baseline = None

    print(
        f"device={jax.devices()[0]}, steps={n_steps}, times={times}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "Langevin particle-updates/sec (J=1000, M=512, N=5000, train path incl. energy)",
                "value": round(ups, 2),
                "unit": "updates/sec",
                "vs_baseline": round(ups / baseline, 2) if baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
