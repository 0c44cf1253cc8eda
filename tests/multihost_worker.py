"""Worker process for the multi-host parity test (run via subprocess by
``tests/test_multihost.py``; not collected by pytest).

Each process: initialise distributed JAX on a simulated CPU backend (4 local
devices, gloo cross-process collectives), build the SAME tiny PLS problem
deterministically, run the injected-noise sharded Langevin chain over a
GLOBAL 8-device mesh, and compare against the single-device reference loop
computed locally. Exercises BOTH cross-process mesh layouts: the data axis
spanning processes (2x4) and the particle axis spanning processes (1x8).

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
Prints ``MULTIHOST_WORKER_OK`` on success (the parent asserts on it).
"""

from __future__ import annotations

import sys


def main() -> int:
    process_id, num_processes, port = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
    )

    from projected_langevin_sampling_tpu.parallel import initialize_multi_host

    pidx, pcount = initialize_multi_host(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
        simulate_cpu_devices=4,
    )
    assert (pidx, pcount) == (process_id, num_processes), (pidx, pcount)
    # idempotence: a second call must be a no-op returning the same topology
    assert initialize_multi_host() == (process_id, num_processes)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)
    assert len(jax.devices()) == 4 * num_processes
    assert len(jax.local_devices()) == 4
    assert jax.process_count() == num_processes

    from projected_langevin_sampling_tpu.models.basis import (
        build_orthonormal_basis,
    )
    from projected_langevin_sampling_tpu.models.costs import GaussianCost
    from projected_langevin_sampling_tpu.models.pls import PLS
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
    from projected_langevin_sampling_tpu.parallel import (
        make_mesh,
        parallel_langevin_steps,
        parallel_langevin_steps_with_noise,
    )

    # identical deterministic problem on every process
    rng = np.random.default_rng(0)
    n, m_induce, j = 32, 8, 16
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    base = ARDKernel(lengthscales=jnp.asarray([0.4]), outputscale=jnp.asarray(1.0))
    kernel = PLSKernel(base_kernel=base, approximation_samples=x)
    z = jnp.asarray(np.linspace(-2, 2, m_induce)[:, None])
    basis = build_orthonormal_basis(
        kernel, z, x, eigenvalue_threshold=1e-2, verbose=False
    )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    m_dim = basis.approximation_dimension
    rng2 = np.random.default_rng(1)
    u0 = jnp.asarray(rng2.normal(size=(m_dim, j)))
    noise_seq = rng2.normal(size=(5, m_dim, j))
    eta = 1e-3

    # single-device reference chain (runs on this process's local device 0)
    u_ref = np.asarray(u0)
    for t in range(noise_seq.shape[0]):
        update = basis.calculate_particle_update(
            jnp.asarray(u_ref),
            cost.calculate_cost_derivative(
                basis.calculate_untransformed_train_prediction_samples(
                    jnp.asarray(u_ref)
                )
            ),
            eta,
            noise=jnp.asarray(noise_seq[t]),
        )
        u_ref = u_ref + np.asarray(update)

    from jax.experimental import multihost_utils

    n_dev = 4 * num_processes
    for mesh_shape in [(num_processes, n_dev // num_processes), (1, n_dev)]:
        mesh = make_mesh(*mesh_shape)
        sharded = parallel_langevin_steps_with_noise(
            mesh, basis, cost, u0, jnp.asarray(noise_seq), eta
        )
        full = multihost_utils.process_allgather(sharded, tiled=True)
        np.testing.assert_allclose(
            np.asarray(full), u_ref, rtol=1e-9, atol=1e-11,
            err_msg=f"mesh={mesh_shape}",
        )

    # stochastic path: cross-process psum'd energy must equal the facade's
    # single-device energy on the gathered particles
    mesh = make_mesh(num_processes, n_dev // num_processes)
    final, energies = parallel_langevin_steps(
        mesh, basis, cost, u0, jax.random.key(0), eta, 3, with_energy=True
    )
    full_final = multihost_utils.process_allgather(final, tiled=True)
    pls = PLS(basis=basis, cost=cost)
    expected_energy = float(
        pls.calculate_energy_potential(jnp.asarray(np.asarray(full_final)))
    )
    # energies is replicated (out_specs P()) hence fully addressable
    got = float(energies[-1])
    assert abs(got - expected_energy) <= 1e-8 * max(1.0, abs(expected_energy)), (
        got,
        expected_energy,
    )

    print("MULTIHOST_WORKER_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
