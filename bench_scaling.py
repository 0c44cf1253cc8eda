"""Multi-device scaling curve on a virtual CPU mesh (round-4 VERDICT #7).

Real multi-chip hardware is not reachable from this environment (one
tunneled TPU v5e chip), so the parallel paths are *executed* — not merely
compile-checked — on an 8-way virtual CPU mesh
(``xla_force_host_platform_device_count=8``) and timed at the headline shape
(J=1024 particles, M=512, N=5000). Two independently-implemented parallel
paths are measured:

  * ``shard_map`` (parallel/sharded.py) — explicit collectives: J sharded,
    N shardable with one psum per step for the data drift;
  * GSPMD (parallel/auto.py) — the single-device scan program with sharded
    particle operands, XLA inserts the collectives.

IMPORTANT PROVENANCE: the host has ONE physical core, so all virtual devices
time-share it — aggregate updates/s CANNOT increase with device count here.
What this curve measures (and what is worth committing) is the
partitioning + collective OVERHEAD: aggregate throughput at D devices
divided by the single-device throughput is the parallel-efficiency floor —
on real chips, per-device compute time shrinks ~1/D while this overhead
stays, so `eff = agg(D)/agg(1)` here lower-bounds the fraction of ideal
scaling the program structure permits. The spectral tier has ZERO per-step
communication on the particle axis (purely elementwise); the general tier
psums once per step when the data axis is sharded. Shapes default to a
CPU-feasible N=1024/M=256/J=1024 (override with --n/--m/--j).

Writes results/scaling_curve.json and prints one JSON line per cell.

Run: python bench_scaling.py [--steps 400] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# a registered hardware plugin (the axon TPU tunnel) wins over the
# JAX_PLATFORMS env var — force CPU through the config API instead
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _time(fn, reps):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def _build(n: int, m: int):
    """ONB basis + Gaussian cost at a configurable shape (bench.py's build
    is pinned to the N=5000/M=512 headline, too heavy for the general tier
    on one physical core; the scaling curve measures partition/collective
    overhead, which is shape-stable)."""
    from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
    from projected_langevin_sampling_tpu.models.costs import GaussianCost
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, (n, 1)), axis=0), dtype=jnp.float32)
    kernel = PLSKernel(
        base_kernel=ARDKernel(
            lengthscales=jnp.asarray([0.01], dtype=jnp.float32),
            outputscale=jnp.asarray(1.0, dtype=jnp.float32),
        ),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-3, 3, m)[:, None], dtype=jnp.float32)
    basis = build_orthonormal_basis(kernel, z, x, verbose=False)
    y = jnp.asarray(
        np.sin(2 * np.asarray(x)[:, 0]) + 0.2 * rng.normal(size=n), dtype=jnp.float32
    )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1, jnp.float32))
    return basis, cost


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--n", type=int, default=1024)
    parser.add_argument("--m", type=int, default=256)
    parser.add_argument("--j", type=int, default=1024)
    parser.add_argument("--out", type=str, default="results/scaling_curve.json")
    args = parser.parse_args()

    from projected_langevin_sampling_tpu.parallel import (
        make_mesh,
        parallel_langevin_steps,
    )
    from projected_langevin_sampling_tpu.parallel.auto import parallel_train_pls

    assert len(jax.devices()) == 8, jax.devices()
    basis, cost = _build(args.n, args.m)
    j = int(args.j)
    m = basis.approximation_dimension
    key = jax.random.key(0)
    particles = jax.random.normal(key, (m, j), dtype=jnp.float32)
    eta = 1e-4
    steps = int(args.steps)

    rows = []

    def record(path, mesh_desc, n_dev, run, work_items=None, unit="updates"):
        """``work_items``: units completed per timed call (defaults to the
        Langevin step count; serving cells pass points-per-call)."""
        run()  # compile + warm up
        dt = _time(run, args.reps)
        work = steps if work_items is None else work_items
        rows.append(
            {
                "path": path,
                "mesh": mesh_desc,
                "devices": n_dev,
                "work_items": work,
                "unit": unit,
                "seconds": round(dt, 4),
                "updates_per_s": round(work / dt, 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    # --- shard_map path: particle-axis scaling 1 -> 8, plus a (2,4) mesh
    for shape in [(1, 1), (1, 2), (1, 4), (1, 8), (2, 4), (8, 1)]:
        n_data, n_particles = shape
        n_dev = n_data * n_particles
        mesh = make_mesh(n_data, n_particles, devices=jax.devices()[:n_dev])

        def run(mesh=mesh):
            out, _ = parallel_langevin_steps(
                mesh, basis, cost, particles, key, eta, steps
            )
            jax.block_until_ready(out)

        record("shard_map/general", f"{n_data}x{n_particles}", n_dev, run)

    # --- sharded chunked serving: the chunk axis over the mesh (zero
    # collectives; the heavy per-chunk (M+c)^2 eigh parallelises cleanly)
    from projected_langevin_sampling_tpu.models.pls import PLS

    pls = PLS(basis=basis, cost=cost)
    n_star, chunk = 512, 64
    rng = np.random.default_rng(7)
    x_star = jnp.asarray(
        np.sort(rng.uniform(-3, 3, (n_star, 1)), axis=0), dtype=jnp.float32
    )
    serve_particles = particles[:, :128]
    for n_particles in [1, 2, 4, 8]:
        mesh = make_mesh(1, n_particles, devices=jax.devices()[:n_particles])

        def run(mesh=mesh):
            out = pls.predict_samples(
                particles=serve_particles, x=x_star, key=jax.random.key(3),
                chunk_size=chunk, mesh=mesh,
            )
            jax.block_until_ready(out)

        record(
            "shard_map/serving", f"1x{n_particles}", n_particles, run,
            work_items=n_star, unit="points",
        )

    # --- GSPMD path: spectral tier (zero per-step collectives on J)
    for n_particles in [1, 2, 4, 8]:
        mesh = make_mesh(1, n_particles, devices=jax.devices()[:n_particles])

        def run(mesh=mesh):
            res = parallel_train_pls(
                mesh,
                basis,
                cost,
                particles=particles,
                number_of_epochs=steps,
                step_size=eta,
                key=0,
                fast_path="spectral",
            )
            jax.block_until_ready(res.particles)

        record("gspmd/spectral", f"1x{n_particles}", n_particles, run)

    base = {r["path"]: {} for r in rows}
    for r in rows:
        base[r["path"]][r["devices"]] = r["updates_per_s"]
    efficiency = {
        path: {
            str(d): round(v / by_dev[min(by_dev)], 3) for d, v in by_dev.items()
        }
        for path, by_dev in base.items()
    }
    out = {
        "provenance": {
            "backend": "cpu-virtual-8dev",
            "physical_cores": os.cpu_count(),
            "note": "one physical core time-shares all virtual devices: "
            "aggregate updates/s cannot rise with device count here; "
            "eff(D)=agg(D)/agg(1) lower-bounds the structural parallel "
            "efficiency (partitioning + collective overhead only)",
            "shape": {"J": j, "M": m, "N": args.n, "steps": steps},
        },
        "rows": rows,
        "efficiency_vs_1dev": efficiency,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
