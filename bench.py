"""Benchmark: Langevin particle-update throughput at J=1000, M=512, N=5000.

Measures the PRODUCTION training path (the jitted lax.scan in
``training.py`` — update + energy potential + early-stop bookkeeping every
step, exactly what ``train_pls`` runs) on the default JAX backend (the real
TPU chip under the driver; CPU if forced).

One training step is semantically identical to the reference's
``train_pls`` body (experiments/trainers.py:149-161); the baseline in
BENCH_BASELINE.json is the reference op sequence measured in float64 torch
on this machine's CPU (see bench_reference.py).

Default mode prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}
(the headline: best available tier for the ONB+Gaussian flagship).

``--table`` mode benchmarks EVERY applicable (tier x cost) cell —
{off, quadratic, spectral, spectral_fused} x Gaussian plus the general-path
(off) tier for Bernoulli, the representative non-Gaussian workload — and
writes ms/step, updates/s and MFU against this chip's ~49 TF/s matmul roof
to BENCH_TABLE.json + a markdown table on stderr.
"""

import argparse
import json
import sys
import time

import numpy as np

N, M, J = 5000, 512, 1000
# Measured matmul roof of this chip: 100-step scan of 4096^3 jax.lax.dot at
# default precision (the precision the production path uses — XLA lowers f32
# matmuls to a bf16 MXU pass on this TPU): 124 TF/s bf16, 115 TF/s f32.
# (Round 1 recorded 49 TF/s; that measurement was dispatch-bound.)
TPU_ROOF_TFLOPS = 124.0


def build(dtype_name="float32", cost_name="gaussian", basis_kind="onb"):
    import jax.numpy as jnp

    from projected_langevin_sampling_tpu.models.basis import (
        build_inducing_point_basis,
        build_orthonormal_basis,
    )
    from projected_langevin_sampling_tpu.models.costs import BernoulliCost, GaussianCost
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

    dtype = jnp.dtype(dtype_name)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, (N, 1)), axis=0), dtype=dtype)
    f_true = np.sin(2 * np.asarray(x)[:, 0])
    # short lengthscale -> k(Z,Z) ~ I: all M eigenpairs kept, M_k == M == 512
    kernel = PLSKernel(
        base_kernel=ARDKernel(
            lengthscales=jnp.asarray([0.01], dtype=dtype),
            outputscale=jnp.asarray(1.0, dtype=dtype),
        ),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-3, 3, M)[:, None], dtype=dtype)
    if basis_kind == "onb":
        basis = build_orthonormal_basis(kernel, z, x, verbose=False)
        assert basis.approximation_dimension == M, basis.approximation_dimension
    else:
        basis = build_inducing_point_basis(
            kernel, z, jnp.asarray(np.sin(2 * np.linspace(-3, 3, M)), dtype), x
        )
    if cost_name == "gaussian":
        y = jnp.asarray(f_true + 0.2 * rng.normal(size=N), dtype=dtype)
        cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1, dtype=dtype))
    elif cost_name == "bernoulli_smoothed":
        from projected_langevin_sampling_tpu.models.costs import (
            make_smoothed_bernoulli_cost,
        )

        y = jnp.asarray(
            (f_true + 0.2 * rng.normal(size=N) > 0).astype(np.float32), dtype=dtype
        )
        # synthetic per-point stds in the UCI-observed range (the bench basis
        # is reference-scaled, so the Nystrom residual is not defined here;
        # the timing only cares about the quadrature work)
        cost = make_smoothed_bernoulli_cost(
            y_train=y,
            smoothing_std=jnp.asarray(rng.uniform(0.3, 1.2, N), dtype=dtype),
        )
    elif cost_name == "multimodal":
        from projected_langevin_sampling_tpu.models.costs import MultiModalCost

        shift, w = 2.0, 0.4
        y = jnp.asarray(
            f_true - shift * (rng.uniform(size=N) < w) + 0.2 * rng.normal(size=N),
            dtype=dtype,
        )
        cost = MultiModalCost(
            y_train=y,
            observation_noise=jnp.asarray(0.3, dtype=dtype),
            shift=shift,
            bernoulli_noise=w,
        )
    else:
        y = jnp.asarray(
            (f_true + 0.2 * rng.normal(size=N) > 0).astype(np.float32), dtype=dtype
        )
        cost = BernoulliCost(y_train=y)
    return basis, cost


def _flops_per_step(tier, m_k=M, n=N, j=J):
    """MXU FLOPs of ONE training step (energy included), by tier.

    general/off: two (N,M_k)x(M_k,J) matmuls per step (predictions are
    carried across steps — training.py _step_carry_pred); the fused Pallas
    kernel (general_fused) runs the same contraction count = 4 N M_k J
    quadratic:   one (M_k,M_k)x(M_k,J) matmul per step      = 2 M_k^2 J
                 (quadratic_fused on IPB runs 3: drift, energy, noise)
    spectral*:   elementwise only                           = ~0 (PRNG-bound)
    """
    if tier in ("off", "general_fused"):
        return 4.0 * n * m_k * j
    if tier == "quadratic":
        return 2.0 * m_k * m_k * j
    if tier == "quadratic_fused":
        return 6.0 * m_k * m_k * j  # IPB: drift + energy + correlated noise
    return 0.0


def _time_tier(basis, cost, tier, n_steps, reps=3, discretisation="euler"):
    import jax

    from projected_langevin_sampling_tpu.training import (
        _train_pls_scan,
        spectral_system_host,
    )

    particles = basis.initialise_particles(J, key=0)
    key = jax.random.key(0)
    spec = (
        spectral_system_host(basis, cost, discretisation)
        if tier in ("spectral", "spectral_fused")
        else None
    )
    patience = float("inf")

    def run():
        result = _train_pls_scan(
            basis, cost, particles, key, 1e-4, patience, n_steps, tier, spec,
            discretisation,
        )
        jax.block_until_ready(result.particles)

    run()  # warmup / compile
    times = []
    for _ in range(reps):
        start = time.perf_counter()
        run()
        times.append(time.perf_counter() - start)
    best = min(times)
    return {
        "tier": tier,
        "steps": n_steps,
        "sec_per_step": best / n_steps,
        "ms_per_step": 1e3 * best / n_steps,
        "updates_per_sec": n_steps / best,
        "times": times,
    }


def run_table(cpu_fallback: bool = False):
    """Per-(tier x cost) benchmark; writes BENCH_TABLE.json.

    ``cpu_fallback``: the entry point's dead-tunnel CPU fallback — shrink
    the step counts ~20x (the TPU-sized off-tier cells alone are tens of
    minutes each on the 1-core CPU; the fallback's job is to always return,
    not to produce publishable CPU numbers)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    on_tpu = jax.default_backend() != "cpu"
    s = 0.05 if cpu_fallback else 1.0

    cells = [
        # (cost, basis, tier, n_steps[, discretisation]) — step counts sized
        # so each rep runs seconds, amortising the ~35 ms tunnel dispatch
        # latency
        ("gaussian", "onb", "off", max(100, int(2000 * s))),
        ("gaussian", "onb", "quadratic", max(500, int(10000 * s))),
        ("gaussian", "onb", "spectral", max(1000, int(20000 * s))),
        ("gaussian", "ipb", "quadratic", max(500, int(10000 * s))),
        ("gaussian", "ipb", "spectral", max(1000, int(20000 * s))),
        ("bernoulli", "onb", "off", max(100, int(2000 * s))),
    ]
    if on_tpu:
        cells.insert(3, ("gaussian", "onb", "spectral_fused", 20000))
        cells.insert(5, ("gaussian", "ipb", "quadratic_fused", 20000))
        cells.insert(7, ("gaussian", "ipb", "spectral_fused", 20000))
        cells.append(("bernoulli", "onb", "general_fused", 2000))
        # round-3 compositions: the stable (preconditioned) discretisation
        # in-kernel, and the IPB basis on the fused general path via its
        # exact W-space ONB view (training.ipb_w_space_view)
        cells.append(("bernoulli", "onb", "general_fused", 2000, "preconditioned"))
        cells.append(("bernoulli", "ipb", "general_fused", 2000))
        # the headline classification protocol's cost (residual-smoothed,
        # 16-node quadrature in-tile) composed with the preconditioned scheme
        cells.append(
            ("bernoulli_smoothed", "onb", "general_fused", 2000, "preconditioned")
        )
        # round-4: the bimodal mixture's closed-form fused tier (the one cost
        # the reference can only train via autograd) + its XLA baseline
        cells.append(("multimodal", "onb", "off", 2000))
        cells.append(("multimodal", "onb", "general_fused", 2000))

    rows = []
    for cell in cells:
        cost_name, basis_kind, tier, n_steps = cell[:4]
        discretisation = cell[4] if len(cell) > 4 else "euler"
        basis, cost = build(cost_name=cost_name, basis_kind=basis_kind)
        if basis_kind == "ipb" and tier == "general_fused":
            # the fused general kernel is ONB-native; run the IPB process in
            # its exact W-space view (same energies, U = S W)
            from projected_langevin_sampling_tpu.training import ipb_w_space_view

            basis, _, _ = ipb_w_space_view(basis)
        r = _time_tier(basis, cost, tier, n_steps, discretisation=discretisation)
        r["discretisation"] = discretisation
        flops = _flops_per_step(tier)
        r.update(
            cost=cost_name,
            basis=basis_kind,
            gflops_per_step=flops / 1e9,
            tflops_per_sec=flops * r["updates_per_sec"] / 1e12,
            mfu_vs_roof=(flops * r["updates_per_sec"] / 1e12) / TPU_ROOF_TFLOPS
            if on_tpu and flops
            else None,
        )
        rows.append(r)
        tier_label = tier + ("" if discretisation == "euler" else f"[{discretisation}]")
        print(
            f"  {cost_name:9s} {basis_kind:3s} {tier_label:24s} {r['ms_per_step']:8.4f} ms/step "
            f"{r['updates_per_sec']:10.1f} ups "
            f"{r['tflops_per_sec']:6.2f} TF/s"
            + (f"  MFU={100 * r['mfu_vs_roof']:.1f}%" if r["mfu_vs_roof"] else ""),
            file=sys.stderr,
        )

    out = {
        "config": {"N": N, "M": M, "J": J, "dtype": "float32",
                   "device": str(jax.devices()[0]),
                   "backend": jax.default_backend(),
                   "roof_tflops": TPU_ROOF_TFLOPS},
        "rows": rows,
    }
    # never clobber the committed hardware table with CPU rows — keyed on the
    # ACTUAL backend, not just the dead-tunnel probe: a run with
    # JAX_PLATFORMS=cpu / PLST_PLATFORM=cpu (or on a machine without the TPU
    # plugin) initialises fine on CPU and would otherwise overwrite the
    # hardware numbers with full-sized CPU measurements
    table_path = "BENCH_TABLE.json" if on_tpu else "BENCH_TABLE_CPU_FALLBACK.json"
    with open(table_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {table_path}", file=sys.stderr)
    return out


def run_predict(n_star=4096, chunk=256, reps=3, cpu_fallback=False):
    """Serving-path throughput: exact joint predictive draw vs chunked
    serving (``PLS.predict_samples(chunk_size=...)``, O(N*/c (M+c)^3) with
    exact marginals). Reference predict cost is one eigh of an
    (M_k + N*)^2 joint covariance (``orthonormal.py:161-214``)."""
    import jax
    import jax.numpy as jnp

    from projected_langevin_sampling_tpu.models.pls import PLS

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    on_tpu = jax.default_backend() != "cpu"
    if cpu_fallback or not on_tpu:
        # keep the dead-tunnel / CPU run bounded; these sizes are not
        # publishable numbers, only a smoke that the path works
        n_star, reps = min(n_star, 1024), 1
    basis, cost = build()
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(J, key=0)
    rng = np.random.default_rng(7)
    x_star = jnp.asarray(
        np.sort(rng.uniform(-3.2, 3.2, (n_star, 1)), axis=0), dtype=jnp.float32
    )

    rows = []
    for mode, kwargs in (
        ("joint", {}),
        (f"chunked[{chunk}]", {"chunk_size": chunk}),
    ):
        def run():
            s = pls.predict_samples(x=x_star, particles=particles, key=1, **kwargs)
            jax.block_until_ready(s)

        run()  # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        best = min(times)
        rows.append(
            {
                "mode": mode,
                "n_star": n_star,
                "sec": best,
                "points_per_sec": n_star / best,
                "sample_draws_per_sec": n_star * J / best,
            }
        )
        print(
            f"  predict {mode:14s} N*={n_star} J={J}: {best:.3f}s "
            f"({n_star / best:,.0f} points/s, {n_star * J / best:,.0f} draws/s)",
            file=sys.stderr,
        )
    out = {
        "config": {
            "n_star": n_star,
            "J": J,
            "M": M,
            "chunk": chunk,
            "device": str(jax.devices()[0]),
            "backend": jax.default_backend(),
        },
        "rows": rows,
    }
    # same clobber rule as the tier table: CPU numbers never overwrite the
    # committed hardware serving benchmark
    path = "BENCH_PREDICT.json" if on_tpu else "BENCH_PREDICT_CPU_FALLBACK.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}", file=sys.stderr)
    print(json.dumps({"predict": rows}))
    return rows


def main(cpu_fallback: bool = False):
    import jax

    # persistent compile cache: repeated bench runs skip the (slow, tunneled)
    # TPU compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    basis, cost = build()
    # long scan: the axon tunnel adds ~35ms fixed dispatch latency per
    # execution, which would dominate a short run; production Langevin runs
    # are 1e5-1e7 steps (reference uci config maximum_number_of_steps).
    # On CPU (forced, or the dead-tunnel fallback) there is no dispatch
    # latency to amortise — keep the run short so the bench always returns.
    on_cpu = jax.default_backend() == "cpu"
    n_steps = 2_000 if on_cpu else 20_000
    # the fused Pallas tier needs the TPU's hardware PRNG; fall back to the
    # XLA spectral tier elsewhere
    tier = "spectral" if on_cpu else "spectral_fused"
    r = _time_tier(basis, cost, tier, n_steps)
    ups = r["updates_per_sec"]

    try:
        with open("BENCH_BASELINE.json") as f:
            baseline = json.load(f)["updates_per_sec"]
    except (OSError, KeyError):
        baseline = None

    print(
        f"device={jax.devices()[0]}, steps={n_steps}, tier={tier}, times={r['times']}",
        file=sys.stderr,
    )
    record = {
        "metric": "Langevin particle-updates/sec (J=1000, M=512, N=5000, train path incl. energy)",
        "value": round(ups, 2),
        "unit": "updates/sec",
        "vs_baseline": round(ups / baseline, 2) if baseline else None,
        # provenance: a dead-tunnel CPU-fallback number must never read as a
        # TPU regression (the stderr device line is not always recorded)
        "backend": jax.default_backend(),
    }
    if cpu_fallback:
        import os

        record["cpu_fallback"] = True
        reason = (
            "TPU compile service hung on the bench program (device was live)"
            if os.environ.get("PLST_BENCH_FORCE_CPU") == "1"
            else "TPU backend failed to initialise (dead tunnel)"
        )
        record["note"] = (
            f"{reason}; this is an honest CPU number, not hardware "
            "throughput — see BENCH_TABLE.json for the last hardware run"
        )
    print(json.dumps(record))


def _dispatch(args, cpu_fallback: bool) -> None:
    if args.table:
        run_table(cpu_fallback=cpu_fallback)
    elif args.predict:
        run_predict(cpu_fallback=cpu_fallback)
    else:
        main(cpu_fallback=cpu_fallback)


if __name__ == "__main__":
    import os
    import subprocess

    parser = argparse.ArgumentParser()
    parser.add_argument("--table", action="store_true", help="per-tier/cost table")
    parser.add_argument(
        "--predict", action="store_true", help="serving-path predict throughput"
    )
    parser.add_argument("--inner", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args()

    if args.inner:
        # Child of the hang watchdog below; the parent already probed the
        # backend. PLST_BENCH_FORCE_CPU=1 means the hardware attempts hung
        # (live device, stuck compile service) and this run must produce an
        # honest CPU number with that provenance.
        forced = os.environ.get("PLST_BENCH_FORCE_CPU") == "1"
        if forced:
            import jax

            jax.config.update("jax_platforms", "cpu")
        _dispatch(args, cpu_fallback=forced)
        sys.exit(0)

    # a dead axon tunnel would hang the first device query (and with it the
    # driver's round-end bench run); probe + fall back to honest CPU numbers
    from projected_langevin_sampling_tpu.utils import ensure_live_backend

    if ensure_live_backend(context="bench"):
        _dispatch(args, cpu_fallback=True)
        sys.exit(0)

    # Live device — but guard against the other observed tunnel failure mode:
    # jax.devices() answers while the compile service hangs on heavy programs
    # (cold /tmp/jax_cache, observed 2026-08-19: three ~10min silent stalls on
    # a chip that ran a tiny matmul in 2s). Run the bench in a child under a
    # budget (single attempt by default; PLST_BENCH_HW_ATTEMPTS>1 opts into
    # retries), then an honest forced-CPU fallback so the caller always gets
    # a JSON line.
    # Budget sized to the observed slow-service compile time (~18 min for the
    # headline program on 2026-08-19); one attempt by default — when the
    # service is in this state a retry just doubles the wait before the
    # fallback line the caller is owed.
    budget = float(os.environ.get("PLST_BENCH_HW_TIMEOUT", "1800"))
    attempts = int(os.environ.get("PLST_BENCH_HW_ATTEMPTS", "1"))
    child = [sys.executable, os.path.realpath(__file__), "--inner"] + sys.argv[1:]
    for attempt in range(1, attempts + 1):
        try:
            sys.exit(subprocess.run(child, timeout=budget).returncode)
        except subprocess.TimeoutExpired:
            print(
                f"[bench watchdog] hardware attempt {attempt}/{attempts} "
                f"exceeded {budget:.0f}s (compile-service hang?); "
                + ("retrying" if attempt < attempts else "falling back to CPU"),
                file=sys.stderr,
            )
    env = dict(os.environ, PLST_BENCH_FORCE_CPU="1")
    # the CPU path cannot hang on the tunnel; give it its own generous budget
    # independent of a deliberately small hardware budget — and if even that
    # expires (--table on the 1-core CPU), still honour the "caller always
    # gets a JSON line" contract with a minimal error record
    try:
        sys.exit(
            subprocess.run(child, timeout=max(budget, 900.0), env=env).returncode
        )
    except subprocess.TimeoutExpired:
        print(
            json.dumps(
                {
                    "metric": "langevin_updates_per_s",
                    "value": None,
                    "unit": "updates/s",
                    "vs_baseline": None,
                    "error": "cpu fallback exceeded its budget",
                    "backend": "cpu_fallback",
                }
            )
        )
        sys.exit(1)
