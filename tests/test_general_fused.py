"""Fused general-cost whole-run Pallas trainer (interpret mode on CPU).

Path-exactness is not the contract (hardware PRNG + bf16 MXU operands);
verified here instead:
  * deterministic gradient flow (zero_noise hook) matches a numpy replay of
    the drift + pipelined energy semantics, per supported cost;
  * early stopping freezes particles and NaN-fills the trace exactly like
    the replayed reference EarlyStopper;
  * with noise, the stationary law matches the XLA off-tier moments.
"""

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import (
    BernoulliCost,
    GaussianCost,
    PoissonCost,
    StudentTCost,
)
from projected_langevin_sampling_tpu.models.link_functions import SquareLinkFunction
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.ops.pallas.general_train import (
    general_train_fused,
)
from projected_langevin_sampling_tpu.training import (
    _replay_early_stopper,
    _train_pls_scan,
)
from projected_langevin_sampling_tpu.utils.prng import as_key

N, M, J, STEPS, ETA = 50, 12, 16, 20, 1e-3


def _setup(kind):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (N, 1)), axis=0), dtype=jnp.float32)
    f_true = np.sin(2 * np.asarray(x)[:, 0])
    kernel = PLSKernel(
        base_kernel=ARDKernel(
            lengthscales=jnp.asarray([0.4], dtype=jnp.float32),
            outputscale=jnp.asarray(1.0, dtype=jnp.float32),
        ),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-2, 2, M)[:, None], dtype=jnp.float32)
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-3, verbose=False)
    if kind == "gaussian":
        y = jnp.asarray(f_true + 0.1 * rng.normal(size=N), dtype=jnp.float32)
        cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1, jnp.float32))
        params = (0.1, 0.0, 0.0)
    elif kind == "bernoulli_sigmoid":
        y = jnp.asarray((f_true > 0).astype(np.float32))
        cost = BernoulliCost(y_train=y)
        params = (0.0, 0.0, 0.0)
    elif kind == "bernoulli_sigmoid_smoothed":
        from projected_langevin_sampling_tpu.models.costs import (
            make_smoothed_bernoulli_cost,
        )

        y = jnp.asarray((f_true > 0).astype(np.float32))
        cost = make_smoothed_bernoulli_cost(
            y_train=y,
            smoothing_std=jnp.asarray(
                rng.uniform(0.1, 1.0, N).astype(np.float32)
            ),
        )
        params = (0.0, 0.0, 0.0)
    elif kind == "bernoulli_probit":
        from projected_langevin_sampling_tpu.models.link_functions import (
            ProbitLinkFunction,
        )

        y = jnp.asarray((f_true > 0).astype(np.float32))
        cost = BernoulliCost(y_train=y, link_function=ProbitLinkFunction())
        params = (0.0, 0.0, 0.0)
    elif kind == "poisson_square":
        y = jnp.asarray(rng.poisson(np.exp(f_true)).astype(np.float32))
        cost = PoissonCost(y_train=y, link_function=SquareLinkFunction())
        params = (0.0, 0.0, 0.0)
    elif kind == "student_t":
        y = jnp.asarray(f_true + 0.1 * rng.standard_t(4.0, size=N), dtype=jnp.float32)
        cost = StudentTCost(
            y_train=y,
            degrees_of_freedom=jnp.asarray(4.0, jnp.float32),
            scale=jnp.asarray(0.3, jnp.float32),
        )
        params = (4.0, 0.3, 0.0)
    else:  # multimodal_identity
        from projected_langevin_sampling_tpu.models.costs import MultiModalCost

        shift, w = 2.0, 0.4
        y = jnp.asarray(
            f_true - shift * (rng.uniform(size=N) < w), dtype=jnp.float32
        )
        cost = MultiModalCost(
            y_train=y,
            observation_noise=jnp.asarray(0.3, jnp.float32),
            shift=shift,
            bernoulli_noise=w,
        )
        params = (0.3, shift, w)
    return basis, cost, params


def _numpy_replay(basis, cost, u0, steps, eta):
    """Deterministic (zero-noise) drift + the reference's post-update energy
    trace, with P in bf16 like the kernel's MXU operands."""
    p = np.asarray(basis.train_projection).astype(ml_dtypes.bfloat16)
    inv_lam = 1.0 / np.asarray(basis.eigenvalues, dtype=np.float64)
    u = np.asarray(u0, dtype=np.float64)
    energies = []
    for _ in range(steps):
        f = (
            p.astype(np.float32) @ u.astype(ml_dtypes.bfloat16).astype(np.float32)
        ).astype(np.float64)
        dc = np.asarray(
            cost.calculate_cost_derivative(jnp.asarray(f, dtype=jnp.float32)),
            dtype=np.float64,
        )
        g = (
            p.astype(np.float32).T
            @ dc.astype(ml_dtypes.bfloat16).astype(np.float32)
        ).astype(np.float64)
        u = u - eta * (g + u * inv_lam[:, None])
        f_new = (
            p.astype(np.float32) @ u.astype(ml_dtypes.bfloat16).astype(np.float32)
        ).astype(np.float64)
        cost_j = np.asarray(
            cost.calculate_cost(jnp.asarray(f_new, dtype=jnp.float32)),
            dtype=np.float64,
        )
        prior_j = 0.5 * np.sum(np.square(u) * inv_lam[:, None], axis=0)
        energies.append(float(np.mean(cost_j + prior_j)))
    return u, np.asarray(energies)


@pytest.mark.parametrize(
    "kind",
    [
        "gaussian",
        "bernoulli_sigmoid",
        "bernoulli_sigmoid_smoothed",
        "bernoulli_probit",
        "poisson_square",
        "student_t",
        "multimodal_identity",
    ],
)
def test_deterministic_drift_and_energy_trace(kind):
    # multimodal validates the kernel's closed-form responsibility-weighted
    # gradient directly against the library's autograd (the replay calls
    # cost.calculate_cost_derivative, which is autograd for this cost)
    basis, cost, (p0, p1, p2) = _setup(kind)
    aux = getattr(cost, "smoothing_std", None)
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        u_fused, energies = general_train_fused(
            basis.train_projection,
            u0,
            cost.y_train,
            basis.eigenvalues,
            kind,
            seed=0,
            eta=ETA,
            patience=jnp.inf,
            num_steps=STEPS,
            cost_param0=p0,
            cost_param1=p1,
            cost_param2=p2,
            aux=aux,
            zero_noise=True,
        )
    u_np, e_np = _numpy_replay(basis, cost, u0, STEPS, ETA)
    np.testing.assert_allclose(np.asarray(u_fused), u_np, rtol=2e-2, atol=2e-4)
    np.testing.assert_allclose(np.asarray(energies), e_np, rtol=2e-2)


def test_early_stop_freezes_and_nan_fills():
    basis, cost, (p0, p1, _p2) = _setup("gaussian")
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    # enormous step -> divergence -> non-finite energy -> in-kernel stop
    with pltpu.force_tpu_interpret_mode():
        u_fused, energies = general_train_fused(
            basis.train_projection,
            u0,
            cost.y_train,
            basis.eigenvalues,
            "gaussian",
            seed=0,
            eta=50.0,
            patience=jnp.inf,
            num_steps=STEPS,
            cost_param0=p0,
            zero_noise=True,
        )
    e = np.asarray(energies)
    assert np.isnan(e).any(), "expected a NaN tail after the stop"
    first_nan = int(np.argmax(np.isnan(e)))
    assert not np.isnan(e[:first_nan]).any()
    recorded, steps_run = _replay_early_stopper(energies, 50.0, jnp.inf)
    assert int(steps_run) <= STEPS
    assert np.isfinite(np.asarray(u_fused)).all() or np.isnan(e[-1])


# The stochastic-law (hardware PRNG) tests live in tests/test_tpu_hardware.py
# — run with PLS_TPU_TESTS=1 pytest -m tpu on the chip. (Round 2's version
# here hard-coded a diverging eta and was CPU-skipped, so it never ran.)


def test_training_tier_integration():
    """fast_path='general_fused' resolves per (basis, cost) and the training
    entry point returns the standard TrainResult semantics."""
    from projected_langevin_sampling_tpu.models.costs import MultiModalCost
    from projected_langevin_sampling_tpu.training import resolve_fast_path

    basis, cost, _ = _setup("bernoulli_sigmoid")
    assert resolve_fast_path(basis, cost, "general_fused") == "general_fused"
    smoothed_basis, smoothed_cost, _ = _setup("bernoulli_sigmoid_smoothed")
    assert (
        resolve_fast_path(smoothed_basis, smoothed_cost, "general_fused")
        == "general_fused"
    )
    # round 4: the identity-link mixture fuses too (closed-form
    # responsibility-weighted gradient in-kernel)
    mm = MultiModalCost(
        y_train=cost.y_train,
        observation_noise=jnp.asarray(0.1, jnp.float32),
        shift=1.0,
        bernoulli_noise=0.5,
    )
    assert resolve_fast_path(basis, mm, "general_fused") == "general_fused"
    # ... but only with the identity link — any other link stays on XLA
    from projected_langevin_sampling_tpu.models.link_functions import (
        SigmoidLinkFunction,
    )

    mm_sigmoid = mm.replace(link_function=SigmoidLinkFunction())
    assert resolve_fast_path(basis, mm_sigmoid, "general_fused") == "off"

    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        result = _train_pls_scan(
            basis, cost, u0, as_key(5), ETA, float("inf"), STEPS, "general_fused"
        )
    assert result.particles.shape == u0.shape
    e = np.asarray(result.energies)
    assert np.isfinite(e).all() and e[-1] < e[0]
    assert bool(np.asarray(result.recorded).all())
    assert int(result.steps_run) == STEPS

    # the smoothed cost composes with the preconditioned discretisation
    # in-kernel (the headline classification protocol's fast tier)
    with pltpu.force_tpu_interpret_mode():
        result_s = _train_pls_scan(
            smoothed_basis,
            smoothed_cost,
            u0,
            as_key(5),
            ETA,
            float("inf"),
            STEPS,
            "general_fused",
            discretisation="preconditioned",
        )
    e_s = np.asarray(result_s.energies)
    assert np.isfinite(e_s).all() and e_s[-1] < e_s[0]
