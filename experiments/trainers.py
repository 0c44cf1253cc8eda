"""Training entry points (reference ``experiments/trainers.py:15-162``).

Thin wrappers over the framework's trainers: the PLS Langevin loop is the
jitted scan in ``projected_langevin_sampling_tpu.training``; GP trainers are
the optax loops in ``models/gaussian_process/training``.
"""

from __future__ import annotations

import jax

from experiments.data import Data
from projected_langevin_sampling_tpu.models.gaussian_process import (
    ExactGP,
    SVGP,
    init_svgp,
)
from projected_langevin_sampling_tpu.models.gaussian_process.training import (
    fit_exact_gp,
    fit_svgp,
)
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel
from projected_langevin_sampling_tpu.training import train_pls as _train_pls

Array = jax.Array


def train_pls(
    pls: PLS,
    particles: Array,
    number_of_epochs: int,
    step_size: float,
    early_stopper_patience: float,
    seed: int | None = None,
    fast_path: str = "auto",
    tqdm_desc: str | None = None,  # accepted for signature parity; loop is jitted
    discretisation: str = "euler",
    parallel: dict | None = None,
) -> tuple[Array, list[float]]:
    """Reference ``trainers.py:139-162`` — whole loop runs as one lax.scan.

    ``parallel``: optional mesh shape (``{"data": D, "particles": P}``, from
    the experiment config's ``pls.parallel`` key) — routes the run through
    ``parallel.parallel_train_pls`` on a D x P device mesh (GSPMD over the
    same scan; identical math to single-device up to reduction order)."""
    if parallel:
        from projected_langevin_sampling_tpu.parallel import (
            make_mesh,
            parallel_train_pls,
        )

        mesh = make_mesh(
            int(parallel.get("data", 1)), int(parallel.get("particles", 1))
        )
        result = parallel_train_pls(
            mesh,
            pls,
            particles=particles,
            number_of_epochs=number_of_epochs,
            step_size=step_size,
            early_stopper_patience=early_stopper_patience,
            key=seed if seed is not None else 0,
            fast_path=fast_path,
            discretisation=discretisation,
        )
        energies = [
            float(e)
            for e, r in zip(result.energies.tolist(), result.recorded.tolist())
            if r
        ]
        return result.particles, energies
    return _train_pls(
        pls=pls,
        particles=particles,
        number_of_epochs=number_of_epochs,
        step_size=step_size,
        early_stopper_patience=early_stopper_patience,
        seed=seed if seed is not None else 0,
        fast_path=fast_path,
        discretisation=discretisation,
    )


def train_exact_gp(
    data: Data,
    kernel: ARDKernel,
    seed: int,
    number_of_epochs: int,
    learning_rate: float,
    early_stopper_patience: float,
    noise: float = 1.0,
    mean_constant: float = 0.0,
    model_name: str | None = None,
    fixed_noise_variances=None,
) -> tuple[ExactGP, list[float]]:
    """Adam on the exact MLL (reference ``trainers.py:15-52``)."""
    del seed  # the optax loop is deterministic given the data
    return fit_exact_gp(
        x=data.x,
        y=data.y,
        kernel=kernel,
        noise=noise,
        mean_constant=mean_constant,
        learning_rate=learning_rate,
        number_of_epochs=number_of_epochs,
        early_stopper_patience=early_stopper_patience,
        fixed_noise_variances=fixed_noise_variances,
    )


def train_svgp(
    train_data: Data,
    inducing_points: Data,
    kernel: ARDKernel,
    likelihood,
    seed: int,
    number_of_epochs: int,
    batch_size: int,
    learning_rate: float,
    learn_inducing_locations: bool,
    learn_kernel_parameters: bool,
    early_stopper_patience: float,
    likelihood_noise: float | None = None,
    mean_constant: float = 0.0,
) -> tuple[SVGP | None, list[float] | None]:
    """SGD on the minibatched ELBO (reference ``trainers.py:55-136``)."""
    import jax.numpy as jnp

    if likelihood_noise is not None and hasattr(likelihood, "noise"):
        likelihood = likelihood.replace(noise=jnp.asarray(likelihood_noise))
    svgp = init_svgp(
        mean_constant=mean_constant,
        kernel=kernel,
        likelihood=likelihood,
        x_induce=inducing_points.x,
    )
    return fit_svgp(
        svgp,
        x=train_data.x,
        y=train_data.y,
        number_of_epochs=number_of_epochs,
        batch_size=batch_size,
        learning_rate=learning_rate,
        learn_inducing_locations=learn_inducing_locations,
        learn_kernel_parameters=learn_kernel_parameters,
        # Reference semantics (trainers.py:79-95): ``likelihood_noise`` only
        # INITIALISES model.likelihood.noise.data — the noise parameter stays
        # in ``all_params`` (only kernel params are ever excluded) and is
        # optimised by SGD. Freezing it here (a pre-round-4 bug) pinned SVGP
        # at the averaged subsample-GP noise and produced the overconfident
        # regression NLLs flagged in round 3's audit.
        learn_observation_noise=True,
        early_stopper_patience=early_stopper_patience,
        key=seed,
    )
