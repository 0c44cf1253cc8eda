"""Checkpoint save/load (reference ``experiments/loaders.py:10-79``).

The reference torch.saves dicts keyed on file existence (train-or-load); here
checkpoints are pickles of numpy-converted pytrees. Same granularity: whole
model, no mid-run checkpoints — the Langevin run itself is seconds on TPU.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.gaussian_process import SVGP, ExactGP
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel

Array = jax.Array


def _to_np(tree):
    return jax.tree.map(lambda leaf: np.asarray(leaf), tree)


def _pickle_dump(path: str, obj) -> None:
    """Atomic checkpoint write: serialise fully in memory FIRST (any
    conversion error — e.g. a None model attribute — raises before the
    target path is touched), then write a sibling tmp file and rename.
    A crashed save can therefore never leave a truncated/empty pickle that
    poisons the train-or-load existence check on the retry (observed: a
    0-byte svgp-gaussian.pkl after a mid-save crash in the Poisson study)."""
    payload = pickle.dumps(obj)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def save_pls(
    path: str,
    particles: Array,
    observation_noise: float | None,
    best_lr: float | None,
    number_of_epochs: int,
    mean_constant: float | None = None,
    basis=None,
) -> None:
    """PLS checkpoint = {particles, observation_noise, best_lr, epochs}
    (reference ``curves/regression/main.py:259-267``). ``mean_constant``
    records the prior mean the particles were trained under (None = caller
    manages it; needed so ``mean_constant: select`` runs reload correctly).

    ``basis``: pass the trained model's basis to make the checkpoint
    self-contained. Particles are COORDINATES in the basis; the basis itself
    is the output of an eigh (ONB) whose eigenvector signs/order are not
    reproducible across backends or gram dtypes for near-degenerate spectra
    (measured: a breast_wdbc ONB checkpoint trained on TPU at train NLL 0.106
    evaluates to 2.51 when the basis is rebuilt on CPU —
    results/checkpoint_basis_audit.md). The predictive-noise distribution
    object is stripped (caller-owned, re-grafted on load)."""
    basis_tree = None
    if basis is not None:
        basis_tree = _to_np(
            basis.replace(additional_predictive_noise_distribution=None)
        )
    _pickle_dump(
        path,
        {
            "particles": np.asarray(particles),
            "observation_noise": None
            if observation_noise is None
            else float(np.asarray(observation_noise)),
            "best_lr": best_lr,
            "number_of_epochs": number_of_epochs,
            "mean_constant": mean_constant,
            "basis": basis_tree,
        },
    )


def load_pls(path: str, pls=None) -> tuple[Array, float | None, float | None, int]:
    """Returns (particles, observation_noise, best_lr, number_of_epochs);
    sets ``pls.observation_noise`` when a model is passed
    (reference ``loaders.py:10-28``).

    When the checkpoint carries its basis (``save_pls(..., basis=...)``) and a
    model is passed, the saved basis REPLACES the caller-built one — the
    particles then reproduce their train-time predictions bitwise on any
    backend/precision. Old-format checkpoints fall back to the caller's
    rebuilt basis with a warning: the ONB eigh rebuild is only valid on the
    backend+dtype that trained the checkpoint."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    print(f"Loaded PLS particles from {path=}")
    if pls is not None and payload["observation_noise"] is not None:
        pls.observation_noise = payload["observation_noise"]
    if pls is not None and payload.get("basis") is not None:
        restored = jax.tree.map(jnp.asarray, payload["basis"])
        pls.basis = restored.replace(
            additional_predictive_noise_distribution=(
                pls.basis.additional_predictive_noise_distribution
            )
        )
    elif pls is not None:
        print(
            f"  [load_pls] WARNING: {path} is an old-format checkpoint (no "
            "basis payload); particle coordinates are only valid in the "
            "train-time basis, and the eigh rebuild is backend/dtype-"
            "sensitive — predictions may not reproduce off the training "
            "backend (see results/checkpoint_basis_audit.md)"
        )
        if payload.get("mean_constant") is not None:
            pls.basis = pls.basis.replace(mean_constant=payload["mean_constant"])
    return (
        jnp.asarray(payload["particles"]),
        payload["observation_noise"],
        payload["best_lr"],
        payload["number_of_epochs"],
    )


def _kernel_payload(kernel):
    from projected_langevin_sampling_tpu.ops.kernels import PLSKernel

    if isinstance(kernel, PLSKernel):
        return {
            "kind": "pls",
            "lengthscales": np.asarray(kernel.base_kernel.lengthscales),
            "outputscale": np.asarray(kernel.base_kernel.outputscale),
            "approximation_samples": np.asarray(kernel.approximation_samples),
        }
    return {
        "kind": "ard",
        "lengthscales": np.asarray(kernel.lengthscales),
        "outputscale": np.asarray(kernel.outputscale),
    }


def _kernel_from_payload(p):
    from projected_langevin_sampling_tpu.ops.kernels import PLSKernel

    ard = ARDKernel(
        lengthscales=jnp.asarray(p["lengthscales"]),
        outputscale=jnp.asarray(p["outputscale"]),
    )
    if p["kind"] == "pls":
        return PLSKernel(
            base_kernel=ard,
            approximation_samples=jnp.asarray(p["approximation_samples"]),
        )
    return ard


def save_svgp(path: str, model: SVGP, losses: list[float] | None, best_learning_rate) -> None:
    _pickle_dump(
        path,
        {
            "mean_constant": np.asarray(model.mean_constant),
            "kernel": _kernel_payload(model.kernel),
            "likelihood": _to_np(model.likelihood),
            "x_induce": np.asarray(model.x_induce),
            "variational_mean": np.asarray(model.variational_mean),
            "variational_chol": np.asarray(model.variational_chol),
            "losses": losses,
            "best_learning_rate": best_learning_rate,
        },
    )


def load_svgp(path: str, likelihood) -> tuple[SVGP, list[float] | None, float | None]:
    """(reference ``loaders.py:31-55``)."""
    with open(path, "rb") as f:
        p = pickle.load(f)
    print(f"Loaded SVGP from {path=}")
    # The pickled likelihood carries its own static fields (e.g. StudentT
    # degrees_of_freedom, pytree_node=False); mapping against the caller's
    # template would demand identical aux data and fails when a rerun
    # re-estimates those hyperparameters. Trust the checkpoint.
    if type(p["likelihood"]) is not type(likelihood):
        raise TypeError(
            f"Checkpoint likelihood {type(p['likelihood']).__name__} != "
            f"requested {type(likelihood).__name__} at {path}"
        )
    likelihood = jax.tree.map(jnp.asarray, p["likelihood"])
    model = SVGP(
        mean_constant=jnp.asarray(p["mean_constant"]),
        kernel=_kernel_from_payload(p["kernel"]),
        likelihood=likelihood,
        x_induce=jnp.asarray(p["x_induce"]),
        variational_mean=jnp.asarray(p["variational_mean"]),
        variational_chol=jnp.asarray(p["variational_chol"]),
    )
    return model, p["losses"], p["best_learning_rate"]


def save_ard_exact_gp_model(path: str, model: ExactGP, losses: list[float] | None) -> None:
    _pickle_dump(
        path,
        {
            "mean_constant": np.asarray(model.mean_constant),
            "lengthscales": np.asarray(model.kernel.lengthscales),
            "outputscale": np.asarray(model.kernel.outputscale),
            "noise": np.asarray(model.noise),
            "x_train": np.asarray(model.x_train),
            "y_train": np.asarray(model.y_train),
            "losses": losses,
        },
    )


def load_ard_exact_gp_model(path: str) -> tuple[ExactGP, list[float] | None]:
    """(reference ``loaders.py:58-79``)."""
    with open(path, "rb") as f:
        p = pickle.load(f)
    print(f"Loaded ExactGP from {path=}")
    model = ExactGP(
        mean_constant=jnp.asarray(p["mean_constant"]),
        kernel=ARDKernel(
            lengthscales=jnp.asarray(p["lengthscales"]),
            outputscale=jnp.asarray(p["outputscale"]),
        ),
        noise=jnp.asarray(p["noise"]),
        x_train=jnp.asarray(p["x_train"]),
        y_train=jnp.asarray(p["y_train"]),
    )
    return model, p["losses"]
