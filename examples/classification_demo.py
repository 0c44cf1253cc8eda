"""Binary classification on REAL data (UCI WDBC via scikit-learn) with the
round-3 headline PLS protocol, straight from the library API — the same
recipe the UCI classification harness runs at scale
(``experiments/uci/classification/config_precond_smooth.yaml``):

  consistent-KKL ``scaling="nystrom"`` ONB
  + Lambda-preconditioned discretisation (the stable non-Gaussian integrator)
  + empirical-Bayes MAP prior-mean constant
  + FITC-style residual-smoothed Bernoulli cost (the same expected
    log-likelihood SVGP's ELBO optimises).

Reference workload: ``experiments/uci/classification/main.py:190-193`` +
``src/projected_langevin_sampling/costs/bernoulli.py:48-77`` (sigmoid link).

Run: PYTHONPATH=. python examples/classification_demo.py [--device cpu]
"""

from __future__ import annotations

import argparse

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--device", type=str, default=None, help="e.g. cpu to force CPU")
args = parser.parse_args()
if args.device:
    jax.config.update("jax_platforms", args.device)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from sklearn.datasets import load_breast_cancer  # noqa: E402
from sklearn.model_selection import train_test_split  # noqa: E402

import projected_langevin_sampling_tpu as plst  # noqa: E402
from projected_langevin_sampling_tpu.models.costs import (  # noqa: E402
    make_smoothed_bernoulli_cost,
    residual_smoothing_std,
)
from projected_langevin_sampling_tpu.models.link_functions import (  # noqa: E402
    SigmoidLinkFunction,
)
from projected_langevin_sampling_tpu.models.mean_constant import (  # noqa: E402
    fit_mean_constant_map,
)

# 1. real data: Wisconsin Diagnostic Breast Cancer (569 x 30), standardised
data = load_breast_cancer()
x_all = (data.data - data.data.mean(0)) / data.data.std(0)
x_train, x_test, y_train, y_test = train_test_split(
    x_all, data.target.astype(np.float64), test_size=0.2, random_state=0
)
x_train, x_test = jnp.asarray(x_train), jnp.asarray(x_test)
y_train, y_test = jnp.asarray(y_train), jnp.asarray(y_test)

# 2. kernel + greedy inducing points + nystrom-scaled ONB basis
kernel = plst.ARDKernel(
    lengthscales=jnp.full((x_train.shape[1],), 3.0), outputscale=jnp.asarray(1.0)
)
z, _ = plst.ConditionalVarianceInducingPointSelector()(
    x_train, m=64, kernel=kernel, rng=np.random.default_rng(0)
)
pls_kernel = plst.PLSKernel(base_kernel=kernel, approximation_samples=x_train)
basis = plst.build_orthonormal_basis(
    pls_kernel, z, x_train, scaling="nystrom", relative_eigenvalue_threshold=1e-6
)

# 3. residual-smoothed Bernoulli cost (FITC-style expected log-likelihood)
smoothing_std = residual_smoothing_std(basis, kernel(x_train, diag=True))
cost = make_smoothed_bernoulli_cost(y_train=y_train, smoothing_std=smoothing_std)

# 4. empirical-Bayes MAP prior-mean constant (the PLS analogue of SVGP's
#    ELBO-trained ConstantMean)
m0 = fit_mean_constant_map(basis=basis, cost=cost)
basis = basis.replace(mean_constant=m0)
print(f"MAP prior-mean constant: {float(m0):.4f}")

# 5. Langevin gradient flow with the Lambda-preconditioned discretisation
pls = plst.PLS(basis=basis, cost=cost)
particles = pls.initialise_particles(100, key=0)
particles, energies = plst.train_pls(
    pls, particles, number_of_epochs=3000, step_size=1e-3, key=1,
    discretisation="preconditioned",
)
print(f"energy: {float(energies[0]):.1f} -> {float(energies[-1]):.1f}")

# 6. predictive probabilities = mean sigmoid over the particle cloud
link = SigmoidLinkFunction()
probs = jnp.mean(
    link(pls.predict_untransformed_samples(particles=particles, x=x_test)), axis=1
)
acc = float(jnp.mean((probs > 0.5) == (y_test > 0.5)))
eps = 1e-12
nll = float(
    -jnp.mean(y_test * jnp.log(probs + eps) + (1 - y_test) * jnp.log(1 - probs + eps))
)
print(f"test accuracy: {acc:.4f}  test NLL: {nll:.4f}  (n_test={len(y_test)})")
assert acc > 0.9, "expected >90% accuracy on WDBC"
