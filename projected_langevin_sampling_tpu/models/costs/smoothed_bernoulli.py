"""Residual-smoothed Bernoulli cost: FITC-style expected log-likelihood.

New capability (no reference counterpart; motivated by the reference's own
comparison protocol, ``experiments/uci/classification/main.py:190-193``).

SVGP scores each training point through the *expected* log-likelihood

    E_{eps ~ N(0, s_i^2)}[log p(y_i | f_i + eps)],
    s_i^2 = k(x_i, x_i) - Q_ii,

where ``Q = Kxz Kzz^{-1} Kzx`` — the latent variance that the rank-``M_k``
inducing approximation cannot represent (our SVGP's ELBO does the same:
``models/gaussian_process/svgp.py`` keeps the ``k_diag - Qff`` residual in
the per-point latent variance). The plain Bernoulli cost (reference
``costs/bernoulli.py:48-62``) scores the projected latent alone, so a
nystrom-scaled PLS trains against a *sharper* likelihood than the SVGP it is
compared to — a small but systematic overconfidence visible as a ~0.01-nat
test-NLL deficit across UCI classification datasets. This cost restores the
symmetry by smoothing the likelihood with exactly the variance the basis
leaves out:

    cost_j = sum_i ( E_z[softplus(F_ij + s_i z)] - y_i F_ij ),  z ~ N(0, 1)

evaluated with Gauss-Hermite quadrature. The derivative is the quadrature of
the sigmoid (d/dF E[softplus(F + s z)] = E[sigmoid(F + s z)]):

    d cost_j / d F_ij = E_z[sigmoid(F_ij + s_i z)] - y_i.

With ``smoothing_std == 0`` both reduce exactly to ``BernoulliCost`` with the
sigmoid link (``softplus(F) - y F == -y log p - (1 - y) log(1 - p)``), which
``tests/test_smoothed_cost.py`` pins.

Kept as its own class (NOT a ``BernoulliCost`` subclass): the fused-kernel
dispatch ``training.general_fused_cost_spec`` tests ``isinstance(cost,
BernoulliCost)`` BEFORE the smoothed branch, so subclassing would silently
drop the smoothing into the plain-sigmoid fused kernel. As its own class it
gets the dedicated ``"bernoulli_sigmoid_smoothed"`` fused cost kind (the
16-node quadrature evaluated in-tile).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.costs.base import PLSCostMixin
from projected_langevin_sampling_tpu.models.distributions import Bernoulli
from projected_langevin_sampling_tpu.models.link_functions import (
    PLSLinkFunction,
    SigmoidLinkFunction,
)

Array = jax.Array


@flax.struct.dataclass
class SmoothedBernoulliCost(PLSCostMixin):
    """Bernoulli cost under Gauss-Hermite smoothing with per-point stds.

    Build with :func:`make_smoothed_bernoulli_cost`; the smoothing stds
    normally come from :func:`residual_smoothing_std`.
    """

    y_train: Array  # (N,) in {0, 1}
    smoothing_std: Array  # (N,) >= 0
    gh_nodes: Array  # (Q,) Hermite nodes (physicists' convention)
    gh_weights: Array  # (Q,) Hermite weights
    link_function: PLSLinkFunction = flax.struct.field(
        pytree_node=False, default=SigmoidLinkFunction()
    )
    observation_noise: None = flax.struct.field(pytree_node=False, default=None)
    # Static provenance of (gh_nodes, gh_weights): "hermgauss" is only set by
    # the factory, which built them from numpy's hermgauss. Fused-tier
    # eligibility keys on this STATIC tag, not the array values — under jit
    # the values are tracers and cannot be inspected, and trusting a tracer
    # would let a custom 16-point rule silently fuse against the kernel's
    # baked-in hermgauss(16) (training a different cost than the off tier).
    gh_rule: str = flax.struct.field(pytree_node=False, default="custom")

    def __post_init__(self):
        # The quadrature identities below are sigmoid-specific; a
        # directly-constructed instance with another link would train sigmoid
        # math while predicting through that link. Fail at build time instead
        # (the factory repeats this check with a friendlier message).
        if not isinstance(self.link_function, SigmoidLinkFunction):
            raise NotImplementedError(
                "SmoothedBernoulliCost implements the sigmoid link only"
            )

    def predict(self, prediction_samples: Array) -> Bernoulli:
        """Same moment-matched predictive as ``BernoulliCost.predict``."""
        return Bernoulli(probs=jnp.mean(prediction_samples, axis=1))

    def _expected(self, F: Array, fn) -> Array:
        """E_{z~N(0,1)}[fn(F + s z)] by Gauss-Hermite, accumulated node by
        node so only (N, J) buffers are ever live (the (N, J, Q) tensor of
        all quadrature points would be a Qx memory blowup of the prediction
        matrix on the XLA/CPU path; the fused Pallas kernel does the same
        accumulation in-tile, ``ops/pallas/general_train.py``)."""
        scale = jnp.sqrt(jnp.asarray(2.0, F.dtype)) * self.smoothing_std[:, None]
        acc = jnp.zeros_like(F)
        for q in range(self.gh_nodes.shape[0]):  # static Q: unrolled at trace
            acc = acc + self.gh_weights[q] * fn(F + scale * self.gh_nodes[q])
        return acc / jnp.sqrt(jnp.asarray(jnp.pi, F.dtype))

    def calculate_cost(self, untransformed_train_prediction_samples: Array) -> Array:
        F = untransformed_train_prediction_samples
        expected_softplus = self._expected(F, jax.nn.softplus)
        return jnp.sum(expected_softplus - self.y_train[:, None] * F, axis=0)

    def calculate_cost_derivative(
        self, untransformed_train_prediction_samples: Array, force_autograd: bool = False
    ) -> Array:
        if force_autograd:
            return self._calculate_cost_derivative_autograd(
                untransformed_train_prediction_samples
            )
        F = untransformed_train_prediction_samples
        expected_sigmoid = self._expected(F, jax.nn.sigmoid)
        return expected_sigmoid - self.y_train[:, None]


def make_smoothed_bernoulli_cost(
    y_train: Array,
    smoothing_std: Array,
    number_of_quadrature_nodes: int = 16,
    link_function: PLSLinkFunction | None = None,
) -> SmoothedBernoulliCost:
    """Construct a :class:`SmoothedBernoulliCost` (sigmoid link only)."""
    if link_function is None:
        link_function = SigmoidLinkFunction()
    if not isinstance(link_function, SigmoidLinkFunction):
        raise NotImplementedError(
            "SmoothedBernoulliCost implements the sigmoid link only "
            "(the softplus/sigmoid quadrature identities are sigmoid-specific)"
        )
    nodes, weights = np.polynomial.hermite.hermgauss(number_of_quadrature_nodes)
    # Promote integer {0,1} labels to float: casting the quadrature constants
    # to an int dtype would truncate most Hermite weights to zero and
    # silently destroy the rule. Floor at float32 for the same reason —
    # bf16/f16 labels would round the 2.6e-10..0.5 Hermite weights to 8-bit
    # mantissas and quietly degrade the 16-node rule.
    y_train = jnp.asarray(y_train)
    if (
        jnp.issubdtype(y_train.dtype, jnp.floating)
        and jnp.finfo(y_train.dtype).bits >= 32
    ):
        dtype = y_train.dtype
    else:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    y_train = y_train.astype(dtype)
    return SmoothedBernoulliCost(
        y_train=y_train,
        smoothing_std=jnp.asarray(smoothing_std, dtype=dtype),
        gh_nodes=jnp.asarray(nodes, dtype=dtype),
        gh_weights=jnp.asarray(weights, dtype=dtype),
        link_function=link_function,
        gh_rule="hermgauss",
    )


def residual_smoothing_std(basis, train_kernel_diag: Array) -> Array:
    """Per-train-point residual std ``sqrt(k_ii - Q_ii)`` of an ONB basis.

    Under ``scaling="nystrom"`` the basis satisfies
    ``B Lambda B^T == Kxz Kzz^{-1}(truncated) Kzx == Qff`` with
    ``B = basis.train_projection``, so ``k_ii - sum_k B_ik^2 lambda_k`` is the
    Nystrom residual variance — the same quantity SVGP's ELBO smooths its
    likelihood with, and the same residual the nystrom predictive already adds
    at test points (``models/basis/orthonormal.py`` Matheron path). Under the
    reference scaling ``B Lambda B^T`` is not ``Qff`` and the quantity has no
    such interpretation, so this raises.
    """
    if getattr(basis, "scaling", None) != "nystrom":
        raise ValueError(
            "residual_smoothing_std requires an OrthonormalBasis built with "
            f'scaling="nystrom" (got {getattr(basis, "scaling", None)!r})'
        )
    q_diag = jnp.sum(
        jnp.square(basis.train_projection) * basis.eigenvalues[None, :], axis=1
    )
    return jnp.sqrt(jnp.clip(jnp.asarray(train_kernel_diag) - q_diag, 0.0, None))
