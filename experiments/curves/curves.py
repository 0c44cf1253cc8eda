"""Synthetic 1-D benchmark curves (reference ``experiments/curves/curves.py:6-146``).

Each curve is standardised to zero mean/unit std over the queried grid;
``regression`` adds iid Gaussian noise, ``classification`` draws Bernoulli
labels through a sigmoid.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


class Curve(ABC):
    seed: int

    @staticmethod
    @abstractmethod
    def _calculate_curve(x: Array) -> Array:
        raise NotImplementedError

    def calculate_curve(self, x: Array) -> Array:
        curve = self._calculate_curve(x)
        return (curve - jnp.mean(curve)) / jnp.std(curve, ddof=1)

    def regression(
        self, x: Array, sigma_true: float, key: KeyArray | int | None = None
    ) -> Array:
        key = as_key(key, default_seed=self.seed)
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        return (self.calculate_curve(x) + sigma_true * noise).reshape(-1)

    @staticmethod
    def classification(y_curve: Array, key: KeyArray | int | None = None) -> Array:
        key = as_key(key)
        probabilities = jax.nn.sigmoid(y_curve)
        return jax.random.bernoulli(key, probabilities)


class Curve1(Curve):
    __name__ = r"$y=2 \sin(0.35 \pi x^2)$"
    seed: int = 1

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return 2 * jnp.sin((x**2) * 0.35 * jnp.pi)


class Curve2(Curve):
    __name__ = r"$y=2\sin(1.5\pi x)$"
    seed: int = 2

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return 2 * jnp.sin(1.5 * x * jnp.pi)


class Curve3(Curve):
    __name__ = r"$y=1.2 \cos(1.5 \pi x)$ - 0.25x"
    seed: int = 3

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return 1.2 * jnp.cos(x * (1.5 * jnp.pi)) - 0.25 * x


class Curve4(Curve):
    __name__ = r"$y=2\sin(0.5\pi x) + 0.6 \cos(2 \pi x) + \sin(\pi x)$"
    seed: int = 4

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return (
            2 * jnp.sin(x * (0.5 * jnp.pi))
            + 0.6 * jnp.cos(x * (2 * jnp.pi))
            + jnp.sin(x * jnp.pi)
        )


class Curve5(Curve):
    __name__ = r"$y=2 \sin(1.5\pi x) + 0.25 x$"
    seed: int = 5

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return 2 * jnp.sin(1.5 * jnp.pi * x) + 0.25 * x


class Curve6(Curve):
    __name__ = r"$y=2 \sin(0.5\pi x^2) + 0.1x$"
    seed: int = 6

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return 2 * jnp.sin(0.5 * jnp.pi * x**2) + 0.1 * x


class Curve7(Curve):
    __name__ = r"$y=4\sin(\pi x) + 2\sin(2 \pi x) -x$"
    seed: int = 7

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return 4 * jnp.sin(x * jnp.pi) + 2 * jnp.sin(x * (2 * jnp.pi)) - x


class Curve8(Curve):
    __name__ = r"$y=6\cos(\pi x) + 3\sin(2 \pi x) -x^2$"
    seed: int = 8

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return 6 * jnp.cos(x * jnp.pi) + 3 * jnp.sin(x * (2 * jnp.pi)) - x**2


class Curve9(Curve):
    __name__ = r"$y=\sin(0.3 \pi (x-2)^2) + 0.1x$"
    seed: int = 9

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return jnp.sin(((x - 2) ** 2) * 0.3 * jnp.pi) + 0.1 * x


class Curve10(Curve):
    __name__ = r"$y=\sqrt{9-x^2} + \sin(\pi x)$"
    seed: int = 10

    @staticmethod
    def _calculate_curve(x: Array) -> Array:
        return jnp.sqrt(9 - x**2) + jnp.sin(jnp.pi * x)


CURVE_FUNCTIONS = [
    Curve1(),
    Curve2(),
    Curve3(),
    Curve4(),
    Curve5(),
    Curve6(),
    Curve7(),
    Curve8(),
    Curve9(),
    Curve10(),
]
