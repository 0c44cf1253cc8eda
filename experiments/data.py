"""Experiment data containers (reference ``experiments/data.py``).

Arrays are JAX arrays (device placement is implicit — the reference's
``__post_init__`` CUDA moves have no analog); persistence is a pickle of the
numpy-converted pytree (the reference uses ``torch.save`` of the dataclass).
"""

from __future__ import annotations

import enum
import pickle
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class ProblemType(str, enum.Enum):
    POISSON_REGRESSION = "poisson_regression"
    REGRESSION = "regression"
    CLASSIFICATION = "classification"
    MULTIMODAL_REGRESSION = "multimodal_regression"


@dataclass
class Data:
    x: Array
    y: Array | None = None
    y_untransformed: Array | None = None
    name: str = "data"


@dataclass
class ExperimentData:
    name: str
    problem_type: ProblemType
    full: Data
    train: Data | None = None
    test: Data | None = None
    validation: Data | None = None
    y_mean: float = 0.0
    y_std: float = 1.0

    def save(self, path: str) -> None:
        def to_np(d: Data | None):
            if d is None:
                return None
            return {
                "x": np.asarray(d.x),
                "y": None if d.y is None else np.asarray(d.y),
                "y_untransformed": None
                if d.y_untransformed is None
                else np.asarray(d.y_untransformed),
                "name": d.name,
            }

        payload = {
            "name": self.name,
            "problem_type": self.problem_type.value,
            "full": to_np(self.full),
            "train": to_np(self.train),
            "test": to_np(self.test),
            "validation": to_np(self.validation),
            "y_mean": float(self.y_mean),
            "y_std": float(self.y_std),
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    @staticmethod
    def load(path: str, problem_type: ProblemType) -> "ExperimentData":
        with open(path, "rb") as f:
            payload = pickle.load(f)

        def from_np(d, name):
            if d is None:
                return None
            return Data(
                x=jnp.asarray(d["x"]),
                y=None if d["y"] is None else jnp.asarray(d["y"]),
                y_untransformed=None
                if d["y_untransformed"] is None
                else jnp.asarray(d["y_untransformed"]),
                name=name,
            )

        return ExperimentData(
            name=payload["name"],
            problem_type=problem_type,
            full=from_np(payload["full"], "full"),
            train=from_np(payload["train"], "train"),
            test=from_np(payload["test"], "test"),
            validation=from_np(payload["validation"], "validation"),
            y_mean=float(payload["y_mean"]),
            y_std=float(payload["y_std"]),
        )
