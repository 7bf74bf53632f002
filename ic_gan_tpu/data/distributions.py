"""Conditioning distributions — JAX-native rewrite of the reference's
``Distribution`` tensor subclass and ``prepare_z_y``/``sample_conditioning_values``
(``data_utils/utils.py:830-1026``).

Instead of a mutable tensor subclass with in-place ``sample_()``, these are
pure samplers keyed by explicit PRNG keys, usable both on host (input
pipeline) and inside jit (fresh z per gradient accumulation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseDist:
    """z ~ N(0, var · I), shape (batch, dim_z) (ref ``normal`` dist)."""

    dim_z: int
    var: float = 1.0

    def sample(self, rng: jax.Array, batch: int) -> jax.Array:
        return jax.random.normal(rng, (batch, self.dim_z)) * jnp.sqrt(self.var)


@dataclasses.dataclass(frozen=True)
class ClassDist:
    """Class-label distribution: uniform categorical, long-tail empirical, or
    temperature-annealed long-tail (ref ``categorical[_longtail[_temperature]]``,
    ``utils.py:975-1016``)."""

    num_classes: int
    class_prob: Optional[np.ndarray] = None  # empirical p(c) (ImageNet-LT)
    temperature: Optional[float] = None

    def _probs(self):
        if self.class_prob is None:
            return None
        p = np.asarray(self.class_prob, dtype=np.float64)
        if self.temperature is not None:
            logp = np.log(p)
            p = np.exp(logp / self.temperature)
            p = p / p.sum()
        return jnp.asarray(p)

    def sample(self, rng: jax.Array, batch: int) -> jax.Array:
        probs = self._probs()
        if probs is None:
            return jax.random.randint(rng, (batch,), 0, self.num_classes)
        return jax.random.categorical(rng, jnp.log(probs)[None, :], shape=(batch,))


def prepare_z_y(
    dim_z: int,
    n_classes: int,
    z_var: float = 1.0,
    longtail_gen: bool = False,
    custom_distrib: bool = False,
    longtail_temperature: float = 1.0,
    class_probabilities=None,
):
    """Build the (z, y) samplers with the reference's dispatch logic
    (``prepare_z_y``, ``utils.py:904-973``)."""
    z = NoiseDist(dim_z=dim_z, var=z_var)
    if longtail_gen:
        y = ClassDist(n_classes, class_prob=class_probabilities)
    elif custom_distrib:
        y = ClassDist(
            n_classes,
            class_prob=class_probabilities,
            temperature=longtail_temperature,
        )
    else:
        y = ClassDist(n_classes)
    return z, y


def make_weights_for_balanced_classes(
    labels: np.ndarray,
    n_classes: int,
    longtail_temperature: float = 1.0,
) -> np.ndarray:
    """Per-sample weights that re-balance a long-tail dataset with a
    temperature-annealed class distribution (ref ``utils.py:227-287``):
    weight(sample) = softmax(log p(c) / T)[c] / count(c)."""
    labels = np.asarray(labels)
    count = np.bincount(labels, minlength=n_classes).astype(np.float64)
    class_prob = count / count.sum()
    logp = np.log(class_prob, out=np.full_like(class_prob, -np.inf),
                  where=class_prob > 0)
    tempered = np.exp(logp / longtail_temperature)
    tempered = tempered / tempered.sum()
    per_class = np.zeros(n_classes)
    nz = count > 0
    per_class[nz] = tempered[nz] / count[nz]
    return per_class[labels]
