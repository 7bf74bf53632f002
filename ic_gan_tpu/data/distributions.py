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


def sample_gen_labels(
    rng: np.random.Generator,
    n: int,
    n_classes: int,
    longtail_gen: bool = False,
    custom_distrib_gen: bool = False,
    longtail_temperature: float = 1.0,
    constant_conditioning: bool = False,
    class_prob=None,
) -> np.ndarray:
    """Host-side generator-label draw for class-conditional models without
    instance features — the y distribution of ``sample_conditioning_values``
    (ref ``utils.py:879-890`` + ``prepare_z_y`` dispatch ``:904-1016``):
    uniform, empirical long-tail (``longtail_gen``), temperature-annealed
    softmax(log p / T) (``custom_distrib_gen``), or all-zeros
    (``constant_conditioning``)."""
    if constant_conditioning:
        return np.zeros(n, np.int64)
    if longtail_gen or custom_distrib_gen:
        p = np.asarray(class_prob, np.float64).reshape(-1)
        p = p / p.sum()
        if custom_distrib_gen:
            logp = np.log(np.maximum(p, 1e-300))
            p = np.exp(logp / longtail_temperature)
            p = p / p.sum()
        return rng.choice(n_classes, n, replace=True, p=p).astype(np.int64)
    return rng.integers(0, n_classes, size=n).astype(np.int64)


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
