"""Cross-replica training statistics — the ``training_stats`` equivalent.

Reference: ``stylegan2_ada_pytorch/torch_utils/training_stats.py`` — lock-free
per-device (num, sum, sum-of-squares) moment counters, synced across processes
with collectives, consumed through a regex-subscribing ``Collector``.

TPU design: moments are a tiny pytree carried through the jitted step (no
mutable global registry can exist under jit); under pjit the sums reduce
globally for free when computed from sharded arrays.  The host-side
``Collector`` accumulates across steps and reports mean/std like the
reference.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def report(stats: Dict[str, jnp.ndarray], name: str, value) -> Dict:
    """Accumulate (num, sum, sum-sq) moments for ``name`` into ``stats`` (a
    dict carried through the train step).  Returns the updated dict."""
    value = jnp.asarray(value, jnp.float32).reshape(-1)
    moments = jnp.stack(
        [jnp.asarray(value.size, jnp.float32), jnp.sum(value),
         jnp.sum(jnp.square(value))]
    )
    new = dict(stats)
    if name in new:
        new[name] = new[name] + moments
    else:
        new[name] = moments
    return new


class Collector:
    """Host-side accumulator with regex subscription (ref ``Collector``)."""

    def __init__(self, regex: str = ".*"):
        self.pattern = re.compile(regex)
        self.moments: Dict[str, np.ndarray] = {}

    def update(self, stats: Dict[str, jnp.ndarray]):
        for name, m in stats.items():
            if not self.pattern.fullmatch(name):
                continue
            m = np.asarray(m, np.float64)
            if name in self.moments:
                self.moments[name] = self.moments[name] + m
            else:
                self.moments[name] = m

    def num(self, name: str) -> float:
        return float(self.moments.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        m = self.moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self.moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean ** 2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"num": self.num(name), "mean": self.mean(name),
                   "std": self.std(name)}
            for name in self.moments
        }

    def reset(self):
        self.moments = {}
