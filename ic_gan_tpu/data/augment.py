"""DiffAugment — differentiable augmentation for GAN training.

Capability parity with ``BigGAN_PyTorch/diffaugment_utils.py`` (Zhao et al.
2020): color (brightness/saturation/contrast), translation, cutout policies
applied identically to real and fake batches inside the D step.

TPU-first rewrite: NHWC, explicit PRNG keys, and *gather-free* formulations —
translation is implemented with ``jnp.roll``-style index arithmetic expressed
as a batched gather over a padded image (XLA lowers it to dynamic-slice), and
cutout as a computed mask rather than scatter-assignment.  Fully jittable and
differentiable w.r.t. ``x``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def rand_brightness(rng, x):
    b = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), dtype=x.dtype) - 0.5
    return x + b


def rand_saturation(rng, x):
    s = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), dtype=x.dtype) * 2.0
    mean_c = jnp.mean(x, axis=-1, keepdims=True)
    return (x - mean_c) * s + mean_c


def rand_contrast(rng, x):
    c = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), dtype=x.dtype) + 0.5
    mean_all = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean_all) * c + mean_all


def rand_translation(rng, x, ratio: float = 0.125):
    """Per-sample integer shift in [-shift, shift], zero-padded (ref
    ``diffaugment_utils.py:66-87``)."""
    N, H, W, C = x.shape
    shift_y = int(H * ratio + 0.5)
    shift_x = int(W * ratio + 0.5)
    ry, rx = jax.random.split(rng)
    ty = jax.random.randint(ry, (N,), -shift_y, shift_y + 1)
    tx = jax.random.randint(rx, (N,), -shift_x, shift_x + 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    iy = jnp.clip(jnp.arange(H)[None, :] + ty[:, None] + 1, 0, H + 1)  # (N, H)
    ix = jnp.clip(jnp.arange(W)[None, :] + tx[:, None] + 1, 0, W + 1)  # (N, W)
    # Batched gather: out[n,h,w] = xp[n, iy[n,h], ix[n,w]].
    g = jax.vmap(lambda img, yy, xx: img[yy][:, xx])(xp, iy, ix)
    return g


def rand_cutout(rng, x, ratio: float = 0.5):
    """Zero a random (ratio·H, ratio·W) window per sample via a computed mask
    (ref ``diffaugment_utils.py:90-112``)."""
    N, H, W, C = x.shape
    ch = int(H * ratio + 0.5)
    cw = int(W * ratio + 0.5)
    ry, rx = jax.random.split(rng)
    oy = jax.random.randint(ry, (N, 1, 1), 0, H + (1 - ch % 2))
    ox = jax.random.randint(rx, (N, 1, 1), 0, W + (1 - cw % 2))
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    y0 = oy - ch // 2
    x0 = ox - cw // 2
    inside = (
        (yy >= y0) & (yy < y0 + ch) & (xx >= x0) & (xx < x0 + cw)
    )
    mask = jnp.where(inside, 0.0, 1.0).astype(x.dtype)
    return x * mask[:, :, :, None]


AUGMENT_FNS = {
    "color": [rand_brightness, rand_saturation, rand_contrast],
    "translation": [rand_translation],
    "cutout": [rand_cutout],
}


def diff_augment(rng: jax.Array, x: jax.Array, policy: str = "") -> jax.Array:
    """Apply the comma-separated ``policy`` (e.g.
    ``"color,translation,cutout"``) to an NHWC batch."""
    if not policy:
        return x
    for p in policy.split(","):
        for f in AUGMENT_FNS[p]:
            rng, sub = jax.random.split(rng)
            x = f(sub, x)
    return x
