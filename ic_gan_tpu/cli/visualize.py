"""Qualitative visualization tools: sample sheets, interpolation sheets,
style-mixing grids.

Reference: ``BigGAN_PyTorch/utils.py:1402-1562`` (``sample_sheet`` — per-class
grids; ``interp_sheet`` — z/y interpolation with ``fix_z``/``fix_y`` modes)
and ``stylegan2_ada_pytorch/style_mixing.py`` (row/col seed grid with style
crossover).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.cli.inference import save_image_grid


def sample_sheet(
    apply_fn: Callable,
    dim_z: int,
    conditionings: Sequence,
    samples_per_cond: int = 8,
    z_var: float = 1.0,
    seed: int = 0,
    path: Optional[str] = None,
):
    """One row per conditioning (class label or instance feature), fresh z per
    sample (ref ``utils.py:1402-1460``).

    ``conditionings``: list of (label, feats) tuples (either may be None).
    """
    rows = []
    rng = jax.random.PRNGKey(seed)
    for i, (label, feats) in enumerate(conditionings):
        rng, k = jax.random.split(rng)
        z = jax.random.normal(k, (samples_per_cond, dim_z)) * np.sqrt(z_var)
        lab = None if label is None else jnp.repeat(
            jnp.asarray(label)[None], samples_per_cond, axis=0
        ).reshape(samples_per_cond, *np.shape(label))
        f = None if feats is None else jnp.repeat(
            jnp.asarray(feats)[None], samples_per_cond, axis=0
        )
        rows.append(np.asarray(apply_fn(z, lab, f)))
    sheet = np.concatenate(rows)
    if path:
        save_image_grid(sheet, path, nrow=samples_per_cond)
    return sheet


def interp_sheet(
    apply_fn: Callable,
    dim_z: int,
    num_midpoints: int = 8,
    num_rows: int = 4,
    fix_z: bool = False,
    fix_feats: bool = False,
    feats_bank: Optional[np.ndarray] = None,
    z_var: float = 1.0,
    seed: int = 0,
    path: Optional[str] = None,
):
    """Interpolation sheet (ref ``interp_sheet``, ``utils.py:1466-1562``):
    each row interpolates z and/or the instance feature between two endpoints;
    ``fix_z`` holds z constant across the row, ``fix_feats`` holds the
    conditioning constant."""
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    n = num_rows
    steps = num_midpoints + 2
    t = jnp.linspace(0.0, 1.0, steps)[None, :, None]

    if fix_z:
        z = jax.random.normal(k1, (n, 1, dim_z)) * np.sqrt(z_var)
        zs = jnp.broadcast_to(z, (n, steps, dim_z))
    else:
        zA = jax.random.normal(k1, (n, 1, dim_z)) * np.sqrt(z_var)
        zB = jax.random.normal(k2, (n, 1, dim_z)) * np.sqrt(z_var)
        zs = zA + (zB - zA) * t

    feats = None
    if feats_bank is not None:
        bank = jnp.asarray(feats_bank)
        idx = jax.random.randint(k3, (n, 2), 0, bank.shape[0])
        fA = bank[idx[:, 0]][:, None, :]
        fB = bank[idx[:, 1]][:, None, :]
        if fix_feats:
            feats = jnp.broadcast_to(fA, (n, steps, bank.shape[1]))
        else:
            feats = fA + (fB - fA) * t

    zs_flat = zs.reshape(n * steps, dim_z)
    f_flat = None if feats is None else feats.reshape(n * steps, -1)
    imgs = np.asarray(apply_fn(zs_flat, None, f_flat))
    if path:
        save_image_grid(imgs, path, nrow=steps)
    return imgs


def style_mixing_grid(
    map_ws: Callable,
    synthesize: Callable,
    z_dim: int,
    row_seeds: Sequence[int],
    col_seeds: Sequence[int],
    col_styles: Sequence[int] = (0, 1, 2, 3, 4, 5, 6),
    cond_feats: Optional[np.ndarray] = None,
    truncation_psi: float = 1.0,
    path: Optional[str] = None,
):
    """StyleGAN2 style-mixing grid (ref ``style_mixing.py:28-86``): rows keep
    their coarse styles, columns inject ``col_styles`` from the column seed."""
    all_seeds = list(dict.fromkeys(list(row_seeds) + list(col_seeds)))
    zs = jnp.stack(
        [jax.random.normal(jax.random.PRNGKey(s), (z_dim,)) for s in all_seeds]
    )
    f = None
    if cond_feats is not None:
        f = jnp.broadcast_to(
            jnp.asarray(cond_feats)[None], (len(all_seeds), len(cond_feats))
        )
    ws = map_ws(zs, f)  # (S, num_ws, w_dim)
    w_by_seed = {s: ws[i] for i, s in enumerate(all_seeds)}

    images = {}
    for rs in row_seeds:
        for cs in col_seeds:
            w = w_by_seed[rs]
            w = w.at[jnp.asarray(col_styles)].set(
                w_by_seed[cs][jnp.asarray(col_styles)]
            )
            images[(rs, cs)] = w
    batch_ws = jnp.stack([images[(r, c)] for r in row_seeds for c in col_seeds])
    imgs = np.asarray(synthesize(batch_ws))
    if path:
        save_image_grid(imgs, path, nrow=len(col_seeds))
    return imgs
