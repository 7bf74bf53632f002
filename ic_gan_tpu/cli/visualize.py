"""Qualitative visualization tools: sample sheets, interpolation sheets,
style-mixing grids.

Reference: ``BigGAN_PyTorch/utils.py:1402-1562`` (``sample_sheet`` — per-class
grids; ``interp_sheet`` — z/y interpolation with ``fix_z``/``fix_y`` modes),
``BigGAN_PyTorch/sample.py`` (the ``--sample_sheets``/``--sample_interps``/
``--sample_random`` flag surface, ``utils.py:882-940``) and
``stylegan2_ada_pytorch/style_mixing.py`` (row/col seed grid with style
crossover).

Command usage (all sheet kinds in one invocation, reference-flag compatible):

    python -m ic_gan_tpu.cli.visualize --json_config cfg.json \
        --set stored_features=feats.npy sample_sheets=true \
              sample_interps=true out_dir=sheets/

    python -m ic_gan_tpu.cli.visualize --set backbone=stylegan2 \
        network_pkl=net.pkl mode=style_mixing row_seeds=85,100,75 \
        col_seeds=55,821 col_styles=0-6 out_dir=sheets/
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
    labels_bank: Optional[np.ndarray] = None,
    z_var: float = 1.0,
    seed: int = 0,
    path: Optional[str] = None,
):
    """Interpolation sheet (ref ``interp_sheet``, ``utils.py:1466-1562``):
    each row interpolates z and/or the instance feature between two endpoints;
    ``fix_z`` holds z constant across the row, ``fix_feats`` holds the
    conditioning constant.  ``labels_bank``: class-conditional models draw
    one label per row, held constant across the row (the reference
    interpolates the class *embedding*; integer labels can't lerp, so rows
    are per-class here — a documented simplification)."""
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
    lab_flat = None
    if labels_bank is not None:
        bank = np.asarray(labels_bank).reshape(-1)
        row_labels = bank[
            np.random.RandomState(seed).randint(0, len(bank), n)
        ]
        lab_flat = jnp.asarray(np.repeat(row_labels, steps))
    imgs = np.asarray(apply_fn(zs_flat, lab_flat, f_flat))
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


def _parse_num_list(spec, default):
    """Reference seed-list syntax (``style_mixing.py:_parse_num_range``):
    comma-separated ints, each item optionally an ``a-b`` inclusive range."""
    if spec is None:
        spec = default
    if isinstance(spec, (list, tuple)):
        return [int(s) for s in spec]
    if isinstance(spec, int):
        return [spec]
    out = []
    for item in str(spec).split(","):
        item = item.strip()
        if "-" in item[1:]:
            a, b = item.rsplit("-", 1)
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(item))
    return out


def main(argv=None):
    """Sheet generator CLI (reference ``BigGAN_PyTorch/sample.py`` +
    ``stylegan2_ada_pytorch/style_mixing.py``)."""
    import os

    from ic_gan_tpu.cli.config import parse_args
    from ic_gan_tpu.cli.inference import (
        conditioning_flags,
        load_model_inference,
        load_stored_features,
    )

    cfg = parse_args(argv)
    mode = cfg.get("mode")
    modes = [mode] if mode else [
        m for flag, m in (
            ("sample_sheets", "sample_sheet"),
            ("sample_interps", "interp"),
            ("sample_random", "random"),
        ) if cfg.get(flag)
    ] or ["sample_sheet"]

    apply_fn, model_cfg = load_model_inference(cfg)
    dim_z = getattr(model_cfg, "effective_dim_z", None) or model_cfg.z_dim
    z_var = cfg.get("z_var", 1.0)
    seed = cfg.get("seed", 0)
    out_dir = cfg.get("out_dir", "sheets")
    # Reference sheet layout: sheets live under a numbered subfolder
    # (``sample_sheet_folder_num``, utils.py:1406-1414).
    folder_num = cfg.get("sample_sheet_folder_num", -1)
    if folder_num is not None and int(folder_num) >= 0:
        out_dir = os.path.join(out_dir, str(int(folder_num)))
    os.makedirs(out_dir, exist_ok=True)

    features = labels = None
    if cfg.get("stored_features"):
        features, labels = load_stored_features(cfg["stored_features"])

    class_cond, instance_cond = conditioning_flags(cfg, model_cfg)
    # Label space size for either backbone (SG2 carries c_dim, not n_classes).
    num_classes = (
        getattr(model_cfg, "n_classes", 0) or getattr(model_cfg, "c_dim", 1)
    )
    written = []

    def _conditionings(n):
        """(label, feats) pairs: stored instances when given, else classes
        (the reference's per-class sheets, ``utils.py:1402-1460``)."""
        conds = []
        if features is not None:
            for i in range(min(n, len(features))):
                lab = (
                    labels[i]
                    if labels is not None and class_cond else None
                )
                conds.append((lab, features[i]))
        elif instance_cond:
            raise ValueError(
                "this model is instance-conditioned: pass "
                "stored_features=<kmeans .npy> (cli/prepare_data.py "
                "kmeans_subsampled writes one)"
            )
        elif class_cond:
            for c in range(min(n, num_classes)):
                conds.append((c, None))
        else:
            conds = [(None, None)] * n  # unconditional: fresh-z rows
        return conds

    for m in modes:
        if m == "sample_sheet":
            path = os.path.join(out_dir, "sample_sheet.png")
            sample_sheet(
                apply_fn, dim_z, _conditionings(cfg.get("num_conditionings_gen", 8)),
                samples_per_cond=cfg.get("num_imgs_gen", 8),
                z_var=z_var, seed=seed, path=path,
            )
            written.append(path)
        elif m == "interp":
            # The reference's three interp variants (sample.py →
            # utils.interp_sheet fix_z/fix_y modes): interpolate both, z
            # only, conditioning only.
            variants = [("interp_zfeats", False, False)]
            if features is not None:
                variants += [("interp_z", False, True),
                             ("interp_feats", True, False)]
            labels_bank = None
            if class_cond:
                labels_bank = (
                    labels if labels is not None else np.arange(num_classes)
                )
            if features is None and instance_cond:
                raise ValueError(
                    "this model is instance-conditioned: pass "
                    "stored_features=<kmeans .npy>"
                )
            for name, fix_z, fix_feats in variants:
                path = os.path.join(out_dir, f"{name}.png")
                interp_sheet(
                    apply_fn, dim_z,
                    num_midpoints=cfg.get("num_midpoints", 8),
                    num_rows=cfg.get("num_rows", 4),
                    fix_z=fix_z, fix_feats=fix_feats,
                    feats_bank=features, labels_bank=labels_bank,
                    z_var=z_var, seed=seed, path=path,
                )
                written.append(path)
        elif m == "random":
            n = cfg.get("num_samples", 64)
            rng = jax.random.PRNGKey(seed)
            z = jax.random.normal(rng, (n, dim_z)) * np.sqrt(z_var)
            lab = f = None
            if features is not None:
                idx = np.random.RandomState(seed).randint(0, len(features), n)
                f = jnp.asarray(features[idx])
                if labels is not None and class_cond:
                    lab = jnp.asarray(labels[idx])
            elif instance_cond:
                raise ValueError(
                    "this model is instance-conditioned: pass "
                    "stored_features=<kmeans .npy>"
                )
            elif class_cond:
                lab = jnp.asarray(
                    np.random.RandomState(seed).randint(0, num_classes, n)
                )
            imgs = np.asarray(apply_fn(z, lab, f))
            path = os.path.join(out_dir, "random.png")
            save_image_grid(imgs, path, nrow=8)
            written.append(path)
        elif m == "style_mixing":
            if cfg.get("backbone", "biggan") != "stylegan2":
                raise ValueError("style_mixing needs backbone=stylegan2")
            g, vs = apply_fn.module, apply_fn.variables
            psi = cfg.get("truncation_psi", 1.0)
            cond = None
            if features is not None and getattr(model_cfg, "h_dim", 0):
                cond = features[cfg.get("input_feature_index", 0)]
            map_ws = jax.jit(
                lambda z, f: g.apply(
                    vs, z, None, f, method=g.map_ws, truncation_psi=psi
                )
            )
            synthesize = jax.jit(
                lambda ws: g.apply(
                    vs, ws, method=g.synthesize, noise_mode="const"
                )
            )
            path = os.path.join(out_dir, "style_mixing.png")
            style_mixing_grid(
                map_ws, synthesize, model_cfg.z_dim,
                row_seeds=_parse_num_list(cfg.get("row_seeds"), "85,100,75,458"),
                col_seeds=_parse_num_list(cfg.get("col_seeds"), "55,821,1789"),
                col_styles=_parse_num_list(cfg.get("col_styles"), "0-6"),
                cond_feats=cond, truncation_psi=psi, path=path,
            )
            written.append(path)
        else:
            raise ValueError(f"unknown visualize mode {m!r}")

    for p in written:
        print(f"wrote {p}")
    return written


if __name__ == "__main__":
    main()
