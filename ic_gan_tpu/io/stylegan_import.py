"""Convert reference StyleGAN2-ADA torch networks into ic_gan_tpu Flax trees.

The reference snapshots pickle whole modules (``training_loop.py:618-646``,
``legacy.py``); after unpickling, ``module.state_dict()`` gives flat torch
names that map 1:1 onto our module tree (we keep the reference's module
names: ``mapping.fc0``, ``synthesis.b{res}.conv0``, ``b4.out`` …).  The
conversion is rule-driven by tensor kind:

  conv ``.weight``   (O, I, kh, kw) → (kh, kw, I, O)
  FC ``.weight``     (out, in)      → (in, out)
  ``.const``         (C, H, W)      → (H, W, C)
  ``.noise_const``   (H, W)         → "noise" collection
  ``mapping.w_avg``                 → "batch_stats" collection
  ``.resample_filter`` buffers      → dropped (compile-time constants here)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def convert_state_dict(torch_sd: Dict[str, np.ndarray]):
    """Flat torch state dict (numpy values) → Flax variables dict with
    ``params`` / ``noise`` / ``batch_stats`` collections."""
    from flax.traverse_util import unflatten_dict
    import jax.numpy as jnp

    flat = {}
    for key, val in torch_sd.items():
        v = np.asarray(val)
        parts = tuple(key.split("."))
        if parts[-1] == "resample_filter":
            continue
        if parts[-1] == "w_avg":
            flat[("batch_stats",) + parts] = jnp.asarray(v)
            continue
        if parts[-1] == "noise_const":
            flat[("noise",) + parts] = jnp.asarray(v)
            continue
        if parts[-1] == "const":
            flat[("params",) + parts] = jnp.asarray(np.transpose(v, (1, 2, 0)))
            continue
        if parts[-1] == "weight":
            if v.ndim == 4:
                v = np.transpose(v, (2, 3, 1, 0))
            elif v.ndim == 2:
                v = np.transpose(v)
            flat[("params",) + parts] = jnp.asarray(np.ascontiguousarray(v))
            continue
        # bias, noise_strength, gamma-like scalars: direct.
        flat[("params",) + parts] = jnp.asarray(v)
    return unflatten_dict(flat)


def load_network_pkl(path: str):
    """Load a reference network-snapshot pickle and convert G_ema/G/D.

    Uses torch pickling (the snapshot embeds class source via
    ``persistence.py``; loading requires the reference on sys.path — callers
    that only have the raw ``state_dict`` can use ``convert_state_dict``).
    Returns a dict with whatever of ``G``, ``D``, ``G_ema`` is present, as
    ``(variables, torch_init_kwargs)`` pairs.
    """
    import pickle
    import sys

    sys.path.insert(0, "/root/reference/stylegan2_ada_pytorch")
    with open(path, "rb") as f:
        data = pickle.load(f)
    out = {}
    for name in ("G", "D", "G_ema", "augment_pipe"):
        module = data.get(name)
        if module is None:
            continue
        sd = {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
        init_kwargs = getattr(module, "init_kwargs", {})
        out[name] = (convert_state_dict(sd), dict(init_kwargs))
    return out
