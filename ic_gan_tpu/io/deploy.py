"""Deployment-mode weight preparation.

``fold_spectral_norm`` bakes the spectral normalization into the kernels:
at eval the reference still runs a power iteration per layer per forward
(``layers.py:98-112`` with ``update=False``) — dozens of tiny serialized
matmuls that stall the TPU between the big convs.  Since eval-mode σ is a
pure function of the stored ``(W, u)``, dividing once at load time is
mathematically identical and removes the entire SN graph from the sampling
path.

``cast_params`` converts floating-point leaves to bfloat16 (keeping batch
norm statistics in float32) to halve HBM weight traffic during sampling.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ic_gan_tpu.ops.spectral_norm import spectral_normalize


def fold_spectral_norm(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Return variables with every spectrally-normalized kernel divided by its
    σ and the ``sn`` collection removed.  Use with models built with
    ``sn_folded=True`` (BigGANConfig) so layers skip the power iteration."""
    params = variables["params"]
    sn = variables.get("sn", {})

    def fold(params_node, sn_node):
        out = {}
        for key, val in params_node.items():
            sub_sn = sn_node.get(key, {}) if isinstance(sn_node, dict) else {}
            if isinstance(val, dict):
                if "u" in sub_sn:
                    # This module is spectrally normalized; find its weight.
                    wname = (
                        "kernel" if "kernel" in val
                        else "embedding" if "embedding" in val
                        else None
                    )
                    if wname is not None:
                        w_bar, _, _ = spectral_normalize(
                            val[wname], sub_sn["u"], update=False,
                            transpose=(wname == "embedding"),
                        )
                        val = dict(val)
                        val[wname] = w_bar
                        out[key] = {
                            k: (v if k == wname else fold_leaf(v))
                            for k, v in val.items()
                        }
                        continue
                out[key] = fold(val, sub_sn)
            else:
                out[key] = val
        return out

    def fold_leaf(v):
        return fold(v, {}) if isinstance(v, dict) else v

    new_params = fold(params, sn)
    out = {k: v for k, v in variables.items() if k != "sn"}
    out["params"] = new_params
    return out


def cast_params(variables: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Cast floating-point leaves to ``dtype``; BN statistics stay float32
    (they parameterize a rsqrt)."""

    def cast_tree(node, in_stats=False):
        if isinstance(node, dict):
            return {
                k: cast_tree(v, in_stats or k in ("batch_stats",))
                for k, v in node.items()
            }
        if in_stats:
            return node
        if jnp.issubdtype(node.dtype, jnp.floating):
            return node.astype(dtype)
        return node

    return cast_tree(variables)
