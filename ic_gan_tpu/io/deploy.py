"""Deployment-mode weight preparation and the jitted sampling path.

``fold_spectral_norm`` bakes the spectral normalization into the kernels:
at eval the reference still runs a power iteration per layer per forward
(``layers.py:98-112`` with ``update=False``) — dozens of tiny serialized
matmuls that stall the TPU between the big convs.  Since eval-mode σ is a
pure function of the stored ``(W, u)``, dividing once at load time is
mathematically identical and removes the entire SN graph from the sampling
path.

``cast_params`` converts floating-point leaves to bfloat16 (keeping batch
norm statistics in float32) to halve HBM weight traffic during sampling.

``make_sampler`` wraps a generator in a fixed-batch jitted forward over
folded/cast variables — on the relay TPU backend un-jitted per-op dispatch
takes minutes per call, so every eval/inference consumer (FID loops, JPEG
dumpers, sample sheets) must go through this.

``accumulate_standing_stats`` drives BigGAN's standing-statistics eval mode
(ref ``BigGAN_PyTorch/utils.py:1679-1695``): reset the BN accumulators, run
``n`` forwards in ``standing`` mode with fresh z/conditioning, and eval-mode
BN then normalizes with the averaged accumulated moments (``G_eval_mode``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.ops.spectral_norm import spectral_normalize


def fold_spectral_norm(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Return variables with every spectrally-normalized kernel divided by its
    σ and the ``sn`` collection removed.  Use with models built with
    ``sn_folded=True`` (BigGANConfig) so layers skip the power iteration.

    The whole fold runs as ONE jitted executable: un-jitted it dispatches a
    handful of tiny ops per SN module (~50 modules in a BigGAN G), and on
    the relay TPU backend each dispatch costs a network round trip —
    minutes of latency for a loop that is otherwise milliseconds."""
    return jax.jit(_fold_spectral_norm_impl)(variables)


def _fold_spectral_norm_impl(variables: Dict[str, Any]) -> Dict[str, Any]:
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
    (they parameterize a rsqrt), and int8 dequant scales in the ``quant``
    collection stay float32 (rounding the calibrated ``act_scale``/``wscale``
    to bf16 would add ~2⁻⁹ systematic per-channel gain error on top of the
    int8 rounding; the dequant multiply is elementwise — f32 costs nothing)."""

    def cast_tree(node, in_stats=False):
        if isinstance(node, dict):
            return {
                k: cast_tree(v, in_stats or k in ("batch_stats", "quant"))
                for k, v in node.items()
            }
        if in_stats:
            return node
        if jnp.issubdtype(node.dtype, jnp.floating):
            return node.astype(dtype)
        return node

    return cast_tree(variables)


def reset_standing_stats(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Zero every BN (mean, var, accum_counter) triple so a fresh
    standing-stats accumulation can begin (ref ``utils.py:1664-1675``
    ``initiate_standing_stats``)."""
    bs = variables.get("batch_stats")
    if bs is None:
        return variables

    def reset(node):
        if isinstance(node, dict):
            if "accum_counter" in node:
                return {k: jnp.zeros_like(v) for k, v in node.items()}
            return {k: reset(v) for k, v in node.items()}
        return node

    out = dict(variables)
    out["batch_stats"] = reset(bs)
    return out


def accumulate_standing_stats(
    g_module,
    variables: Dict[str, Any],
    rng: jax.Array,
    dim_z: int,
    sample_conditioning: Optional[Callable[[int], tuple]] = None,
    *,
    batch_size: int = 32,
    n_accumulations: int = 16,
) -> Dict[str, Any]:
    """Accumulate standing statistics into ``variables['batch_stats']``
    (ref ``utils.py:1679-1695``: 16 forwards with fresh z ~ N(0, 1) and fresh
    conditioning per accumulation, then eval normalizes with the average).

    ``sample_conditioning(n) -> (label | None, feats | None)`` supplies the
    conditioning draws (numpy, host-side); pass None for an unconditional G.
    The forward is jitted once and reused across accumulations.
    """
    variables = reset_standing_stats(variables)
    if "batch_stats" not in variables:
        return variables

    @jax.jit
    def standing_step(v, z, label, feats):
        _, mut = g_module.apply(
            v, z, label, feats, train=False, standing=True,
            mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    for i in range(n_accumulations):
        step_rng = jax.random.fold_in(rng, i)
        z = jax.random.normal(step_rng, (batch_size, dim_z))
        label = feats = None
        if sample_conditioning is not None:
            label, feats = sample_conditioning(batch_size)
            label = None if label is None else jnp.asarray(label)
            feats = None if feats is None else jnp.asarray(feats)
        variables = dict(variables)
        variables["batch_stats"] = standing_step(variables, z, label, feats)
    return variables


def make_sampler(
    g_module,
    variables: Dict[str, Any],
    *,
    batch_size: Optional[int] = None,
    fold: bool = True,
    dtype=None,
    mesh=None,
    **apply_kwargs,
):
    """Return ``sampler(z, label=None, feats=None) -> np.ndarray`` running the
    generator as a fixed-batch jitted forward.

    - σ-folds the ``sn`` collection into the kernels (15× on the relay TPU —
      the eval-mode power iterations otherwise serialize between convs);
    - optionally casts weights (``dtype=jnp.bfloat16``) to halve HBM traffic;
    - chunks arbitrary ``n`` into ``batch_size`` jit calls, padding the tail
      chunk (one compiled executable regardless of request size);
    - with ``mesh`` (a ``jax.sharding.Mesh`` with a ``"data"`` axis), weights
      replicate and each chunk shards over the data axis — pod-scale
      sampling for the 50k-image eval loops; ``batch_size`` must divide by
      the data-axis size.

    This is the TPU equivalent of the reference's ``torch.no_grad`` sample
    closure (``inference/utils.py:176-265``).
    """
    if fold and "sn" in variables:
        variables = fold_spectral_norm(variables)
    if dtype is not None:
        variables = cast_params(variables, dtype)
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        if batch_size:
            assert batch_size % n_data == 0, (batch_size, n_data)
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
        batch_sharding = NamedSharding(mesh, P("data"))
    else:
        variables = jax.device_put(variables)

    @jax.jit
    def run(v, z, label, feats):
        return g_module.apply(v, z, label, feats, train=False, **apply_kwargs)

    def _pad(a, pad):
        if a is None or pad == 0:
            return a
        reps = np.concatenate([a[:1]] * pad) if pad else a[:0]
        return np.concatenate([np.asarray(a), np.asarray(reps)])

    def sampler(z, label=None, feats=None, device_output: bool = False):
        """``device_output=True`` keeps the images on device (jax.Array) —
        essential when the consumer is another on-device stage (the FID
        loop's Inception pass): fetching a 128×256² bf16 batch through the
        relay tunnel costs ~100 MB per direction and dominated the round-1
        eval loop."""
        z = np.asarray(z)
        n = z.shape[0]
        bs = batch_size or n

        def put(a):
            if a is None:
                return None
            a = jnp.asarray(a)
            return jax.device_put(a, batch_sharding) if batch_sharding else a

        outs = []
        for lo in range(0, n, bs):
            hi = min(lo + bs, n)
            pad = bs - (hi - lo)
            img = run(
                variables,
                put(_pad(z[lo:hi], pad)),
                put(None if label is None else _pad(label[lo:hi], pad)),
                put(None if feats is None else _pad(feats[lo:hi], pad)),
            )
            img = img[: hi - lo]
            outs.append(img if device_output else np.asarray(img, np.float32))
        if len(outs) == 1:
            return outs[0]
        return jnp.concatenate(outs) if device_output else np.concatenate(outs)

    # Deployment internals for consumers that fuse further stages into the
    # same executable (eval/pipeline.make_fused_feature_fn runs Inception on
    # the generator output inside ONE jit — on the relay backend each extra
    # executable launch costs real latency).
    sampler.module = g_module
    sampler.prepared_variables = variables
    sampler.apply_kwargs = dict(apply_kwargs)
    sampler.batch_size = batch_size
    sampler.batch_sharding = batch_sharding
    return sampler


def export_sampler(
    g_module,
    variables: Dict[str, Any],
    batch_size: int,
    *,
    fold: bool = True,
    dtype=None,
    platforms=None,
    **apply_kwargs,
) -> bytes:
    """Serialize the deployment sampler as a self-contained AOT artifact.

    The σ-folded (optionally bf16-cast) weights are baked into the program
    as constants and the whole fixed-batch forward is exported via
    ``jax.export`` to portable StableHLO bytes — a serving process
    rehydrates with ``load_exported_sampler`` and never needs model code,
    checkpoint converters, or tracing. (The reference has no serving story
    beyond pickled modules; this is the TPU-native production artifact.)

    ``platforms``: lowering targets (default: current backend), e.g.
    ``["tpu"]`` to export for TPU from a CPU host.
    """
    from jax import export as jax_export

    if fold and "sn" in variables:
        variables = fold_spectral_norm(variables)
    if dtype is not None:
        variables = cast_params(variables, dtype)
    # jax.device_get → plain numpy leaves; closed over, they become program
    # constants in the exported module.
    variables = jax.device_get(variables)

    sig = _sampler_signature(g_module, variables, batch_size)

    def run(z, label, feats):
        return g_module.apply(variables, z, label, feats, train=False,
                              **apply_kwargs)

    args = tuple(jax.ShapeDtypeStruct(s, d) for s, d in sig)
    exp = jax_export.export(jax.jit(run), platforms=platforms)(*args)
    return bytes(exp.serialize())


def _sampler_signature(g_module, variables, batch_size):
    """(z, label/c, feats) avals for the export trace; zero-width
    placeholders stand in for absent conditioning (the loaded sampler
    re-materializes them so callers can pass ``None``).

    BigGAN conditions on integer class labels + 2048-d instance features
    (``BigGANConfig.class_cond/instance_cond``); StyleGAN2 on float one-hot
    ``c`` (c_dim) + instance ``h`` (h_dim) vectors
    (``models/stylegan2.py:MappingNetwork``)."""
    cfg = g_module.cfg
    if hasattr(cfg, "effective_dim_z"):  # BigGAN / BigGAN-deep
        sig = [((batch_size, cfg.effective_dim_z), jnp.float32)]
        n_label = (batch_size,) if getattr(cfg, "class_cond", False) else None
        sig.append(((batch_size,), jnp.int32) if n_label
                   else ((batch_size, 0), jnp.int32))
        inst = getattr(cfg, "instance_cond", False)
        sig.append(((batch_size, cfg.instance_sz), jnp.float32) if inst
                   else ((batch_size, 0), jnp.float32))
        return sig
    # StyleGAN2 (ref networks.py:710-757 signature order z, c, feats)
    return [
        ((batch_size, cfg.z_dim), jnp.float32),
        ((batch_size, cfg.c_dim), jnp.float32),
        ((batch_size, cfg.h_dim), jnp.float32),
    ]


def load_exported_sampler(data: bytes) -> Callable:
    """Rehydrate an ``export_sampler`` artifact.

    Returns ``sampler(z, label=None, feats=None) -> images`` with the
    batch/conditioning signature baked at export time; ``None`` conditioning
    is replaced by the zero-width placeholders the export carries.
    """
    from jax import export as jax_export

    exp = jax_export.deserialize(data)
    (z_spec, label_spec, feats_spec) = exp.in_avals

    def sampler(z, label=None, feats=None):
        if label is None:
            label = jnp.zeros(label_spec.shape, label_spec.dtype)
        if feats is None:
            feats = jnp.zeros(feats_spec.shape, feats_spec.dtype)
        return exp.call(jnp.asarray(z, z_spec.dtype),
                        jnp.asarray(label), jnp.asarray(feats))

    sampler.in_avals = exp.in_avals
    return sampler
