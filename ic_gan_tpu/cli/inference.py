"""Inference utilities: model loading and unified sampling.

Reference: ``inference/utils.py`` — best-checkpoint selection
(``:285-308``), config resurrection (``:334-368``), backbone-agnostic
``sample()`` (``:176-265``) and ``get_sampling_funct`` (``:29-173``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def reference_exp_name(cfg: Dict[str, Any]) -> str:
    """The reference demo's experiment-name convention
    (``generate_images.py:126-140``): ``{model}_{backbone}_{dataset}_res{r}``
    plus ``_nofeataug`` for the released ImageNet res-256 models."""
    res = int(cfg.get("resolution", 256))
    dataset = cfg.get("trained_dataset", cfg.get("which_dataset", "imagenet"))
    suffix = "_nofeataug" if res == 256 and dataset == "imagenet" else ""
    backbone = cfg.get("backbone", cfg.get("model_backbone", "biggan"))
    return f"{cfg.get('model', 'icgan')}_{backbone}_{dataset}_res{res}{suffix}"


def load_generator(cfg: Dict[str, Any]):
    """Load a generator module + variables for inference.

    Supports three sources:
    - native checkpoints (``weights_root``/``experiment_name`` dirs, best-FID
      selection like ``inference/utils.py:285-308``);
    - reference BigGAN ``.pth`` bundles (``backbone='biggan'`` +
      ``pth_dir``);
    - reference StyleGAN2 pickles (``backbone='stylegan2'`` + ``network_pkl``).

    Returns ``(g_module, variables, model_cfg)``.
    """
    backbone = cfg.get("backbone", "biggan")
    if backbone == "biggan":
        from ic_gan_tpu.cli.config import split_config
        from ic_gan_tpu.models.biggan_deep import (
            BigGANDeepConfig,
            Generator as DeepGenerator,
        )
        from ic_gan_tpu.models.biggan import Generator

        model_cfg, _, _, _ = split_config(cfg)
        deep = isinstance(model_cfg, BigGANDeepConfig)
        g = DeepGenerator(model_cfg) if deep else Generator(model_cfg)
        if cfg.get("pth_dir"):
            from ic_gan_tpu.io.torch_import import (
                load_deep_generator_variables,
                load_generator_variables,
                load_pth_bundle,
                select_best_pth_suffix,
            )

            which = cfg.get("which_model", "G_ema")
            suffix = cfg.get("suffix", "")
            if not suffix:
                # Reference best-FID selection over the best0/best1 copies
                # (inference/utils.py:285-308).
                suffix = select_best_pth_suffix(cfg["pth_dir"])
            sd = load_pth_bundle(cfg["pth_dir"], which, suffix)
            variables = (
                load_deep_generator_variables(sd, model_cfg)
                if deep
                else load_generator_variables(sd, model_cfg)
            )
        else:
            from ic_gan_tpu.io.checkpoint import (
                find_best_checkpoint,
                load_checkpoint,
            )
            from ic_gan_tpu.train.state import GANTrainState

            # Build a template state to restore into.
            rng = jax.random.PRNGKey(0)
            z = jnp.zeros((1, model_cfg.effective_dim_z))
            feats = (
                jnp.zeros((1, model_cfg.instance_sz))
                if model_cfg.instance_cond else None
            )
            label = jnp.zeros((1,), jnp.int32) if model_cfg.class_cond else None
            g_vars = g.init(rng, z, label, feats)
            root = (cfg.get("weights_root") or cfg.get("root_path")
                    or "weights")
            name = cfg.get("experiment_name") or reference_exp_name(cfg)
            suffix = cfg.get("load_weights", "")
            if not suffix:
                best, _ = find_best_checkpoint(root, name)
                suffix = os.path.basename(best)[len(name) + 1:] if best else ""
            from ic_gan_tpu.models.biggan import Discriminator
            from ic_gan_tpu.models.biggan_deep import (
                Discriminator as DeepDiscriminator,
            )
            from ic_gan_tpu.train.step import TrainConfig

            tcfg = TrainConfig()
            d_cls = DeepDiscriminator if deep else Discriminator
            d_vars = d_cls(model_cfg).init(
                rng, jnp.zeros((1, model_cfg.resolution, model_cfg.resolution, 3)),
                label, feats,
            )
            template = GANTrainState.create(
                g_vars, d_vars, tcfg.g_optimizer(), tcfg.d_optimizer()
            )
            state, _ = load_checkpoint(root, name, template, suffix)
            use_ema = cfg.get("use_ema", True)
            variables = {
                "params": state.g_ema_params if use_ema else state.g_params,
                **(state.g_ema_state if use_ema else state.g_state),
            }

        return g, variables, model_cfg

    elif backbone == "stylegan2":
        from ic_gan_tpu.models import stylegan2 as sg2

        network_pkl = cfg.get("network_pkl")
        if not network_pkl and (cfg.get("base_root") or cfg.get("root_path")):
            # Reference convention (inference/utils.py:406-407):
            # {base_root}/{experiment_name}/best-network-snapshot.pkl
            root = cfg.get("base_root") or cfg["root_path"]
            name = cfg.get("experiment_name") or reference_exp_name(cfg)
            cand = os.path.join(root, name, "best-network-snapshot.pkl")
            if os.path.exists(cand):
                network_pkl = cand
        if network_pkl:
            from ic_gan_tpu.io.stylegan_import import load_network_pkl

            nets = load_network_pkl(network_pkl)
            variables, init_kwargs = nets.get("G_ema", nets.get("G"))
            syn_kw = dict(init_kwargs.get("synthesis_kwargs", {}))
            map_kw = dict(init_kwargs.get("mapping_kwargs", {}))
            model_cfg = sg2.StyleGAN2Config(
                img_resolution=init_kwargs.get("img_resolution", 256),
                z_dim=init_kwargs.get("z_dim", 512),
                c_dim=init_kwargs.get("c_dim", 0),
                h_dim=init_kwargs.get("h_dim", 0),
                w_dim=init_kwargs.get("w_dim", 512),
                channel_base=syn_kw.get("channel_base", 32768),
                channel_max=syn_kw.get("channel_max", 512),
                num_mapping_layers=map_kw.get("num_layers", 8),
                num_fp16_res=syn_kw.get("num_fp16_res", 4),
                conv_clamp=syn_kw.get("conv_clamp", 256.0),
                architecture_g=syn_kw.get("architecture", "skip"),
            )
        else:
            raise ValueError("stylegan2 inference needs network_pkl")
        g = sg2.Generator(model_cfg)
        return g, variables, model_cfg
    raise ValueError(f"unknown backbone {backbone}")


def load_model_inference(cfg: Dict[str, Any]):
    """Load a generator and wrap it in the jitted deployment sampler.

    Returns ``(apply_fn, model_cfg)`` where ``apply_fn(z, label, feats) ->
    images NHWC float32 in [-1, 1]`` runs as a σ-folded, fixed-batch jitted
    forward (``io/deploy.make_sampler``) — the un-jitted per-op path takes
    minutes per call on the relay TPU backend, so everything (50k FID loops
    included) goes through one compiled executable.

    Extra hooks on the returned function:
    - ``apply_fn.module`` / ``apply_fn.variables`` / ``apply_fn.model_cfg``;
    - ``apply_fn.with_standing_stats(sample_conditioning)`` → a new sampler
      whose BN uses standing statistics accumulated with fresh z/conditioning
      (ref ``utils.py:1679-1695``; flags ``accumulate_stats`` /
      ``num_standing_accumulations``).
    """
    from ic_gan_tpu.io.deploy import accumulate_standing_stats, make_sampler

    # The reference demo spells the backbone flag --model_backbone
    # (generate_images.py:55); accept it as an alias.
    if "backbone" not in cfg and cfg.get("model_backbone"):
        cfg["backbone"] = cfg["model_backbone"]
    g, variables, model_cfg = load_generator(cfg)
    backbone = cfg.get("backbone", "biggan")
    batch = cfg.get("batch_size", 32)
    if cfg.get("quantize_serving", False) and backbone == "stylegan2":
        # int8 serving for SG2 (io/quant.py): modulated convs keep the
        # style scaling on the activations, so the static weights (and the
        # up=2 composite polyphase kernels) quantize per-channel like plain
        # convs; activation scales calibrate on the modulated inputs.
        from ic_gan_tpu.io.quant import quantize_stylegan2_variables

        rng = np.random.RandomState(cfg.get("seed", 0))
        n_cal = cfg.get("quant_calibration_images", 64)
        zc = jnp.asarray(rng.randn(n_cal, model_cfg.z_dim), jnp.float32)
        cc = None
        if getattr(model_cfg, "c_dim", 0):
            cc = jnp.asarray(np.eye(model_cfg.c_dim, dtype=np.float32)[
                rng.randint(0, model_cfg.c_dim, n_cal)])
        fc = None
        if getattr(model_cfg, "h_dim", 0):
            sf = cfg.get("stored_features")
            if sf and os.path.exists(sf):
                bank = np.load(sf)
                fc = jnp.asarray(bank[rng.randint(0, len(bank), n_cal)],
                                 jnp.float32)
            else:
                print("WARNING: quantize_serving calibrating on N(0,1) "
                      "features; pass stored_features for real statistics.")
                fc = jnp.asarray(rng.randn(n_cal, model_cfg.h_dim),
                                 jnp.float32)
        variables = quantize_stylegan2_variables(
            g, variables, zc, cc, fc,
            # Quality knob: per-sample dynamic range adaptation — drift
            # 4.97% → 3.96% at the cost of 1.88× → 1.63× e2e (io/quant.py).
            act_dynamic=cfg.get("quantize_dynamic", False),
            truncation_psi=cfg.get("truncation_psi", 1.0),
            noise_mode=cfg.get("noise_mode", "const"),
        )
    elif cfg.get("quantize_serving", False):
        # int8 serving (io/quant.py): measured 1.29× the bf16 path at 256²
        # (benchmarks/results/quant_sample.json).  Calibration: z from the
        # true prior; instance features from ``stored_features`` when given
        # (the real serving distribution), else N(0,1) with a warning.
        from ic_gan_tpu.io.quant import quantize_variables

        rng = np.random.RandomState(cfg.get("seed", 0))
        n_cal = cfg.get("quant_calibration_images", 64)
        zc = jnp.asarray(rng.randn(
            n_cal, model_cfg.effective_dim_z), jnp.float32)
        lc = None
        if getattr(model_cfg, "class_cond", False):
            lc = jnp.asarray(
                rng.randint(0, model_cfg.n_classes, n_cal), jnp.int32)
        fc = None
        if getattr(model_cfg, "instance_cond", False):
            sf = cfg.get("stored_features")
            if sf and os.path.exists(sf):
                bank = np.load(sf)
                fc = jnp.asarray(bank[rng.randint(0, len(bank), n_cal)],
                                 jnp.float32)
            else:
                print("WARNING: quantize_serving calibrating on N(0,1) "
                      "features; pass stored_features for real statistics.")
                fc = jnp.asarray(rng.randn(
                    n_cal, model_cfg.instance_sz), jnp.float32)
        variables = quantize_variables(g, variables, zc, lc, fc, train=False)
    dtype = jnp.bfloat16 if cfg.get("deploy_bf16", False) else None
    apply_kwargs = {}
    if backbone == "stylegan2":
        apply_kwargs = {
            "truncation_psi": cfg.get("truncation_psi", 1.0),
            "noise_mode": cfg.get("noise_mode", "const"),
        }
    dim_z = getattr(model_cfg, "effective_dim_z", None) or model_cfg.z_dim

    def build(vs):
        raw = make_sampler(
            g, vs, batch_size=batch, dtype=dtype, **apply_kwargs
        )
        fn = raw
        if backbone == "stylegan2" and getattr(model_cfg, "c_dim", 0):
            # SG2 conditioning is a one-hot c vector (MappingNetwork embed);
            # accept integer labels here so every consumer (sheet tools,
            # random grids, demo) can pass labels backbone-agnostically.
            def fn(z, label=None, feats=None, **kw):
                if label is not None:
                    lab = jnp.asarray(label)
                    if jnp.issubdtype(lab.dtype, jnp.integer):
                        lab = jax.nn.one_hot(
                            lab.reshape(-1), model_cfg.c_dim
                        )
                    label = lab
                return raw(z, label, feats, **kw)

        fn.module = g
        fn.variables = vs
        fn.model_cfg = model_cfg
        # Deployment internals (σ-folded/cast variables, apply kwargs) for
        # the fused eval loop — propagate past the SG2 label wrapper.
        fn.prepared_variables = raw.prepared_variables
        fn.apply_kwargs = raw.apply_kwargs
        fn.batch_size = raw.batch_size

        def with_standing_stats(sample_conditioning):
            from ic_gan_tpu.io.deploy import fold_spectral_norm

            # Fold first: standing moments don't depend on the sn collection
            # and the folded forward skips the serialized power iterations.
            base = fold_spectral_norm(vs) if "sn" in vs else vs
            new_vars = accumulate_standing_stats(
                g, base, jax.random.PRNGKey(cfg.get("seed", 0)), dim_z,
                sample_conditioning,
                batch_size=cfg.get("standing_batch_size", batch),
                n_accumulations=cfg.get("num_standing_accumulations", 16),
            )
            return build(new_vars)

        fn.with_standing_stats = with_standing_stats
        return fn

    return build(variables), model_cfg


def get_conditionings(
    num_instances: int,
    num_imgs_gen: int,
    stored_features: np.ndarray,
    stored_labels: Optional[np.ndarray],
    dim_z: int,
    z_var: float = 1.0,
    swap_target: Optional[int] = None,
    seed: int = 0,
    index: Optional[int] = None,
):
    """Replicate ``generate_images.py:68-124``: for each stored instance,
    draw ``num_imgs_gen`` z's; optionally override the class label.

    ``index`` pins every row to one specific k-means center (ref ``--index``,
    ``generate_images.py:84-87``: when given, each conditioning row reuses
    that instance).  Returns ``(z, labels, feats, instance_idxs)``."""
    rng = jax.random.PRNGKey(seed)
    if index is not None:
        idxs = np.full(num_instances, int(index), np.int64)
    else:
        idxs = np.arange(min(num_instances, len(stored_features)))
    feats = np.repeat(stored_features[idxs], num_imgs_gen, axis=0)
    z = jax.random.normal(
        rng, (len(idxs) * num_imgs_gen, dim_z)
    ) * np.sqrt(z_var)
    labels = None
    if stored_labels is not None:
        labels = np.repeat(np.asarray(stored_labels)[idxs], num_imgs_gen,
                           axis=0)
    if swap_target is not None:
        labels = np.full(len(idxs) * num_imgs_gen, swap_target, np.int64)
    return z, labels, feats, idxs


def conditioning_flags(cfg: Dict[str, Any], model_cfg) -> Tuple[bool, bool]:
    """(class_cond, instance_cond) for either backbone: BigGAN configs carry
    the flags directly; StyleGAN2 conditioning is implied by c_dim/h_dim."""
    if cfg.get("backbone", "biggan") == "stylegan2":
        return (
            getattr(model_cfg, "c_dim", 0) > 0,
            getattr(model_cfg, "h_dim", 0) > 0,
        )
    return (
        bool(getattr(model_cfg, "class_cond", False)),
        bool(getattr(model_cfg, "instance_cond", False)),
    )


def make_conditioned_sampler(
    cfg: Dict[str, Any], apply_fn, model_cfg, dataset, z_var: float = None
):
    """Dataset-conditioned generator sampler shared by the eval CLIs
    (``cli/test.py``, ``cli/calc_metrics.py``) — the reference's
    ``get_sampling_funct`` (``inference/utils.py:29-173``) for both
    backbones.

    Returns ``sample(b) -> (device_images, labels_or_None)``; draws
    conditioning with the dataset's balance mode, fresh z per call.
    StyleGAN2 class conditioning one-hots integer labels into the c vector.
    """
    backbone = cfg.get("backbone", "biggan")
    class_cond, instance_cond = conditioning_flags(cfg, model_cfg)
    dim_z = getattr(model_cfg, "effective_dim_z", None) or model_cfg.z_dim
    if z_var is None:
        z_var = cfg.get("z_var", 1.0)
    counter = [0]

    np_rng = np.random.default_rng(cfg.get("seed", 0))

    def draw(b):
        """One conditioning/z draw: ``(z, lab_in, f_in, labels)`` with
        device-ready model inputs and host labels (for stratified eval)."""
        counter[0] += 1
        rng = jax.random.PRNGKey(cfg.get("seed", 0) + counter[0])
        labels = feats = None
        if dataset is not None and instance_cond:
            if dataset.which_nn_balance == "instance_balance":
                labels, feats = dataset.sample_conditioning_instance_balance(b)
            else:
                kw = {}
                nc = getattr(model_cfg, "n_classes", 0)
                if nc:
                    kw["num_classes"] = nc
                labels, feats = dataset.sample_conditioning_nnclass_balance(
                    b, **kw
                )
        elif class_cond:
            # Class-only models: labels come from the y distribution, not
            # instance sampling (ref get_sampling_funct wiring prepare_z_y,
            # inference/utils.py:29-173).
            from ic_gan_tpu.data.distributions import sample_gen_labels

            nc = (getattr(model_cfg, "n_classes", 0)
                  or getattr(model_cfg, "c_dim", 1))
            needs_probs = cfg.get("longtail_gen", False) or cfg.get(
                "custom_distrib_gen", False)
            class_prob = None
            if needs_probs:
                if cfg.get("class_probabilities"):
                    class_prob = np.load(cfg["class_probabilities"],
                                         allow_pickle=True)
                elif dataset is not None:
                    lab_all = dataset.get_label(dataset.possible_sampling_idxs)
                    class_prob = np.bincount(
                        np.asarray(lab_all).reshape(-1), minlength=nc)
            labels = sample_gen_labels(
                np_rng, b, nc,
                longtail_gen=cfg.get("longtail_gen", False),
                custom_distrib_gen=cfg.get("custom_distrib_gen", False),
                longtail_temperature=cfg.get("longtail_temperature", 1.0),
                constant_conditioning=cfg.get("constant_conditioning", False),
                class_prob=class_prob,
            )
        z = jax.random.normal(rng, (b, dim_z)) * np.sqrt(z_var)
        lab_in = None
        if class_cond and labels is not None:
            lab_in = jnp.asarray(labels)
            if backbone == "stylegan2" and lab_in.ndim == 1:
                lab_in = jax.nn.one_hot(lab_in, model_cfg.c_dim)
        f_in = (
            jnp.asarray(feats)
            if instance_cond and feats is not None else None
        )
        return z, lab_in, f_in, labels

    def sample(b):
        z, lab_in, f_in, labels = draw(b)
        # device_output: images feed straight into the on-device Inception
        # pass — fetching them to host costs ~100 MB/batch over the relay
        # tunnel and dominated the eval loop.
        imgs = apply_fn(z, lab_in, f_in, device_output=True)
        return imgs, labels if class_cond else None

    sample.class_cond = class_cond
    sample.instance_cond = instance_cond
    sample.dim_z = dim_z
    sample.draw = draw
    sample.apply_fn = apply_fn
    return sample


def make_conditioned_feature_fn(sample, evaluator):
    """Fused eval-loop feature source: one executable runs generator →
    Inception per batch (``eval.pipeline.make_fused_feature_fn``), fed by
    the conditioned sampler's draw.  Returns
    ``feature_fn(b) -> (pool, logits, labels)`` for
    ``evaluate_generator(feature_fn=...)``; falls back to ``None`` when the
    wrapped sampler does not expose deployment internals (e.g. a bare
    callable in tests)."""
    from ic_gan_tpu.eval.pipeline import make_fused_feature_fn

    apply_fn = getattr(sample, "apply_fn", None)
    if apply_fn is None or not hasattr(apply_fn, "prepared_variables"):
        return None
    fused = make_fused_feature_fn(apply_fn, evaluator)

    def feature_fn(b):
        z, lab_in, f_in, labels = sample.draw(b)
        pool, logits = fused(z, lab_in, f_in)
        return pool, logits, labels if sample.class_cond else None

    return feature_fn


def stored_instances_path(root_path: str, which_dataset: str,
                          resolution: int, model: str = "icgan") -> str:
    """The reference's stored-instances filename convention
    (``generate_images.py:25-37``): cc_icgan conditions on classification
    features, icgan on self-supervised (SwAV) features."""
    extractor = "classification" if model == "cc_icgan" else "selfsupervised"
    return os.path.join(
        root_path, "stored_instances",
        f"{which_dataset}_res{resolution}_rn50_{extractor}"
        "_kmeans_k1000_instance_features.npy",
    )


def load_stored_instances(path: str):
    """Load a stored instance-feature file (the k-means selections of
    ``generate_images.py:25-45``): either a plain ``(N, h_dim)`` array or a
    dict npy with ``instance_features``/``feats`` and optional ``labels`` /
    ``image_path`` (ground-truth JPEG paths relative to the dataset root).

    Returns ``(features, labels_or_None, image_paths_or_None)``.
    """
    stored = np.load(path, allow_pickle=True)
    image_paths = None
    if hasattr(stored, "item") and stored.dtype == object:
        stored = stored.item()
        features = np.asarray(
            stored.get("instance_features", stored.get("feats"))
        )
        labels = stored.get("labels")
        image_paths = stored.get("image_path")
    else:
        features = np.asarray(stored)
        labels = None
    return features, labels, image_paths


def load_stored_features(path: str):
    """``load_stored_instances`` without the image paths."""
    features, labels, _ = load_stored_instances(path)
    return features, labels


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8):
    """[-1,1] NHWC float → PNG grid."""
    from PIL import Image

    n, h, w, c = images.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.zeros((ncol * h, nrow * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    grid = np.clip((grid + 1) / 2, 0, 1)
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)
    return path
