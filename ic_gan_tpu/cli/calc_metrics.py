"""Calculate quality metrics for a trained network (reference:
``stylegan2_ada_pytorch/calc_metrics.py``).

    python -m ic_gan_tpu.cli.calc_metrics --json_config cfg.json \
        --set metrics=fid50k_full,is50k

Metric names follow the reference registry (``metrics/metric_main.py:98-241``)
— all 12 entries: primary ``fid50k_full``, ``kid50k_full``, ``pr50k3_full``,
``ppl2_wend``, ``is50k`` and legacy ``fid50k``, ``kid50k``, ``pr50k3``,
``ppl_zfull``, ``ppl_wfull``, ``ppl_zend``, ``ppl_wend``.  Real-side feature
counts honor each entry's reference ``max_real`` cap (bounded by
``max_real_images``, default ``num_inception_images``, for smoke runs).
The network comes from the same sources as every inference CLI
(``weights_root``/``experiment_name`` native checkpoints, ``pth_dir``
reference BigGAN bundles, ``network_pkl`` StyleGAN2 pickles); sample counts
scale with ``num_inception_images`` (smoke runs at 1–10k).  Results print as
one dict and append to ``metric-<name>.jsonl`` in ``run_dir`` when set
(ref ``calc_metrics.py:90-106`` / ``metric_main.py:49-76``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.cli.config import parse_args, split_config
from ic_gan_tpu.cli.inference import (
    conditioning_flags,
    load_model_inference,
    make_conditioned_sampler,
)


# The five PPL registry entries share one CLI setup path (space/sampling/crop
# live in the registry); everything else needs the Inception evaluator.
PPL_METRICS = ("ppl2_wend", "ppl_zfull", "ppl_wfull", "ppl_zend", "ppl_wend")


def main(argv=None):
    cfg = parse_args(argv)
    from ic_gan_tpu.eval.metrics import _METRICS, calc_metric, is_valid_metric

    names = [
        m.strip()
        for m in str(cfg.get("metrics", "fid50k_full")).split(",")
        if m.strip()
    ]
    for m in names:
        assert is_valid_metric(m), f"unknown metric {m}"

    apply_fn, model_cfg = load_model_inference(cfg)
    num_images = cfg.get("num_inception_images", 50000)
    batch = cfg.get("eval_batch_size", 64)
    class_cond, instance_cond = conditioning_flags(cfg, model_cfg)

    dataset = None
    _, _, _, data_kwargs = split_config(cfg)
    data_root = data_kwargs.get("data_path")
    # PPL alone needs no Inception/moments, but a conditional network
    # still needs the dataset to draw its (c, h) endpoints.
    needs_inception = any(m not in PPL_METRICS for m in names)
    if needs_inception or class_cond or instance_cond:
        from ic_gan_tpu.data.datasets import get_dataset_hdf5

        # The NETWORK decides what conditioning the dataset must serve: SG2
        # configs carry h_dim/c_dim, not the BigGAN class_cond/instance_cond
        # flags split_config defaults to False.
        data_kwargs["class_cond"] |= class_cond
        data_kwargs["instance_cond"] |= instance_cond
        dataset = get_dataset_hdf5(**data_kwargs)

    evaluator = None
    if needs_inception:
        from ic_gan_tpu.eval.pipeline import InceptionEvaluator

        evaluator = InceptionEvaluator(cfg.get("inception_weights"),
                                       deploy_bf16=cfg.get("eval_bf16", False))
    sample = make_conditioned_sampler(cfg, apply_fn, model_cfg, dataset)

    real_cache: Dict[object, np.ndarray] = {}

    def real_features(max_real):
        """Real-side pool features honoring the registry's ``max_real`` cap
        (ref ``metric_main.py:107-184``), bounded by ``max_real_images`` for
        smoke runs (``prdc_ref_images`` kept as a back-compat alias)."""
        bound = cfg.get(
            "max_real_images",
            cfg.get("prdc_ref_images", min(num_images, 10000)),
        )
        n = bound if max_real is None else min(max_real, bound)
        if n not in real_cache:
            from ic_gan_tpu.eval.pipeline import cached_real_features

            real_cache[n] = cached_real_features(
                dataset, evaluator,
                cache_dir=os.path.join(data_root, "feature_cache"),
                n_items=n, batch=batch,
            )
        return real_cache[n]

    def ppl_kwargs():
        """Shared setup for the five PPL registry entries (space/sampling/crop
        live in the registry; ref ``perceptual_path_length.py:40-92``).  LPIPS
        features when a VGG16 weight file is available ($ICGAN_VGG16_WEIGHTS);
        per-batch noise keys reproduce the reference's noise_const
        re-randomization (``:75-78``), shared across the (t0, t1) pair."""
        assert cfg.get("backbone") == "stylegan2", \
            "PPL metrics need the stylegan2 backbone"
        from ic_gan_tpu.eval.metrics import make_lpips_feature_fn

        g, variables = apply_fn.module, apply_fn.variables
        map_fn = jax.jit(lambda z, c=None, feats=None: g.apply(
            variables, z, c, feats, method=g.map_ws))
        synth_fn = jax.jit(lambda ws, rng: g.apply(
            variables, ws, noise_mode="random", method=g.synthesize,
            rngs={"noise": rng}))
        cond_sampler = None
        if class_cond or instance_cond:
            # Conditional endpoints come from the dataset like the
            # reference's generator-stats sampling
            # (``metric_utils.py:368-388``).
            def cond_sampler(b):
                lab, feats = dataset.sample_conditioning_instance_balance(b)
                cond = {}
                if instance_cond:
                    cond["feats"] = jnp.asarray(feats)
                if class_cond and lab is not None:
                    c = jnp.asarray(lab)
                    if c.ndim == 1:
                        c = jax.nn.one_hot(c, model_cfg.c_dim)
                    cond["c"] = c
                return cond

        feature_fn = None
        if os.environ.get("ICGAN_VGG16_WEIGHTS"):
            feature_fn = make_lpips_feature_fn(
                os.environ["ICGAN_VGG16_WEIGHTS"])
        return dict(
            g_synthesize=synth_fn, map_ws=map_fn,
            z_dim=model_cfg.z_dim,
            num_samples=cfg.get("ppl_num_samples", min(num_images, 2000)),
            batch=batch, feature_fn=feature_fn,
            cond_sampler=cond_sampler,
        )

    results = {}
    for name in names:
        kw = dict(num_images=num_images, batch=batch)
        if name == "fid50k_full":
            from ic_gan_tpu.eval.pipeline import moments_filename

            ref = np.load(os.path.join(
                data_root,
                moments_filename(
                    cfg.get("resolution", 64),
                    cfg.get("which_dataset", "imagenet"),
                    cfg.get("longtail", False),
                ),
            ))
            kw.update(evaluator=evaluator, sample_fn=sample,
                      ref_mu=ref["mu"], ref_sigma=ref["sigma"])
        elif name in ("fid50k", "kid50k_full", "kid50k", "pr50k3",
                      "pr50k3_full"):
            kw.update(evaluator=evaluator, sample_fn=sample,
                      real_features=real_features(_METRICS[name].max_real))
        elif name == "is50k":
            kw.update(evaluator=evaluator, sample_fn=sample)
        elif name in PPL_METRICS:
            kw = ppl_kwargs()
        out = calc_metric(name, **kw)
        results.update(out)
        run_dir = cfg.get("run_dir", "")
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            with open(os.path.join(run_dir, f"metric-{name}.jsonl"), "a") as f:
                f.write(json.dumps(
                    {"results": {k: (v if isinstance(v, str) else float(v))
                                 for k, v in out.items()},
                     "metric": name, "total_images": num_images,
                     "timestamp": time.time()}) + "\n")

    print({k: (v if isinstance(v, str) else round(float(v), 4))
           for k, v in results.items()})
    return results


if __name__ == "__main__":
    main()
