"""Calculate quality metrics for a trained network (reference:
``stylegan2_ada_pytorch/calc_metrics.py``).

    python -m ic_gan_tpu.cli.calc_metrics --json_config cfg.json \
        --set metrics=fid50k_full,is50k

Metric names follow the reference registry (``metrics/metric_main.py:98-151``):
``fid50k_full``, ``kid50k_full``, ``is50k``, ``pr50k3``, ``ppl2_wend``.
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

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.cli.config import parse_args, split_config
from ic_gan_tpu.cli.inference import load_model_inference


def _build_sample_fn(cfg, apply_fn, model_cfg, dataset):
    """Conditioning-aware sampler returning (device images, labels)."""
    dim_z = getattr(model_cfg, "effective_dim_z", None) or model_cfg.z_dim
    z_var = cfg.get("z_var", 1.0)
    counter = [0]

    def sample(b):
        counter[0] += 1
        rng = jax.random.PRNGKey(cfg.get("seed", 0) + counter[0])
        labels = feats = None
        if dataset is not None and (
            getattr(model_cfg, "class_cond", False)
            or getattr(model_cfg, "instance_cond", False)
        ):
            if dataset.which_nn_balance == "instance_balance":
                labels, feats = dataset.sample_conditioning_instance_balance(b)
            else:
                labels, feats = dataset.sample_conditioning_nnclass_balance(
                    b, num_classes=model_cfg.n_classes
                )
        z = jax.random.normal(rng, (b, dim_z)) * np.sqrt(z_var)
        imgs = apply_fn(
            z,
            jnp.asarray(labels)
            if getattr(model_cfg, "class_cond", False)
            else None,
            jnp.asarray(feats)
            if getattr(model_cfg, "instance_cond", False)
            else None,
            device_output=True,
        )
        return imgs, labels

    return sample


def main(argv=None):
    cfg = parse_args(argv)
    from ic_gan_tpu.eval.metrics import calc_metric, is_valid_metric

    names = [m for m in str(cfg.get("metrics", "fid50k_full")).split(",") if m]
    for m in names:
        assert is_valid_metric(m), f"unknown metric {m}"

    apply_fn, model_cfg = load_model_inference(cfg)
    num_images = cfg.get("num_inception_images", 50000)
    batch = cfg.get("eval_batch_size", 64)

    dataset = None
    _, _, _, data_kwargs = split_config(cfg)
    data_root = data_kwargs.get("data_path")
    needs_data = any(m != "ppl2_wend" for m in names)
    if needs_data:
        from ic_gan_tpu.data.datasets import get_dataset_hdf5

        dataset = get_dataset_hdf5(**data_kwargs)

    evaluator = None
    if needs_data:
        from ic_gan_tpu.eval.pipeline import InceptionEvaluator

        evaluator = InceptionEvaluator(cfg.get("inception_weights"))
    sample = _build_sample_fn(cfg, apply_fn, model_cfg, dataset)

    def real_features():
        from ic_gan_tpu.eval.pipeline import cached_real_features

        return cached_real_features(
            dataset, evaluator,
            cache_dir=os.path.join(data_root, "feature_cache"),
            n_items=cfg.get("prdc_ref_images", min(num_images, 10000)),
            batch=batch,
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
        elif name in ("kid50k_full", "pr50k3"):
            kw.update(evaluator=evaluator, sample_fn=sample,
                      real_features=real_features())
        elif name == "is50k":
            kw.update(evaluator=evaluator, sample_fn=sample)
        elif name == "ppl2_wend":
            # W-space endpoints on the StyleGAN2 backbone (ref
            # ``perceptual_path_length.py:40-92``); LPIPS features when a
            # VGG16 weight file is available ($ICGAN_VGG16_WEIGHTS).
            assert cfg.get("backbone") == "stylegan2", \
                "ppl2_wend needs the stylegan2 backbone"
            from ic_gan_tpu.eval.metrics import make_lpips_feature_fn

            g, variables = apply_fn.module, apply_fn.variables
            map_fn = jax.jit(lambda z: g.apply(
                variables, z, method=g.map_ws))
            synth_fn = jax.jit(lambda ws: g.apply(
                variables, ws, noise_mode="const", method=g.synthesize))
            feature_fn = None
            if os.environ.get("ICGAN_VGG16_WEIGHTS"):
                feature_fn = make_lpips_feature_fn(
                    os.environ["ICGAN_VGG16_WEIGHTS"])
            kw = dict(
                g_synthesize=synth_fn, map_ws=map_fn,
                z_dim=model_cfg.z_dim,
                num_samples=cfg.get("ppl_num_samples", min(num_images, 2000)),
                batch=batch, feature_fn=feature_fn,
            )
        out = calc_metric(name, **kw)
        results.update(out)
        run_dir = cfg.get("run_dir", "")
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            with open(os.path.join(run_dir, f"metric-{name}.jsonl"), "a") as f:
                f.write(json.dumps(
                    {"results": {k: float(v) for k, v in out.items()},
                     "metric": name, "total_images": num_images,
                     "timestamp": time.time()}) + "\n")

    print({k: round(float(v), 4) for k, v in results.items()})
    return results


if __name__ == "__main__":
    main()
