"""Quantitative evaluation of a trained model (reference: ``inference/test.py``).

Computes IS / FID (+ optional PRDC, stratified FID) over
``num_inception_images`` samples with dataset-driven conditioning, and can
export a sample npz for external eval (the reference's TF1 path).

Usage:
    python -m ic_gan_tpu.cli.test --json_config cfg.json [--set ...]
"""

from __future__ import annotations

import os

import numpy as np


from ic_gan_tpu.cli.config import parse_args, split_config
from ic_gan_tpu.cli.inference import (
    conditioning_flags,
    load_model_inference,
    make_conditioned_sampler,
)


def main(argv=None):
    cfg = parse_args(argv)
    apply_fn, model_cfg = load_model_inference(cfg)

    from ic_gan_tpu.data.datasets import get_dataset_hdf5
    from ic_gan_tpu.eval.pipeline import (
        InceptionEvaluator,
        evaluate_generator,
        moments_filename,
    )

    _, _, _, data_kwargs = split_config(cfg)
    # The network decides the conditioning the dataset must serve (SG2
    # configs carry h_dim/c_dim, not BigGAN's class_cond/instance_cond).
    class_cond, instance_cond = conditioning_flags(cfg, model_cfg)
    data_kwargs["class_cond"] |= class_cond
    data_kwargs["instance_cond"] |= instance_cond
    dataset = get_dataset_hdf5(**data_kwargs)

    data_root = data_kwargs["data_path"]
    ref = np.load(
        os.path.join(
            data_root,
            moments_filename(
                cfg.get("resolution", 64),
                cfg.get("which_dataset", "imagenet"),
                cfg.get("longtail", False),
            ),
        )
    )
    # eval_bf16: bf16 Inception trunk (models/inception.py deployment
    # mode) — ~1.8x the Inception pass for ~1% relative pool drift
    # (benchmarks/results/eval_fid.json: pool_drift_rel/fid_between_modes);
    # keep False when comparing FIDs against f32-evaluated baselines at <1%.
    evaluator = InceptionEvaluator(cfg.get("inception_weights"),
                                   deploy_bf16=cfg.get("eval_bf16", False))

    if cfg.get("accumulate_stats", False) and cfg.get(
        "backbone", "biggan"
    ) == "biggan":
        # G_eval_mode standing BN statistics before sampling (ref
        # train_fns.py:159-163 / utils.py:1679-1695; BigGAN-only — SG2 has
        # no batch norm).
        def _standing_cond(n):
            labels, feats = dataset.sample_conditioning_instance_balance(n)
            return (
                labels if class_cond else None,
                feats if instance_cond else None,
            )

        apply_fn = apply_fn.with_standing_stats(_standing_cond)

    def make_sample(var):
        return make_conditioned_sampler(
            cfg, apply_fn, model_cfg, dataset, z_var=var
        )

    sample = make_sample(cfg.get("z_var", 1.0))

    stratified = None
    samples_per_class = None
    if cfg.get("stratified_moments", False):
        # ImageNet-LT many/low/few-shot strata (ref test.py + inception_utils
        # stratified path); needs the precomputed per-stratum moments and the
        # samples-per-class table.
        stratified = {}
        for strat in ("many", "low", "few"):
            path = os.path.join(
                data_root,
                moments_filename(cfg.get("resolution", 64), strat=strat),
            )
            if os.path.exists(path):
                m = np.load(path)
                stratified[strat] = (m["mu"], m["sigma"])
        spc_path = cfg.get("samples_per_class_path", "")
        if spc_path and os.path.exists(spc_path):
            samples_per_class = np.load(spc_path, allow_pickle=True)

    prdc_ref = None
    if cfg.get("eval_prdc", False):
        # Reference features for PRDC from real data (ref test.py:82-91),
        # disk-cached by dataset identity (ref metric_utils.py:245-268).
        from ic_gan_tpu.eval.pipeline import cached_real_features

        prdc_ref = cached_real_features(
            dataset, evaluator,
            cache_dir=os.path.join(data_root, "feature_cache"),
            n_items=cfg.get("prdc_ref_images", 10000),
            batch=cfg.get("eval_batch_size", 64),
        )

    # Fused generator→Inception executable (one dispatch per batch; the
    # split loop leaves ~30% of the relay throughput on the floor —
    # eval/pipeline.make_fused_feature_fn).  fused_eval=False restores the
    # two-stage loop.
    feature_fn = None
    if cfg.get("fused_eval", True):
        from ic_gan_tpu.cli.inference import make_conditioned_feature_fn

        feature_fn = make_conditioned_feature_fn(sample, evaluator)

    metrics = evaluate_generator(
        sample,
        evaluator,
        ref["mu"],
        ref["sigma"],
        num_images=cfg.get("num_inception_images", 50000),
        batch=cfg.get("eval_batch_size", 64),
        prdc_ref_features=prdc_ref,
        prdc_nearest_k=cfg.get("prdc_nearest_k", 5),
        stratified=stratified,
        samples_per_class=samples_per_class,
        feature_fn=feature_fn,
    )
    print({k: round(float(v), 4) for k, v in metrics.items()})

    if cfg.get("sample_trunc_curves"):
        # Truncation curves (ref flag ``--sample_trunc_curves``,
        # ``utils.py:923-932``: "start_step_end" z-variance sweep, IS/FID at
        # each point; the reference parser defines the flag but ships no
        # consumer script — this is the consumer).
        start, step, end = (
            float(v) for v in str(cfg["sample_trunc_curves"]).split("_")
        )
        assert step > 0, f"sample_trunc_curves step must be > 0, got {step}"
        curve = []
        var = start
        while var <= end + 1e-9:
            m = evaluate_generator(
                make_sample(var), evaluator, ref["mu"], ref["sigma"],
                num_images=cfg.get("num_inception_images", 50000),
                batch=cfg.get("eval_batch_size", 64),
            )
            point = {"z_var": round(var, 6),
                     **{k: float(v) for k, v in m.items()}}
            print(f"trunc z_var={var:.3f}: "
                  f"IS {point['IS_mean']:.3f} FID {point['FID']:.3f}")
            curve.append(point)
            var += step
        metrics = dict(metrics, trunc_curves=curve)

    out = cfg.get("metrics_out", "")
    if out:
        np.save(out, metrics, allow_pickle=True)

    if cfg.get("sample_npz", False):
        # Export samples for the official TF-based eval (ref test.py:186-267).
        n = cfg.get("sample_num_npz", 50000)
        imgs_all = []
        remaining = n
        while remaining > 0:
            b = min(cfg.get("eval_batch_size", 64), remaining)
            imgs, _ = sample(b)
            imgs_all.append(((imgs + 1) / 2 * 255).astype(np.uint8))
            remaining -= b
        x = np.concatenate(imgs_all)
        npz_path = cfg.get("npz_path", "samples.npz")
        np.savez(npz_path, x=np.transpose(x, (0, 3, 1, 2)))
        print(f"wrote {len(x)} samples to {npz_path}")


if __name__ == "__main__":
    main()
