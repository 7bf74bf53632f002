"""End-to-end quantitative-eval loop on the real chip: 10k-image FID/IS.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_eval_fid.py

Demonstrates the full ``cli/test.py`` flow — fused generator→Inception
executable (``eval/pipeline.make_fused_feature_fn``) → on-device moments →
Newton-Schulz FID + IS — at bench-class throughput on the relay TPU.
Measures the fused loop in both Inception modes (f32 trunk and the bf16
deployment mode), the legacy two-dispatch loop for reference, and the
FID drift bf16-vs-f32 evaluation introduces on an identical image stream.
Weights are random (zero-egress env): FID values are self-consistent only;
the measurements are throughput and numerics drift.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache

enable_compile_cache()

from __graft_entry__ import _fast_variables


def main(num_images=10000, batch=128, resolution=256, full_50k=False):
    from ic_gan_tpu.models.biggan import BigGANConfig, Generator
    from ic_gan_tpu.io.deploy import make_sampler
    from ic_gan_tpu.eval.pipeline import (
        InceptionEvaluator, evaluate_generator, make_fused_feature_fn,
    )

    cfg = BigGANConfig(resolution=resolution, G_ch=96, G_attn="64",
                       dtype=jnp.bfloat16)
    g = Generator(cfg)
    z0 = jnp.zeros((1, cfg.effective_dim_z))
    f0 = jnp.zeros((1, cfg.instance_sz))
    variables = _fast_variables(g, z0, None, f0, train=False)
    sampler = make_sampler(g, variables, batch_size=batch, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    feats_bank = rng.randn(1000, cfg.instance_sz).astype(np.float32)

    def draw(seed):
        k = jax.random.PRNGKey(seed)
        z = jax.random.normal(k, (batch, cfg.effective_dim_z))
        feats = jnp.asarray(feats_bank[np.random.RandomState(seed).randint(
            0, 1000, batch)])
        return z, feats

    ev32 = InceptionEvaluator()
    ev16 = InceptionEvaluator(deploy_bf16=True)
    ev16.variables = ev32.variables  # identical weights: drift is mode-only
    fused32 = make_fused_feature_fn(sampler, ev32)
    fused16 = make_fused_feature_fn(sampler, ev16)

    ref_mu = rng.randn(2048).astype(np.float64) * 0.01
    a = rng.randn(2048, 2048).astype(np.float64) * 0.01
    ref_sigma = a @ a.T + np.eye(2048)

    out = {"num_images": num_images, "batch": batch, "resolution": resolution}

    if full_50k:
        # fid50k-scale wall clock: the reference budgets fid50k_full at
        # ~13 min/V100 (stylegan2_ada_pytorch/README.md:326-330, 1024²; the
        # generator half of that cost shrinks at 256² but the 50k Inception
        # passes dominate either way).  One cold + one steady full
        # evaluate_generator at 50k generated images, fused bf16 path.
        seed50 = [5 * 10**6]

        def feature_fn50(b):
            seed50[0] += 1
            z, feats = draw(seed50[0])
            pool, logits = fused16(z, None, feats)
            return pool, logits, None

        for tag in ("cold", "steady"):
            t0 = time.perf_counter()
            res = evaluate_generator(
                None, ev16, ref_mu, ref_sigma,
                num_images=num_images, batch=batch, feature_fn=feature_fn50,
            )
            dt = time.perf_counter() - t0
            print(f"fid50k-scale eval ({tag}): {num_images} images in "
                  f"{dt:.1f}s = {num_images/dt:.1f} img/s")
            out[f"e2e_{tag}_seconds"] = dt
        out["e2e_img_s"] = num_images / dt
        out["FID_selfconsistent"] = float(res["FID"])
        from _results import record

        record("eval_fid50k", **out)
        return

    # --- fused feature loops (the cli/test.py fused_eval=True path) --------
    def loop(feature_source, tag):
        z, feats = draw(0)
        pool, _ = feature_source(z, None, feats)
        float(jnp.sum(pool))  # warm
        t0 = time.perf_counter()
        last = None
        for i in range(0, num_images, batch):
            z, feats = draw(1 + i)
            last, _ = feature_source(z, None, feats)
        float(jnp.sum(last))
        dt = time.perf_counter() - t0
        print(f"fused feature loop [{tag}]: {num_images} images in {dt:.1f}s "
              f"= {num_images/dt:.1f} img/s")
        return num_images / dt

    out["feature_loop_img_s"] = loop(fused16, "bf16 inception")
    out["feature_loop_f32_img_s"] = loop(fused32, "f32 inception")

    # Legacy two-dispatch loop (pre-r4 shape) for the overhead comparison.
    seed = [10**6]

    def sample_fn(b):
        seed[0] += 1
        z, feats = draw(seed[0])
        return sampler(z, None, feats, device_output=True), None

    imgs, _ = sample_fn(batch)
    ev16(jnp.asarray(imgs), device_output=True)
    t0 = time.perf_counter()
    outs = []
    for _ in range(0, num_images, batch):
        im, _ = sample_fn(batch)
        outs.append(ev16(im, device_output=True)[0])
    float(jnp.sum(outs[-1]))
    dt_split = time.perf_counter() - t0
    out["feature_loop_split_img_s"] = num_images / dt_split
    print(f"split feature loop [bf16]: {num_images/dt_split:.1f} img/s")
    del outs

    # --- numerics: bf16-vs-f32 drift on an IDENTICAL image stream ----------
    # The meaningful statement is the FID *between* the two pools (how far
    # apart the two evaluation modes place the same image distribution, in
    # FID units) plus the relative feature drift — NOT each mode's FID
    # against a distant reference, which is insensitive to the trunk dtype
    # (both modes land within f64 noise of each other there).
    n_drift = 2560
    pools = {"f32": [], "bf16": []}
    for i in range(0, n_drift, batch):
        z, feats = draw(10_000 + i)
        im = sampler(z, None, feats, device_output=True)
        for tag, ev in (("f32", ev32), ("bf16", ev16)):
            pools[tag].append(np.asarray(ev(im, device_output=True)[0]))
    from ic_gan_tpu.eval.fid import frechet_distance

    p32 = np.concatenate(pools["f32"]).astype(np.float64)
    p16 = np.concatenate(pools["bf16"]).astype(np.float64)
    out["pool_drift_rel"] = float(
        np.abs(p16 - p32).mean() / np.abs(p32).mean())
    out["fid_between_modes"] = frechet_distance(
        p16.mean(0), np.cov(p16, rowvar=False),
        p32.mean(0), np.cov(p32, rowvar=False))
    print(f"bf16 vs f32 drift ({n_drift} imgs): relative feature drift "
          f"{out['pool_drift_rel']:.2e}; FID(bf16 pool, f32 pool) = "
          f"{out['fid_between_modes']:.4f}")

    # --- full evaluate_generator e2e (fused bf16), cold + steady -----------
    def feature_fn(b):
        seed[0] += 1
        z, feats = draw(seed[0])
        pool, logits = fused16(z, None, feats)
        return pool, logits, None

    dts = []
    for tag in ("cold", "steady"):
        t0 = time.perf_counter()
        res = evaluate_generator(
            None, ev16, ref_mu, ref_sigma,
            num_images=num_images, batch=batch, feature_fn=feature_fn,
        )
        dt = time.perf_counter() - t0
        dts.append(dt)
        print(f"full eval ({tag}): {num_images} images in {dt:.1f}s = "
              f"{num_images/dt:.1f} img/s (+ device metric tail)")
    print({k: round(float(v), 3) for k, v in res.items()})
    out["e2e_cold_seconds"] = dts[0]
    out["e2e_seconds"] = dts[1]
    out["e2e_img_s"] = num_images / dts[1]

    from _results import record

    record("eval_fid", **out)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "50k":
        main(num_images=50000, full_50k=True)
    else:
        main()
