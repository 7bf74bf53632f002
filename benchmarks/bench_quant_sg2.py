"""StyleGAN2 int8 serving mode vs the bf16 deployment sampler (256², b128).

SG2 counterpart of ``bench_quant_sample.py``: modulated convs keep the
per-sample style scaling on the activations, so the static weights (and
the up=2 composite polyphase kernels) quantize per-output-channel like
plain convs (``io/quant.quantize_stylegan2_variables``); activation
scales calibrate on the modulated inputs.  Measures throughput against
the bf16 path at the reference IC-GAN COCO geometry (cfg 'paper256',
h_dim 2048 — same setup as ``bench_sg2_sample.py``), plus the numeric
cost: mean relative image drift and the FID between the two modes'
Inception pools on an identical z/feats stream.  Weights are random
(zero egress) — drift numbers pin the machinery; perceptual quality on
trained checkpoints must be validated by the deployer.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_quant_sg2.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache, record

enable_compile_cache()

BATCH = 128


def _time_sampler(sampler, z, f, iters=8):
    imgs = sampler(z, None, f, device_output=True)
    float(jnp.sum(imgs.astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            imgs = sampler(z * (1.0 + 1e-6 * i), None, f, device_output=True)
        float(jnp.sum(imgs.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from ic_gan_tpu.eval.fid import frechet_distance
    from ic_gan_tpu.eval.pipeline import InceptionEvaluator
    from ic_gan_tpu.io.deploy import make_sampler
    from ic_gan_tpu.io.quant import quantize_stylegan2_variables
    from ic_gan_tpu.models import stylegan2 as sg2

    cfg = sg2.StyleGAN2Config(
        img_resolution=256, z_dim=512, c_dim=0, h_dim=2048, w_dim=512,
        channel_base=16384, channel_max=512,
    )
    g = sg2.Generator(cfg)
    z0 = jnp.zeros((1, cfg.z_dim))
    h0 = jnp.zeros((1, cfg.h_dim))
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda: g.init(rngs, z0, None, h0))()

    rng = np.random.RandomState(0)
    z = rng.randn(BATCH, cfg.z_dim).astype(np.float32)
    h = rng.randn(BATCH, cfg.h_dim).astype(np.float32)

    # Three int8 activation-scale schemes, A/B'd in ONE process so the
    # comparison is controlled (the relay chip's rate drifts run-to-run):
    #   pt  — per-tensor static absmax (the r4 scheme: 7.1% drift),
    #   pc  — per-input-channel static, folded into the weights,
    #   dyn — pc + per-sample dynamic range boost (the default).
    qvs = {
        "pt": quantize_stylegan2_variables(
            g, variables, jnp.asarray(z), None, jnp.asarray(h),
            noise_mode="const", per_channel_act=False),
        "pc": quantize_stylegan2_variables(
            g, variables, jnp.asarray(z), None, jnp.asarray(h),
            noise_mode="const"),
        "dyn": quantize_stylegan2_variables(
            g, variables, jnp.asarray(z), None, jnp.asarray(h),
            noise_mode="const", act_dynamic=True),
    }
    s_bf = make_sampler(g, variables, batch_size=BATCH, noise_mode="const")
    samplers = {k: make_sampler(g, v, batch_size=BATCH, noise_mode="const")
                for k, v in qvs.items()}

    t_bf = _time_sampler(s_bf, z, h)
    out = {
        "batch": BATCH, "resolution": 256, "channel_base": cfg.channel_base,
        "h_dim": cfg.h_dim,
        "bf16_img_s": BATCH / t_bf, "bf16_ms": t_bf * 1e3,
    }
    print(f"sg2 bf16 sampler: {BATCH/t_bf:7.1f} img/s ({t_bf*1e3:.1f} ms)",
          flush=True)
    # Drift on a FRESH (non-calibration) stream — that is what dynamic
    # adaptation exists for.
    rng2 = np.random.RandomState(7)
    z2 = rng2.randn(BATCH, cfg.z_dim).astype(np.float32)
    h2 = rng2.randn(BATCH, cfg.h_dim).astype(np.float32)
    a = np.asarray(s_bf(z2, None, h2)).astype(np.float64)
    for k, s in samplers.items():
        t = _time_sampler(s, z, h)
        b = np.asarray(s(z2, None, h2)).astype(np.float64)
        drift = float(np.abs(a - b).mean() / np.abs(a).mean())
        out[f"{k}_ms"] = t * 1e3
        out[f"{k}_speedup"] = t_bf / t
        out[f"{k}_img_drift_rel"] = drift
        print(f"sg2 int8[{k:3s}]:  {BATCH/t:7.1f} img/s ({t*1e3:.1f} ms) "
              f"= {t_bf/t:.2f}x   drift {drift:.3e}", flush=True)
    # Headline fields = the default scheme (per-channel static; the dynamic
    # knob's reduce-max pass costs ~13% e2e for 1% drift — measured above).
    s_q = samplers["pc"]
    t_q = out["pc_ms"] / 1e3
    out.update({
        "int8_img_s": BATCH / t_q, "int8_ms": t_q * 1e3,
        "speedup": t_bf / t_q,
        "img_drift_rel": out["pc_img_drift_rel"],
    })

    ev = InceptionEvaluator(deploy_bf16=True)
    n_fid = 2560
    pools = {"bf16": [], "int8": []}
    for i in range(0, n_fid, BATCH):
        zi = np.random.RandomState(100 + i).randn(
            BATCH, cfg.z_dim).astype(np.float32)
        fi = np.random.RandomState(200 + i).randn(
            BATCH, cfg.h_dim).astype(np.float32)
        for tag, s in (("bf16", s_bf), ("int8", s_q)):
            im = s(zi, None, fi, device_output=True)
            pools[tag].append(np.asarray(ev(im, device_output=True)[0]))
    pa = np.concatenate(pools["bf16"]).astype(np.float64)
    pb = np.concatenate(pools["int8"]).astype(np.float64)
    out["fid_between_modes"] = frechet_distance(
        pa.mean(0), np.cov(pa, rowvar=False),
        pb.mean(0), np.cov(pb, rowvar=False))
    print(f"image drift {out['img_drift_rel']:.3e}; "
          f"FID(int8 pool, bf16 pool) over {n_fid} imgs = "
          f"{out['fid_between_modes']:.4f}")
    record("quant_sg2", **out)


if __name__ == "__main__":
    main()
