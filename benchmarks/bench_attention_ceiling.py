"""Is the sampling headline's attention block at its shape ceiling?

`results/sample_attribution.json` showed G_attn64 at 21 TFLOP/s for ~8 % of
the 256² sampling batch, with no intrinsic-rate proof (the conv stages have
one — README "Performance").  This bench decomposes the SA-GAN block at its
exact serving geometry (batch 128, 64², ch 384 → d=ch/8=48, Lq=4096,
Lk=1024, dv=192; ref ``BigGAN_PyTorch/layers.py:206-244``) into measured
pieces, each timed standalone at the block's own shapes:

  - the fused θ|φ|g projection (one 384→288 1×1 conv — deployment fusion),
  - the Pallas attention core (softmax(θφᵀ)·g, logits resident in VMEM),
  - the two bare MXU dots alone (no softmax) — the FLOP-bearing floor,
  - a d=128 control dot: same (Lq, Lk) geometry with the contraction padded
    to the MXU's 128 rows.  If its TFLOP/s is ~128/48 higher, the first
    dot's low rate is lane starvation intrinsic to the reference's d=ch/8
    head width, not schedulable headroom,
  - the o-conv (192→384 1×1) and the γ·o + x residual (pure HBM traffic).

If Σ pieces ≈ the whole block and each piece runs at its own per-shape
ceiling, 21 TFLOP/s is the geometry and the README claim is earned.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_attention_ceiling.py
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

N = 128
RES = 64
CH = 384  # the 256² ch96 generator's 64² stage


def _time_fn(fn, args, iters=8):
    def many(x, *rest):
        def body(c, _):
            out = fn(x * (1.0 + c.astype(x.dtype)), *rest)
            return jnp.sum(out.astype(jnp.float32)) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    compiled = jax.jit(many).lower(*args).compile()
    float(np.asarray(compiled(*args)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(compiled(*args)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from ic_gan_tpu.io.deploy import fold_spectral_norm
    from ic_gan_tpu.models.layers import SelfAttention, max_pool_2x
    from ic_gan_tpu.ops.pallas.attention import sagan_attention

    rng = np.random.RandomState(0)
    d, dv = CH // 8, CH // 2
    Lq, Lk = RES * RES, RES * RES // 4
    out = {"batch": N, "resolution": RES, "ch": CH,
           "d": d, "dv": dv, "Lq": Lq, "Lk": Lk}

    def report(key, t, flops=None, extra=""):
        out[f"{key}_ms"] = t * 1e3
        msg = f"{key:18s} {t*1e3:7.2f} ms"
        if flops:
            out[f"{key}_tflops"] = flops / t / 1e12
            msg += f"  ({flops/t/1e12:6.1f} TFLOP/s)"
        print(msg + ("  " + extra if extra else ""), flush=True)

    # --- the whole block, deployment mode (σ folded → fused qkv) ---------
    mod = SelfAttention(CH, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(N, RES, RES, CH), jnp.bfloat16)
    variables = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), x))()
    folded = fold_spectral_norm(variables)
    t_blk = _time_fn(
        lambda xx: mod.apply(folded, xx, update_sn=False), (x,))
    fl_blk = 2 * N * Lq * (CH * (d + d + dv) + Lk * (d + dv) + dv * CH)
    report("block", t_blk, fl_blk)

    # --- pieces at the block's own shapes ---------------------------------
    wqkv = jnp.asarray(rng.randn(1, 1, CH, d + d + dv) * 0.05, jnp.bfloat16)
    t_qkv = _time_fn(
        lambda xx: jax.lax.conv_general_dilated(
            xx, wqkv, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (x,))
    report("qkv_proj", t_qkv, 2 * N * Lq * CH * (d + d + dv))

    xpg = jnp.asarray(rng.randn(N, RES, RES, d + dv), jnp.bfloat16)
    t_pool = _time_fn(max_pool_2x, (xpg,))
    report("pool_phi_g", t_pool, extra="(HBM-bound elementwise)")

    theta = jnp.asarray(rng.randn(N, Lq, d), jnp.bfloat16)
    phi = jnp.asarray(rng.randn(N, Lk, d), jnp.bfloat16)
    g = jnp.asarray(rng.randn(N, Lk, dv), jnp.bfloat16)
    t_core = _time_fn(lambda th: sagan_attention(th, phi, g), (theta,))
    fl_core = 2 * N * Lq * Lk * (d + dv)
    report("pallas_core", t_core, fl_core)

    # bare dots (no softmax): logits round-trip HBM between them when run
    # standalone, which the fused kernel avoids — so their sum OVERSTATES
    # the fused floor.
    t_dot1 = _time_fn(
        lambda th: jnp.einsum("nqc,nkc->nqk", th, phi,
                              preferred_element_type=jnp.bfloat16),
        (theta,))
    report("dot1_bare_d48", t_dot1, 2 * N * Lq * Lk * d)
    beta = jnp.asarray(rng.rand(N, Lq, Lk) / Lk, jnp.bfloat16)
    t_dot2 = _time_fn(
        lambda b: jnp.einsum("nqk,nkc->nqc", b, g,
                             preferred_element_type=jnp.float32),
        (beta,))
    report("dot2_bare", t_dot2, 2 * N * Lq * Lk * dv)

    # control: pad the contraction to the MXU's 128 rows — same Lq×Lk tile
    # geometry, 128/48 the FLOPs.  Rate ratio ≈ 128/48 ⇒ lane starvation.
    theta128 = jnp.asarray(rng.randn(N, Lq, 128), jnp.bfloat16)
    phi128 = jnp.asarray(rng.randn(N, Lk, 128), jnp.bfloat16)
    t_dot1c = _time_fn(
        lambda th: jnp.einsum("nqc,nkc->nqk", th, phi128,
                              preferred_element_type=jnp.bfloat16),
        (theta128,))
    report("dot1_ctrl_d128", t_dot1c, 2 * N * Lq * Lk * 128,
           extra=f"rate ratio vs d48: "
                 f"{(128 / t_dot1c) / (d / t_dot1):.2f} (lanes: "
                 f"{128 / d:.2f})")

    o = jnp.asarray(rng.randn(N, RES, RES, dv), jnp.bfloat16)
    wo = jnp.asarray(rng.randn(1, 1, dv, CH) * 0.05, jnp.bfloat16)
    t_oconv = _time_fn(
        lambda oo: jax.lax.conv_general_dilated(
            oo, wo, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (o,))
    report("o_conv", t_oconv, 2 * N * Lq * dv * CH)

    ofull = jnp.asarray(rng.randn(N, RES, RES, CH), jnp.bfloat16)
    # x as an explicit arg: a 402 MB closure constant gets baked into the
    # remote-compile payload and the relay rejects it (HTTP 413).
    t_res = _time_fn(lambda oo, xx: jnp.bfloat16(0.7) * oo + xx, (ofull, x))
    report("residual", t_res, extra="(pure HBM: 3×302 MB)")

    pieces = t_qkv + t_pool + t_core + t_oconv + t_res
    out["pieces_ms"] = pieces * 1e3
    out["pieces_vs_block"] = t_blk / pieces
    print(f"\nΣ pieces {pieces*1e3:.2f} ms vs whole block {t_blk*1e3:.2f} ms"
          f" → block/pieces {t_blk/pieces:.2f}", flush=True)
    record("attention_ceiling", **out)


if __name__ == "__main__":
    main()
