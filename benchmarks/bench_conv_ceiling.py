"""Per-geometry conv ceiling: what XLA's 3×3 conv sustains on this chip vs
an equal-FLOPs dense matmul (the MXU ceiling for the same contraction).

Interprets the SG2/BigGAN step MFU numbers: if the raw convs at the hot
block geometries only reach X TFLOP/s, a step built from them cannot beat
X — the step's "% of achievable" is the honest utilization figure, not
% of the 197 TFLOP/s bf16 peak (which assumes a perfectly-shaped matmul).
Results → ``benchmarks/results/conv_ceiling.json``.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache, record

enable_compile_cache()


def _time(fn, x, w, iters=32):
    """Device time per application: ``iters`` applications chained through a
    scalar data dependency inside one jitted ``lax.scan`` (the relay backend
    adds tens of ms of round-trip latency per host sync, so un-chained
    per-call timing overstates small kernels' cost several-fold)."""

    def many(x, w):
        def body(c, _):
            out = fn(x, w + c.astype(w.dtype))
            return jnp.sum(out).astype(jnp.float32) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    j = jax.jit(many)
    float(j(x, w))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(j(x, w))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    out = {}
    # (tag, batch, H, Cin, Cout) — the hot conv geometries of the SG2 256²
    # synthesis/discriminator blocks (mb16) and BigGAN 128² (mb128).
    geoms = [
        ("sg2_mb16_64x64_c256", 16, 64, 256, 256),
        ("sg2_mb16_32x32_c512", 16, 32, 512, 512),
        ("sg2_mb16_128x128_c128", 16, 128, 128, 128),
        ("biggan_mb128_32x32_c384", 128, 32, 384, 384),
        ("biggan_mb128_64x64_c192", 128, 64, 192, 192),
        ("biggan_mb128_128x128_c96", 128, 128, 96, 96),
    ]
    for tag, n, h, cin, cout in geoms:
        x = jnp.ones((n, h, h, cin), jnp.bfloat16)
        w = jnp.ones((3, 3, cin, cout), jnp.bfloat16)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        t = _time(conv, x, w)
        fl = 2 * n * h * h * 9 * cin * cout
        out[f"{tag}_conv_tflops"] = fl / t / 1e12

        # Equal-FLOPs matmul with the same contraction depth (9·Cin), the
        # same number of output rows (N·H·W), and the SAME f32 output dtype
        # as the conv (a bf16-emitting `a @ b` would write half the output
        # bytes — a flattering skew at output-traffic-bound geometries).
        a = jnp.ones((n * h * h, 9 * cin), jnp.bfloat16)
        b = jnp.ones((9 * cin, cout), jnp.bfloat16)
        tm = _time(lambda a, b: jnp.matmul(
            a, b, preferred_element_type=jnp.float32), a, b)
        out[f"{tag}_matmul_tflops"] = fl / tm / 1e12

        # Backward-shaped contractions for the same layer: dgrad is another
        # 3×3 conv (rotated kernel, same geometry → reuse the fwd number);
        # wgrad contracts over N·H·W: (9·Cin, N·H·W) × (N·H·W, Cout) — a
        # deep-K matmul with tiny output, a different MXU regime.  The step
        # aggregate mixes all three, so the per-op ceiling for a train step
        # is the FLOPs-weighted mix, not the forward number alone.
        aw = jnp.ones((9 * cin, n * h * h), jnp.bfloat16)
        bw = jnp.ones((n * h * h, cout), jnp.bfloat16)
        tw = _time(lambda a, b: jnp.matmul(
            a, b, preferred_element_type=jnp.float32), aw, bw)
        out[f"{tag}_wgrad_tflops"] = fl / tw / 1e12
        print(f"{tag}: conv {out[f'{tag}_conv_tflops']:6.1f} TFLOP/s, "
              f"im2col-matmul ceiling {out[f'{tag}_matmul_tflops']:6.1f}, "
              f"wgrad-shaped {out[f'{tag}_wgrad_tflops']:6.1f}",
              flush=True)

    # Deployment-sampler geometries (bf16-emitting, as the σ-folded sampler
    # runs): the 256² final G stage's 3×3 96→96 and the polyphase up-conv's
    # executed shape (2×2-ish kernel, 192→4·96 phases at 128²).  These bound
    # the headroom left in bench.py's headline — sample_attribution.json
    # measures the full block at 75.7 TFLOP/s; if the bare conv lands there
    # too, the stage is at its per-op ceiling.
    sample_geoms = [
        ("sample_mb128_256_c96_k3", 128, 256, 3, 96, 96),
        ("sample_mb128_128_c192_k2_4x96", 128, 128, 2, 192, 384),
    ]
    for tag, n, h, k, cin, cout in sample_geoms:
        x = jnp.ones((n, h, h, cin), jnp.bfloat16)
        w = jnp.ones((k, k, cin, cout), jnp.bfloat16)

        def conv16(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )

        t = _time(conv16, x, w, iters=16)
        fl = 2 * n * h * h * k * k * cin * cout
        out[f"{tag}_conv_tflops"] = fl / t / 1e12
        print(f"{tag}: bf16 conv {out[f'{tag}_conv_tflops']:6.1f} TFLOP/s",
              flush=True)

    record("conv_ceiling", **out)


if __name__ == "__main__":
    main()
