"""BigGAN-deep G-forward: is 17 TFLOP/s intrinsic to the bottleneck
geometry, or rewritable?

r4 measured the deep train step beating its own parts (1.19×,
results/train_conv_mix_deep.json) but the G-forward blocks aggregate
~17 TFLOP/s standalone and no rewrite attempt was recorded.  This bench
adjudicates per block at the mb128/128² ch96 training geometry
(ref ``BigGANdeep.py:33-130`` block structure):

  1. the block forward as shipped (CBN→ReLU→conv1 1×1→…→conv4 1×1 + skip);
  2. Σ of its BARE convs at the same shapes — the block's per-geometry op
     ceiling (what the MXU sustains with zero normalization/activation
     overhead; the bottleneck's hidden = in/4 channels are 48-384 wide, so
     thin stages are lane-starved by construction);
  3. a measured exact rewrite: the two 1×1 convs expressed as token
     matmuls (reshape to (N·H·W, C) @ W — the "fold 1×1s into matmuls"
     candidate; if XLA already lowers 1×1 convs this way the delta is ~0).

If (1) ≈ (2) and (3) is a wash, the aggregate is the geometry's ceiling and
the README claim earns its wording; any gap is actionable headroom.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_deep_gfwd.py
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

MB = 128
RES = 128
CH = 96


def _time_fn(fn, args, iters=8):
    def many(x, *rest):
        def body(c, _):
            out = fn(x * (1.0 + c.astype(x.dtype)), *rest)
            return jnp.sum(out.astype(jnp.float32)) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    compiled = jax.jit(many).lower(*args).compile()
    flops = compiled.cost_analysis()["flops"]
    float(np.asarray(compiled(*args)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(compiled(*args)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, flops


def main():
    from ic_gan_tpu.models.biggan import g_arch
    from ic_gan_tpu.models.biggan_deep import DeepGBlock

    arch = g_arch(RES, CH)
    y_dim = 128 + 16  # shared embed + feat embed order of magnitude
    rng = np.random.RandomState(0)
    out = {"microbatch": MB, "resolution": RES, "ch": CH}
    rows = []
    tot_block = tot_ceiling = 0.0

    for i, (cin, cout, res) in enumerate(
        zip(arch["in_channels"], arch["out_channels"], arch["resolution"])
    ):
        in_res = res // 2 if arch["upsample"][i] else res
        for gi in range(2):  # G_depth = 2
            upsample = arch["upsample"][i] and gi == 1
            ofeat = cin if gi == 0 else cout
            hidden = cin // 4
            mod = DeepGBlock(in_features=cin, out_features=ofeat,
                             upsample=upsample, dtype=jnp.bfloat16)
            x = jnp.asarray(rng.randn(MB, in_res, in_res, cin), jnp.bfloat16)
            y = jnp.asarray(rng.randn(MB, y_dim), jnp.float32)
            variables = jax.jit(lambda m=mod, xx=x, yy=y: m.init(
                jax.random.PRNGKey(0), xx, yy, train=False))()
            t_blk, fl_blk = _time_fn(
                lambda xx, yy, m=mod, v=variables: m.apply(
                    v, xx, yy, train=False),
                (x, y))

            # --- bare-conv ceiling at the block's own shapes -------------
            def bare(shape_in, w_shape, up=False):
                xx = jnp.asarray(rng.randn(*shape_in), jnp.bfloat16)
                w = jnp.asarray(rng.randn(*w_shape) * 0.05, jnp.bfloat16)
                if up:
                    from ic_gan_tpu.ops.resample import conv3x3_nearest_up

                    f = lambda a, ww: conv3x3_nearest_up(a, ww)
                else:
                    f = lambda a, ww: jax.lax.conv_general_dilated(
                        a, ww, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return _time_fn(lambda a, ww=w: f(a, ww), (xx,))

            t_c = 0.0
            t1, _ = bare((MB, in_res, in_res, cin), (1, 1, cin, hidden))
            t_c += t1
            if upsample:
                t2, _ = bare((MB, in_res, in_res, hidden),
                             (3, 3, hidden, hidden), up=True)
            else:
                t2, _ = bare((MB, in_res, in_res, hidden),
                             (3, 3, hidden, hidden))
            t_c += t2
            o_res = in_res * 2 if upsample else in_res
            t3, _ = bare((MB, o_res, o_res, hidden), (3, 3, hidden, hidden))
            t_c += t3
            t4, _ = bare((MB, o_res, o_res, hidden), (1, 1, hidden, ofeat))
            t_c += t4

            # --- exact rewrite probe: 1×1 convs as token matmuls ---------
            def tok_matmul(shape_in, w_shape):
                xx = jnp.asarray(rng.randn(*shape_in), jnp.bfloat16)
                w = jnp.asarray(
                    rng.randn(w_shape[2], w_shape[3]) * 0.05, jnp.bfloat16)

                def f(a, ww=w):
                    n, h, wd, c = a.shape
                    return (a.reshape(n * h * wd, c) @ ww).reshape(
                        n, h, wd, ww.shape[1])

                return _time_fn(f, (xx,))

            tm1, _ = tok_matmul((MB, in_res, in_res, cin),
                                (1, 1, cin, hidden))
            tm4, _ = tok_matmul((MB, o_res, o_res, hidden),
                                (1, 1, hidden, ofeat))

            label = f"G.block{i}.{gi}"
            rows.append((label, t_blk, fl_blk, t_c, t1 + t4, tm1 + tm4))
            tot_block += t_blk * 1e3
            tot_ceiling += t_c * 1e3
            # Print as measured: relay compiles are slow and an end-only
            # dump leaves a partial run silent for its whole duration.
            print(f"{label:12s} block {t_blk*1e3:7.2f} ms "
                  f"({fl_blk/t_blk/1e12:5.1f} TFLOP/s)  bare-convs "
                  f"{t_c*1e3:7.2f} ms (ratio {t_blk/t_c:4.2f})  1x1conv "
                  f"{(t1+t4)*1e3:6.2f} ms vs tok-matmul "
                  f"{(tm1+tm4)*1e3:6.2f} ms", flush=True)

    for label, t_blk, fl, t_c, t_conv1x1, t_tok in rows:
        key = label.replace(".", "_")
        out[f"{key}_block_ms"] = t_blk * 1e3
        out[f"{key}_tflops"] = fl / t_blk / 1e12
        out[f"{key}_bare_ms"] = t_c * 1e3
        out[f"{key}_ratio"] = t_blk / t_c
        out[f"{key}_conv1x1_ms"] = t_conv1x1 * 1e3
        out[f"{key}_tokmm_ms"] = t_tok * 1e3

    out["blocks_ms"] = tot_block
    out["bare_ms"] = tot_ceiling
    out["blocks_vs_bare"] = tot_block / tot_ceiling
    print(f"\nΣ blocks {tot_block:.1f} ms vs Σ bare convs {tot_ceiling:.1f} "
          f"ms → ratio {tot_block/tot_ceiling:.2f}", flush=True)
    record("deep_gfwd", **out)


if __name__ == "__main__":
    main()
