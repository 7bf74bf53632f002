"""int8 serving mode (``io/quant.py``): quantization math, calibration
capture, and end-to-end sampler drift bounds.

Not a reference feature — this is TPU-native serving depth on top of the
σ-folded deployment path; the tests pin the machinery exactly (the int8
conv path must equal the explicit quantize→conv→dequant reference
bit-for-bit, since both run the same int arithmetic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.io.quant import (
    _quantize_kernel,
    calibrate_conv_scales,
    quantize_variables,
)
from ic_gan_tpu.models.layers import SNConv
from ic_gan_tpu.ops.resample import (
    conv3x3_nearest_up,
    conv3x3_nearest_up_q,
    polyphase_up_kernels,
)


def _quant_x(x, sx):
    return np.clip(np.round(np.asarray(x, np.float32) / sx), -127, 127
                   ).astype(np.int8)


def test_quantize_kernel_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    q, s = _quantize_kernel(w)
    assert q.dtype == jnp.int8 and s.shape == (16,)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(deq - np.asarray(w)).max(axis=(0, 1, 2))
    # Per-channel absmax scaling: error bounded by half a quantum.
    assert (err <= np.asarray(s) * 0.5 + 1e-7).all()
    # The largest-magnitude tap per channel hits ±127 exactly.
    assert (np.abs(np.asarray(q)).max(axis=(0, 1, 2)) == 127).all()


def test_snconv_quant_branch_matches_reference():
    """SNConv with a quant collection == explicit quantize→conv→dequant."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    mod = SNConv(10, kernel_size=(3, 3))
    variables = mod.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    w = params["kernel"]
    qk, ws = _quantize_kernel(w)
    sx = float(jnp.max(jnp.abs(x))) / 127.0
    qvars = {
        "params": params,
        "quant": {"act_scale": jnp.float32(sx), "qkernel": qk, "wscale": ws},
    }
    got = mod.apply(qvars, x)

    xq = _quant_x(x, sx)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(qk, jnp.float32),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) * (ws * sx) + params["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_nearest_up_q_matches_dequantized_kernels():
    """The int8 polyphase up-conv equals running conv3x3_nearest_up's exact
    per-phase math with the dequantized int kernels (int32 accumulation of
    int8 values is exact)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 6, 6, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    phases = [_quantize_kernel(k) for k in polyphase_up_kernels(w)]
    qk = jnp.stack([q for q, _ in phases])
    ws = jnp.stack([s for _, s in phases])
    sx = float(jnp.max(jnp.abs(x))) / 127.0
    xq = jnp.asarray(_quant_x(x, sx))
    got = conv3x3_nearest_up_q(xq, qk, ws * sx, jnp.float32)

    # Reference: f32 conv3x3_nearest_up cannot be used directly (its phase
    # kernels differ from the quantized ones); dequantize each phase kernel
    # and interleave via the public op on a per-phase equivalent: run the
    # int path in f32 manually.
    from ic_gan_tpu.ops.resample import _PHASE_OFFSETS, _interleave_phases

    ref_phases = []
    for i, (di, dj) in enumerate(_PHASE_OFFSETS):
        y = jax.lax.conv_general_dilated(
            jnp.asarray(xq, jnp.float32), jnp.asarray(qk[i], jnp.float32),
            (1, 1), ((1 - di, di), (1 - dj, dj)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) * (ws[i] * sx)
        ref_phases.append(y)
    ref = _interleave_phases(ref_phases, xq.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # And it approximates the unquantized op (sanity on the scheme itself).
    exact = conv3x3_nearest_up(x, w)
    rel = float(jnp.abs(got - exact).mean() / jnp.abs(exact).mean())
    assert rel < 0.02, rel


def _tiny_gen():
    from ic_gan_tpu.models.biggan import BigGANConfig, Generator

    cfg = BigGANConfig(resolution=32, G_ch=8, G_attn="16", dim_z=12,
                       shared_dim_feat=16, instance_sz=24)
    g = Generator(cfg)
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(4, cfg.effective_dim_z), jnp.float32)
    f = jnp.asarray(rng.randn(4, cfg.instance_sz), jnp.float32)
    variables = g.init(jax.random.PRNGKey(0), z, None, f)
    return g, variables, z, f


def test_calibration_covers_every_g_conv():
    g, variables, z, f = _tiny_gen()
    from ic_gan_tpu.io.deploy import fold_spectral_norm

    folded = fold_spectral_norm(variables)
    scales = calibrate_conv_scales(g, folded, z, None, f, train=False)
    names = {path[-1] for path in scales}
    assert {"conv1", "conv2", "conv_sc", "theta", "phi", "g", "o"} <= names
    assert all(a > 0 for a, _, _ in scales.values())
    assert all(not down for _, _, down in scales.values())
    # up2x recorded correctly: every GBlock conv1 is an up-conv here.
    for path, (_, up2x, _) in scales.items():
        assert up2x == (path[-1] == "conv1"), path


def test_quantized_sampler_end_to_end():
    from ic_gan_tpu.io.deploy import make_sampler

    g, variables, z, f = _tiny_gen()
    qv = quantize_variables(g, variables, z, None, f, train=False)
    assert "sn" not in qv  # folded
    s_ref = make_sampler(g, variables, batch_size=4)
    s_q = make_sampler(g, qv, batch_size=4)
    a = np.asarray(s_ref(z, None, f))
    b = np.asarray(s_q(z, None, f))
    assert b.shape == a.shape and np.isfinite(b).all()
    rel = np.abs(a - b).mean() / np.abs(a).mean()
    assert 0 < rel < 0.1, rel  # quantized, but close


def test_attention_skipped_by_default():
    """skip_attention=True (default) leaves the attn block bf16 — measured
    0.88× in int8 (benchmarks/results/quant_attribution.json); False still
    quantizes it (exercising the fused int8 θ/φ/g serving branch)."""
    g, variables, z, f = _tiny_gen()

    def attn_paths(tree, path=()):
        if isinstance(tree, dict) and "qkernel" in tree:
            if any(p.startswith("attn") for p in path):
                yield path
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from attn_paths(v, path + (k,))

    qv = quantize_variables(g, variables, z, None, f, train=False)
    assert not list(attn_paths(qv["quant"]))

    qv_full = quantize_variables(g, variables, z, None, f,
                                 skip_attention=False, train=False)
    quantized = {p[-1] for p in attn_paths(qv_full["quant"])}
    assert {"theta", "phi", "g", "o"} <= quantized
    from ic_gan_tpu.io.deploy import make_sampler

    out = np.asarray(make_sampler(g, qv_full, batch_size=4)(z, None, f))
    ref = np.asarray(make_sampler(g, variables, batch_size=4)(z, None, f))
    assert np.isfinite(out).all()
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert 0 < rel < 0.1, rel


def test_cli_quantize_serving(tmp_path):
    """load_model_inference(quantize_serving=True) serves the int8 path."""
    from ic_gan_tpu.cli.inference import load_model_inference
    from ic_gan_tpu.io.checkpoint import save_checkpoint
    from ic_gan_tpu.models.biggan import (
        BigGANConfig, Discriminator, Generator,
    )
    from ic_gan_tpu.train.state import GANTrainState
    from ic_gan_tpu.train.step import TrainConfig

    mcfg = BigGANConfig(resolution=32, n_classes=2, G_ch=4, D_ch=4, dim_z=8,
                        G_attn="0", D_attn="0", shared_dim=8,
                        shared_dim_feat=8)
    g = Generator(mcfg)
    d = Discriminator(mcfg)
    z = jnp.zeros((1, mcfg.effective_dim_z))
    feats = jnp.zeros((1, 2048))
    gv = g.init(jax.random.PRNGKey(0), z, None, feats)
    dv = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), None,
                feats)
    tcfg = TrainConfig()
    state = GANTrainState.create(gv, dv, tcfg.g_optimizer(),
                                 tcfg.d_optimizer())
    save_checkpoint(str(tmp_path / "w"), "exp", state, {})

    base = {
        "resolution": 32, "n_classes": 2, "G_ch": 4, "D_ch": 4, "dim_z": 8,
        "G_attn": "0", "D_attn": "0", "shared_dim": 8, "shared_dim_feat": 8,
        "instance_cond": True, "G_shared_feat": True, "hier": True,
        "experiment_name": "exp", "weights_root": str(tmp_path / "w"),
        "load_weights": "", "batch_size": 4,
    }
    fn_q, _ = load_model_inference(dict(base, quantize_serving=True))
    assert "quant" in fn_q.variables
    fn, _ = load_model_inference(dict(base))
    assert "quant" not in fn.variables
    rng = np.random.RandomState(0)
    zb = rng.randn(4, mcfg.effective_dim_z).astype(np.float32)
    fb = rng.randn(4, 2048).astype(np.float32)
    a = np.asarray(fn(zb, None, fb))
    b = np.asarray(fn_q(zb, None, fb))
    assert np.isfinite(b).all()
    rel = np.abs(a - b).mean() / np.abs(a).mean()
    assert 0 < rel < 0.1, rel


# ---------------------------------------------------------------------------
# StyleGAN2 int8 serving (quantize_stylegan2_variables)
# ---------------------------------------------------------------------------


def _tiny_sg2():
    from ic_gan_tpu.models.stylegan2 import StyleGAN2Config, Generator

    cfg = StyleGAN2Config(
        img_resolution=32, w_dim=64, z_dim=48, h_dim=24, c_dim=0,
        channel_base=4096, channel_max=64, num_mapping_layers=2,
    )
    g = Generator(cfg)
    rng = np.random.RandomState(7)
    z = jnp.asarray(rng.randn(4, cfg.z_dim), jnp.float32)
    h = jnp.asarray(rng.randn(4, cfg.h_dim), jnp.float32)
    variables = g.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        z, None, h, noise_mode="const",
    )
    return g, variables, z, h


def test_modulated_conv_quant_branch_matches_reference():
    """modulated_conv2d(quant=...) == explicit quantize→conv→dequant→demod
    (same int arithmetic, so equal to float tolerance)."""
    from ic_gan_tpu.models.stylegan2 import modulated_conv2d

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 10).astype(np.float32) * 0.2)
    styles = jnp.asarray(np.exp(rng.randn(2, 6)).astype(np.float32))
    xm = np.asarray(x) * np.asarray(styles)[:, None, None, :]
    sx = float(np.abs(xm).max()) / 127.0
    qk, ws = _quantize_kernel(w)
    got = modulated_conv2d(
        x, w, styles, padding=1,
        quant={"act_scale": jnp.float32(sx), "qkernel": qk, "wscale": ws},
    )
    xq = _quant_x(xm, sx)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(qk, jnp.float32),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) * (ws * sx)
    w2 = jnp.sum(jnp.square(w), axis=(0, 1))
    d = jax.lax.rsqrt(jnp.square(styles) @ w2 + 1e-8)
    ref = y * d[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # And it approximates the float modulated conv.
    exact = modulated_conv2d(x, w, styles, padding=1)
    rel = float(jnp.abs(got - exact).mean() / jnp.abs(exact).mean())
    assert rel < 0.05, rel


def test_sg2_up2_quant_matches_float_polyphase():
    """The up=2 composite-polyphase int8 path approximates the float up=2
    modulated conv (which itself runs _conv_up2_polyphase), and the phase
    kernels are built from the same composed kernel."""
    from ic_gan_tpu.models.stylegan2 import modulated_conv2d
    from ic_gan_tpu.ops.conv_resample import _compose_kernel
    from ic_gan_tpu.ops.resample import setup_filter

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 8).astype(np.float32) * 0.2)
    styles = jnp.asarray(np.exp(0.3 * rng.randn(2, 6)).astype(np.float32))
    f = jnp.asarray(setup_filter(jnp.asarray([1.0, 3.0, 3.0, 1.0])))

    exact = modulated_conv2d(
        x, w, styles, up=2, padding=1, resample_filter=f, flip_weight=False,
    )

    f2d = jnp.outer(f, f) * 4.0
    K = _compose_kernel(jnp.flip(w, axis=(0, 1)), f2d)
    qs = [_quantize_kernel(K[(3 - a) % 2::2, (3 - b) % 2::2])
          for a in (0, 1) for b in (0, 1)]
    qk = jnp.concatenate([q for q, _ in qs], axis=-1)
    ws = jnp.stack([s for _, s in qs])
    xm = np.asarray(x) * np.asarray(styles)[:, None, None, :]
    sx = float(np.abs(xm).max()) / 127.0
    got = modulated_conv2d(
        x, w, styles, up=2, padding=1, resample_filter=f, flip_weight=False,
        quant={"act_scale": jnp.float32(sx), "qkernel": qk, "wscale": ws},
    )
    assert got.shape == exact.shape == (2, 16, 16, 8)
    rel = float(jnp.abs(got - exact).mean() / jnp.abs(exact).mean())
    assert rel < 0.05, rel


def test_sg2_quantized_generator_end_to_end():
    g, variables, z, h = _tiny_sg2()
    from ic_gan_tpu.io.quant import quantize_stylegan2_variables

    ref = g.apply(variables, z, None, h, noise_mode="const")
    qv = quantize_stylegan2_variables(g, variables, z, None, h,
                                      noise_mode="const")
    leaves = jax.tree_util.tree_leaves_with_path(qv["quant"])
    paths = {jax.tree_util.keystr(p) for p, _ in leaves}
    # Every synthesis conv quantized; ToRGB never is (FLOP-negligible,
    # drift-only — see models/stylegan2.py ToRGB).
    assert any("conv0" in p or "conv1" in p for p in paths)
    assert not any("torgb" in p for p in paths)
    out = g.apply(qv, z, None, h, noise_mode="const")
    assert np.isfinite(np.asarray(out)).all()
    rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
    assert 0 < rel < 0.1, rel
    # Dropping the quant collection restores the float path bit-exactly.
    no_q = {k: v for k, v in qv.items() if k != "quant"}
    np.testing.assert_array_equal(
        np.asarray(g.apply(no_q, z, None, h, noise_mode="const")),
        np.asarray(ref))


def test_sg2_cli_quantize_serving(tmp_path):
    """load_model_inference(backbone=stylegan2, quantize_serving=True)."""
    import pickle

    from test_tf_legacy_import import _make_tf_generator, _make_tf_discriminator

    from ic_gan_tpu.cli.inference import load_model_inference

    rng = np.random.RandomState(0)
    pkl = tmp_path / "net.pkl"
    with open(pkl, "wb") as f:
        pickle.dump((_make_tf_generator(rng), _make_tf_discriminator(rng),
                     _make_tf_generator(np.random.RandomState(1))), f)
    base = {"backbone": "stylegan2", "network_pkl": str(pkl),
            "batch_size": 4}
    fn_q, mcfg = load_model_inference(dict(base, quantize_serving=True))
    assert "quant" in fn_q.variables
    # The quality knob threads through the CLI to the marker leaf.
    fn_dyn, _ = load_model_inference(
        dict(base, quantize_serving=True, quantize_dynamic=True))
    from flax.traverse_util import flatten_dict

    assert any(p[-1] == "act_dynamic"
               for p in flatten_dict(fn_dyn.variables["quant"]))
    assert not any(p[-1] == "act_dynamic"
                   for p in flatten_dict(fn_q.variables["quant"]))
    fn, _ = load_model_inference(dict(base))
    zb = np.random.RandomState(0).randn(4, mcfg.z_dim).astype(np.float32)
    a = np.asarray(fn(zb))
    b = np.asarray(fn_q(zb))
    assert np.isfinite(b).all() and a.shape == b.shape
    rel = np.abs(a - b).mean() / np.abs(a).mean()
    assert 0 < rel < 0.15, rel


def test_float_path_unaffected():
    """Dropping the quant collection must give back the float deploy path
    bit-identically (the branch keys on collection presence), and that path
    must match the un-folded eval apply to float tolerance."""
    from ic_gan_tpu.io.deploy import fold_spectral_norm

    g, variables, z, f = _tiny_gen()
    qv = quantize_variables(g, variables, z, None, f, train=False)
    no_q = {k: v for k, v in qv.items() if k != "quant"}
    folded = fold_spectral_norm(variables)
    out_folded = g.apply(folded, z, None, f, train=False)
    out_no_q = g.apply(no_q, z, None, f, train=False)
    np.testing.assert_array_equal(np.asarray(out_folded),
                                  np.asarray(out_no_q))
    out_eval = g.apply(variables, z, None, f, train=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_no_q),
                               rtol=1e-4, atol=1e-5)


# --- BigGAN-deep int8 serving -------------------------------------------------


def _tiny_deep():
    from ic_gan_tpu.models.biggan_deep import BigGANDeepConfig
    from ic_gan_tpu.models.biggan_deep import Generator as DeepGenerator

    # res 64: in_channels > out_channels in the upper blocks, so the
    # channel-drop shortcut (ref BigGANdeep.py:73-74) is live under quant.
    cfg = BigGANDeepConfig(
        resolution=64, n_classes=10, G_ch=4, dim_z=12, G_attn="0",
        G_depth=2, shared_dim=16, shared_dim_feat=16, instance_sz=24,
        class_cond=False, instance_cond=True,
    )
    g = DeepGenerator(cfg)
    rng = np.random.RandomState(7)
    z = jnp.asarray(rng.randn(4, cfg.effective_dim_z), jnp.float32)
    f = jnp.asarray(rng.randn(4, cfg.instance_sz), jnp.float32)
    variables = jax.jit(
        lambda: g.init(jax.random.PRNGKey(0), z, None, f))()
    return g, variables, z, f


def test_deep_calibration_covers_bottleneck_convs():
    """Every conv of the 4-conv bottleneck (conv1 1×1, conv2 3×3-up,
    conv3 3×3, conv4 1×1 — ref BigGANdeep.py:33-84) gets a calibration
    record, and only conv2 carries the polyphase up2x flag."""
    from ic_gan_tpu.io.deploy import fold_spectral_norm

    g, variables, z, f = _tiny_deep()
    folded = fold_spectral_norm(variables)
    scales = calibrate_conv_scales(g, folded, z, None, f, train=False)
    names = {path[-1] for path in scales}
    assert {"conv1", "conv2", "conv3", "conv4"} <= names
    assert all(a > 0 for a, _, _ in scales.values())
    ups = 0
    for path, (_, up2x, down) in scales.items():
        assert not down, path
        if up2x:
            # only an upsampling block's conv2 carries the polyphase flag
            # (non-upsample blocks in the G_depth stack also have a conv2).
            assert path[-1] == "conv2", path
            ups += 1
    assert ups > 0


def test_deep_quantized_sampler_end_to_end():
    from ic_gan_tpu.io.deploy import make_sampler

    g, variables, z, f = _tiny_deep()
    qv = quantize_variables(g, variables, z, None, f, train=False)
    assert "sn" not in qv  # folded
    # The 1×1 bottleneck kernels really are int8 in the quant collection.
    from flax.traverse_util import flatten_dict

    qflat = flatten_dict(qv["quant"])
    one_by_one = [p for p in qflat
                  if p[-1] == "qkernel" and qflat[p].ndim == 4
                  and qflat[p].shape[:2] == (1, 1)]
    assert one_by_one, "no quantized 1x1 bottleneck kernels found"
    assert all(qflat[p].dtype == jnp.int8 for p in one_by_one)

    s_ref = make_sampler(g, variables, batch_size=4)
    s_q = make_sampler(g, qv, batch_size=4)
    a = np.asarray(s_ref(z, None, f))
    b = np.asarray(s_q(z, None, f))
    assert b.shape == a.shape and np.isfinite(b).all()
    rel = np.abs(a - b).mean() / np.abs(a).mean()
    assert 0 < rel < 0.1, rel  # quantized, but close


def test_sg2_per_channel_act_scales_beat_per_tensor():
    """Per-input-channel activation scales (default) must cut the SG2
    quantization drift vs the per-tensor scheme on the same generator —
    per-sample style modulation makes per-tensor absmax collapse most
    channels onto a few int8 levels (the r4 7.1% image-drift finding)."""
    from ic_gan_tpu.io.deploy import make_sampler
    from ic_gan_tpu.io.quant import quantize_stylegan2_variables

    g, variables, z, h = _tiny_sg2()
    qv_pc = quantize_stylegan2_variables(
        g, variables, z, None, h, noise_mode="const")
    qv_pt = quantize_stylegan2_variables(
        g, variables, z, None, h, noise_mode="const", per_channel_act=False)
    # Per-channel trees carry vector act scales; per-tensor scalar ones.
    from flax.traverse_util import flatten_dict

    pc_scales = [v for p, v in flatten_dict(qv_pc["quant"]).items()
                 if p[-1] == "act_scale"]
    pt_scales = [v for p, v in flatten_dict(qv_pt["quant"]).items()
                 if p[-1] == "act_scale"]
    assert pc_scales and all(s.ndim == 1 for s in pc_scales)
    assert pt_scales and all(s.ndim == 0 for s in pt_scales)

    ref = np.asarray(make_sampler(g, variables, batch_size=4,
                                  noise_mode="const")(z, None, h))
    out_pc = np.asarray(make_sampler(g, qv_pc, batch_size=4,
                                     noise_mode="const")(z, None, h))
    out_pt = np.asarray(make_sampler(g, qv_pt, batch_size=4,
                                     noise_mode="const")(z, None, h))
    d_pc = np.abs(out_pc - ref).mean() / np.abs(ref).mean()
    d_pt = np.abs(out_pt - ref).mean() / np.abs(ref).mean()
    assert np.isfinite(out_pc).all()
    assert d_pc < d_pt, (d_pc, d_pt)
    assert d_pc < 0.03, d_pc


def test_sg2_dynamic_act_scale_matches_algebra_and_cuts_drift():
    """Per-sample dynamic range adaptation (``act_dynamic``, default on):
    (a) the serving branch equals the explicit quantize→conv→dequant algebra
    with the per-sample boost g_n = 127/max|x_n/a| applied and undone, and
    (b) it strictly cuts drift vs the static per-channel scheme on the tiny
    generator (the static absmax covers only the hottest calibration
    sample)."""
    from ic_gan_tpu.io.deploy import make_sampler
    from ic_gan_tpu.io.quant import quantize_stylegan2_variables
    from ic_gan_tpu.models.stylegan2 import modulated_conv2d

    # (a) algebra on one layer, per-tensor scale for clarity.
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(3, 8, 8, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 10).astype(np.float32) * 0.2)
    styles = jnp.asarray(np.exp(rng.randn(3, 6)).astype(np.float32))
    xm = np.asarray(x) * np.asarray(styles)[:, None, None, :]
    sx = float(np.abs(xm).max()) / 127.0 * 2.0  # loose scale: boost must act
    qk, ws = _quantize_kernel(w)
    got = modulated_conv2d(
        x, w, styles, padding=1,
        quant={"act_scale": jnp.float32(sx), "qkernel": qk, "wscale": ws,
               "act_dynamic": jnp.int8(1)},
    )
    xs = xm / sx
    t = np.maximum(np.abs(xs).max(axis=(1, 2, 3), keepdims=True), 1e-30)
    xq = np.clip(np.round(xs * (127.0 / t)), -127, 127)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(qk, jnp.float32),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) * (ws * sx) * jnp.asarray(t / 127.0, jnp.float32)
    w2 = jnp.sum(jnp.square(w), axis=(0, 1))
    d = jax.lax.rsqrt(jnp.square(styles) @ w2 + 1e-8)
    ref = y * d[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # (b) drift: dynamic (opt-in) ≤ static per-channel (the default — the
    # dynamic reduce-max pass costs ~13% e2e throughput, quant_sg2.json) on
    # unseen samples.
    g, variables, z, h = _tiny_sg2()
    qv_dyn = quantize_stylegan2_variables(
        g, variables, z, None, h, noise_mode="const", act_dynamic=True)
    qv_static = quantize_stylegan2_variables(
        g, variables, z, None, h, noise_mode="const")
    from flax.traverse_util import flatten_dict

    assert any(p[-1] == "act_dynamic"
               for p in flatten_dict(qv_dyn["quant"]))
    assert not any(p[-1] == "act_dynamic"
                   for p in flatten_dict(qv_static["quant"]))
    # Fresh (non-calibration) stream: dynamic scaling is what adapts.
    rng2 = np.random.RandomState(77)
    z2 = jnp.asarray(rng2.randn(*np.asarray(z).shape).astype(np.float32))
    h2 = jnp.asarray(rng2.randn(*np.asarray(h).shape).astype(np.float32))
    ref_img = np.asarray(make_sampler(g, variables, batch_size=4,
                                      noise_mode="const")(z2, None, h2))
    out_dyn = np.asarray(make_sampler(g, qv_dyn, batch_size=4,
                                      noise_mode="const")(z2, None, h2))
    out_sta = np.asarray(make_sampler(g, qv_static, batch_size=4,
                                      noise_mode="const")(z2, None, h2))
    d_dyn = np.abs(out_dyn - ref_img).mean() / np.abs(ref_img).mean()
    d_sta = np.abs(out_sta - ref_img).mean() / np.abs(ref_img).mean()
    assert np.isfinite(out_dyn).all()
    assert d_dyn < d_sta, (d_dyn, d_sta)


def test_attention_fused_qkv_matches_per_conv():
    """Deployment-mode θ/φ/g fusion (one 1×1 conv, models/layers.py
    _fused_qkv) must equal the three per-conv projections exactly — same
    params, same math — in both float and int8 serving modes."""
    from ic_gan_tpu.io.deploy import fold_spectral_norm
    from ic_gan_tpu.models import layers as L

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    mod = L.SelfAttention(16)
    variables = mod.init(jax.random.PRNGKey(0), x)
    folded = fold_spectral_norm(variables)

    out_fused = mod.apply(folded, x)
    try:
        L._ATTN_FUSION[0] = False
        out_ref = mod.apply(folded, x)
    finally:
        L._ATTN_FUSION[0] = True
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)

    # int8 serving mode: fused consumption of the per-conv quant records.
    qv = quantize_variables(mod, variables, x)
    sxs = [np.asarray(qv["quant"][n]["act_scale"]) for n in
           ("theta", "phi", "g")]
    assert sxs[0] == sxs[1] == sxs[2]  # one input -> one activation scale
    out_qf = mod.apply(qv, x)
    try:
        L._ATTN_FUSION[0] = False
        out_qr = mod.apply(qv, x)
    finally:
        L._ATTN_FUSION[0] = True
    np.testing.assert_allclose(np.asarray(out_qf), np.asarray(out_qr),
                               rtol=1e-5, atol=1e-6)
