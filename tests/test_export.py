"""AOT serving export: serialize the deployment sampler, rehydrate, compare.

``export_sampler`` bakes σ-folded weights into a portable ``jax.export``
StableHLO artifact; a serving process loads it without model code. The
reference has no serving artifact (pickled modules only) — this is the
TPU-native deployment story, so the contract is: bytes round-trip, outputs
bit-match the live jitted sampler.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.io.deploy import (
    export_sampler, load_exported_sampler, make_sampler,
)
from ic_gan_tpu.models.biggan import BigGANConfig, Generator


def _toy(class_cond=False):
    cfg = BigGANConfig(resolution=32, n_classes=10, G_ch=8, dim_z=20,
                       G_attn="0", shared_dim=16, shared_dim_feat=24,
                       instance_sz=32, class_cond=class_cond)
    g = Generator(cfg)
    z = jnp.zeros((4, cfg.effective_dim_z))
    feats = jnp.zeros((4, cfg.instance_sz))
    label = jnp.zeros((4,), jnp.int32) if class_cond else None
    variables = jax.jit(
        lambda: g.init(jax.random.PRNGKey(0), z, label, feats))()
    return g, variables, cfg


def test_export_roundtrip_matches_live_sampler(tmp_path):
    g, variables, cfg = _toy()
    data = export_sampler(g, variables, batch_size=4)
    assert isinstance(data, bytes) and len(data) > 1000

    path = tmp_path / "sampler.stablehlo"
    path.write_bytes(data)
    sampler = load_exported_sampler(path.read_bytes())

    rng = np.random.RandomState(0)
    z = rng.randn(4, cfg.effective_dim_z).astype(np.float32)
    feats = rng.randn(4, cfg.instance_sz).astype(np.float32)
    got = np.asarray(sampler(z, feats=feats))
    want = make_sampler(g, variables, batch_size=4)(z, None, feats)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (4, 32, 32, 3)


def test_export_class_conditional():
    g, variables, cfg = _toy(class_cond=True)
    data = export_sampler(g, variables, batch_size=2)
    sampler = load_exported_sampler(data)
    rng = np.random.RandomState(1)
    z = rng.randn(2, cfg.effective_dim_z).astype(np.float32)
    feats = rng.randn(2, cfg.instance_sz).astype(np.float32)
    label = np.asarray([1, 7], np.int32)
    got = np.asarray(sampler(z, label, feats))
    want = make_sampler(g, variables, batch_size=2)(z, label, feats)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # different labels change the output (conditioning is live in the export)
    got2 = np.asarray(sampler(z, np.asarray([3, 4], np.int32), feats))
    assert np.abs(got - got2).max() > 1e-4


def test_export_stylegan2_backbone():
    """SG2 export: noise consts baked, noise_mode=const, IC-GAN h
    conditioning live (ref networks.py:710-757 signature z, c, feats)."""
    from ic_gan_tpu.models.stylegan2 import Generator as SG2Generator
    from ic_gan_tpu.models.stylegan2 import StyleGAN2Config

    cfg = StyleGAN2Config(img_resolution=32, z_dim=16, c_dim=0, h_dim=24,
                          w_dim=16, channel_base=1024, channel_max=64,
                          num_mapping_layers=2, num_fp16_res=0)
    g = SG2Generator(cfg)
    z = jnp.zeros((2, cfg.z_dim))
    feats = jnp.zeros((2, cfg.h_dim))
    variables = jax.jit(
        lambda: g.init(jax.random.PRNGKey(0), z, None, feats))()

    data = export_sampler(g, variables, batch_size=2, noise_mode="const")
    assert isinstance(data, bytes) and len(data) > 1000
    sampler = load_exported_sampler(data)

    rng = np.random.RandomState(2)
    z = rng.randn(2, cfg.z_dim).astype(np.float32)
    feats = rng.randn(2, cfg.h_dim).astype(np.float32)
    got = np.asarray(sampler(z, feats=feats))
    want = make_sampler(g, variables, batch_size=2, noise_mode="const")(
        z, None, feats)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (2, 32, 32, 3)
    # conditioning is live in the export
    got2 = np.asarray(sampler(z, feats=feats + 1.0))
    assert np.abs(got - got2).max() > 1e-4


def test_export_biggan_deep_backbone():
    """BigGAN-deep export: bottleneck blocks + channel-drop shortcut
    (BigGANdeep.py:67-84) must survive the σ-fold + constant-baking path
    bit-for-bit like the base model (res 64 so the shortcut fires)."""
    from ic_gan_tpu.models.biggan_deep import BigGANDeepConfig
    from ic_gan_tpu.models.biggan_deep import Generator as DeepGenerator

    cfg = BigGANDeepConfig(
        resolution=64, n_classes=10, G_ch=4, dim_z=16, G_attn="0",
        G_depth=2, shared_dim=16, shared_dim_feat=24, instance_sz=32,
        class_cond=True, instance_cond=True,
    )
    g = DeepGenerator(cfg)
    z0 = jnp.zeros((2, cfg.effective_dim_z))
    f0 = jnp.zeros((2, cfg.instance_sz))
    l0 = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(
        lambda: g.init(jax.random.PRNGKey(0), z0, l0, f0))()

    data = export_sampler(g, variables, batch_size=2)
    sampler = load_exported_sampler(data)

    rng = np.random.RandomState(3)
    z = rng.randn(2, cfg.effective_dim_z).astype(np.float32)
    feats = rng.randn(2, cfg.instance_sz).astype(np.float32)
    label = np.asarray([2, 8], np.int32)
    got = np.asarray(sampler(z, label, feats))
    want = make_sampler(g, variables, batch_size=2)(z, label, feats)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (2, 64, 64, 3)


def test_export_quantized_biggan():
    """int8 serving and AOT export compose: a quantized variables tree
    (int8 kernels + f32 scales in the ``quant`` collection) rides the
    StableHLO artifact and the exported sampler bit-matches the live
    quantized apply. No upstream equivalent — this is the framework's own
    serving story."""
    from ic_gan_tpu.io.quant import quantize_variables

    g, variables, cfg = _toy()
    rng = np.random.RandomState(4)
    zc = jnp.asarray(rng.randn(4, cfg.effective_dim_z), jnp.float32)
    fc = jnp.asarray(rng.randn(4, cfg.instance_sz), jnp.float32)
    qv = quantize_variables(g, variables, zc, None, fc, train=False)
    assert "quant" in qv and "sn" not in qv

    data = export_sampler(g, qv, batch_size=4)
    sampler = load_exported_sampler(data)

    z = rng.randn(4, cfg.effective_dim_z).astype(np.float32)
    feats = rng.randn(4, cfg.instance_sz).astype(np.float32)
    got = np.asarray(sampler(z, feats=feats))
    want = make_sampler(g, qv, batch_size=4)(z, None, feats)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # And the artifact really serves the int8 path, not a silent float
    # fallback: it must differ from the unquantized export.
    plain = np.asarray(
        load_exported_sampler(export_sampler(g, variables, batch_size=4))(
            z, feats=feats))
    assert np.abs(got - plain).max() > 1e-4


def test_export_quantized_stylegan2():
    """Same compose contract for the SG2 backbone (per-layer-per-channel
    modulated-conv quantization, io/quant.py:quantize_stylegan2_variables)."""
    from ic_gan_tpu.io.quant import quantize_stylegan2_variables
    from ic_gan_tpu.models.stylegan2 import Generator as SG2Generator
    from ic_gan_tpu.models.stylegan2 import StyleGAN2Config

    cfg = StyleGAN2Config(img_resolution=32, z_dim=16, c_dim=0, h_dim=24,
                          w_dim=16, channel_base=1024, channel_max=64,
                          num_mapping_layers=2, num_fp16_res=0)
    g = SG2Generator(cfg)
    z0 = jnp.zeros((2, cfg.z_dim))
    f0 = jnp.zeros((2, cfg.h_dim))
    variables = jax.jit(
        lambda: g.init(jax.random.PRNGKey(0), z0, None, f0))()

    rng = np.random.RandomState(5)
    zc = jnp.asarray(rng.randn(2, cfg.z_dim), jnp.float32)
    fc = jnp.asarray(rng.randn(2, cfg.h_dim), jnp.float32)
    qv = quantize_stylegan2_variables(g, variables, zc, None, fc,
                                      noise_mode="const")
    assert "quant" in qv

    data = export_sampler(g, qv, batch_size=2, noise_mode="const")
    sampler = load_exported_sampler(data)
    z = rng.randn(2, cfg.z_dim).astype(np.float32)
    feats = rng.randn(2, cfg.h_dim).astype(np.float32)
    got = np.asarray(sampler(z, feats=feats))
    want = make_sampler(g, qv, batch_size=2, noise_mode="const")(
        z, None, feats)
    np.testing.assert_allclose(got, want, atol=1e-5)
