"""Full-geometry checkpoint validation: the released
icgan_biggan_imagenet_res256 layout (ch96, attn64, hier z, shared_dim 128,
feat 512) must convert, validate and run BEFORE real weights ever appear.
Oracle: the reference torch Generator's state_dict at that exact geometry
(BigGAN_PyTorch/BigGAN.py; config config_files/ImageNet/IC-GAN/icgan_res256.json).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/BigGAN_PyTorch")

import jax
import jax.numpy as jnp

from ic_gan_tpu.io.deploy import fold_spectral_norm
from ic_gan_tpu.io.torch_import import (
    config_from_state_dict,
    load_generator_variables,
)
from ic_gan_tpu.models.biggan import BigGANConfig, Generator

RES256_CONFIG = dict(
    resolution=256, n_classes=1000, G_ch=96, dim_z=120, G_attn="64",
    G_shared=True, shared_dim=128, hier=True, class_cond=False,
    instance_cond=True, G_shared_feat=True, shared_dim_feat=512,
)


@pytest.fixture(scope="module")
def res256_state_dict():
    from BigGAN_PyTorch import BigGAN as ref_biggan

    g = ref_biggan.Generator(
        G_ch=96, dim_z=120, resolution=256, G_attn="64", n_classes=1000,
        G_shared=True, shared_dim=128, hier=True, class_cond=False,
        instance_cond=True, G_shared_feat=True, shared_dim_feat=512,
        skip_init=True, no_optim=True,
    )
    # Fill with small random values (skip_init leaves torch defaults; SN u
    # vectors need non-degenerate values for the fold).
    sd = {}
    rng = np.random.RandomState(0)
    for k, v in g.state_dict().items():
        if v.dtype.is_floating_point:
            # Positive small values: BN running vars feed an rsqrt and SN u
            # vectors must be non-degenerate.
            arr = np.abs(np.asarray(rng.randn(*v.shape), np.float32)) * 0.02 + 0.01
        else:
            arr = np.asarray(v)
        sd[k] = arr
    return sd


def test_res256_convert_validate_and_fold(res256_state_dict):
    cfg = BigGANConfig(**RES256_CONFIG)
    variables = load_generator_variables(res256_state_dict, cfg, validate=True)
    # Exact full-geometry spot checks against the published layout.
    p = variables["params"]
    assert p["shared_feat"]["kernel"].shape == (2048, 512)
    # hier z at res256: 7 slots -> chunk 17 (the reference trims dim_z to
    # 119 = 17*7, BigGAN.py:171-180); stem maps chunk -> 4*4*(16*96).
    arch = cfg.g_arch
    assert cfg.z_chunk_size == 17
    assert p["linear"]["kernel"].shape == (17, arch["in_channels"][0] * 16)
    # attention sits at 64x64 (block 3 output, 8*96 channels).
    attn_names = [k for k in p if k.startswith("attn_")]
    assert attn_names, "no attention block converted"
    ch_attn = arch["out_channels"][int(attn_names[0].split("_")[1])]
    assert p[attn_names[0]]["theta"]["kernel"].shape == (1, 1, ch_attn, ch_attn // 8)
    assert "conv1" in p["block_0"]
    folded = fold_spectral_norm(variables)
    assert "sn" not in folded
    # Folded kernels: spectral norm of the first conv ~<= 1 (power-iteration
    # estimate divides by sigma; randomly filled u gives an approximation,
    # so allow slack).
    k = np.asarray(folded["params"]["block_0"]["conv1"]["kernel"])
    sigma = np.linalg.svd(k.reshape(-1, k.shape[-1]), compute_uv=False)[0]
    raw = np.asarray(variables["params"]["block_0"]["conv1"]["kernel"])
    raw_sigma = np.linalg.svd(raw.reshape(-1, raw.shape[-1]),
                              compute_uv=False)[0]
    assert sigma < raw_sigma  # dividing by a positive estimate shrank it


def test_res256_config_resurrection():
    saved = dict(RES256_CONFIG)
    cfg = config_from_state_dict(saved)
    assert cfg.resolution == 256 and cfg.G_ch == 96
    assert cfg.instance_cond and not cfg.class_cond
    assert cfg.shared_dim_feat == 512 and cfg.hier
    # hier trims to a multiple of the slot count (119 = 17*7), matching
    # the reference's dim_z adjustment (BigGAN.py:175-180).
    assert cfg.effective_dim_z == 119


@pytest.mark.slow
def test_res256_forward_smoke(res256_state_dict):
    cfg = BigGANConfig(**RES256_CONFIG)
    variables = fold_spectral_norm(
        load_generator_variables(res256_state_dict, cfg, validate=True)
    )
    g = Generator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.effective_dim_z))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.instance_sz))
    img = jax.jit(lambda v, z, f: g.apply(v, z, None, f, train=False))(
        variables, z, feats
    )
    assert img.shape == (1, 256, 256, 3)
    assert np.isfinite(np.asarray(img)).all()
