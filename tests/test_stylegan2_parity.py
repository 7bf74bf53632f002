"""StyleGAN2-ADA parity vs the reference PyTorch implementation (oracle).

Covers the modulated conv path, mapping network with the IC-GAN instance (h)
branch, skip/resnet synthesis, ToRGB accumulation, minibatch-std, and the
conditioning-projection epilogue.  noise_mode='const' for determinism.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/stylegan2_ada_pytorch")

import jax
import jax.numpy as jnp

from ic_gan_tpu.models import stylegan2 as sg2
from ic_gan_tpu.io.stylegan_import import convert_state_dict


def _ref_networks():
    from training import networks

    return networks


CFG = dict(
    img_resolution=32,
    img_channels=3,
    z_dim=16,
    c_dim=0,
    h_dim=24,
    w_dim=32,
    channel_base=1024,
    channel_max=64,
    num_fp16_res=0,
    conv_clamp=None,
    num_mapping_layers=2,
)


def _randomize(module, seed=0):
    gen = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        # resample_filter buffers are structural constants, not weights —
        # randomizing them would diverge from the canonical [1,3,3,1] filter
        # our implementation reconstructs.
        if v.dtype.is_floating_point and not k.endswith("resample_filter"):
            sd[k] = torch.randn(v.shape, generator=gen) * 0.1
    module.load_state_dict(sd)


def make_ref_G(**overrides):
    nets = _ref_networks()
    cfg = dict(CFG, **overrides)
    return nets.Generator(
        z_dim=cfg["z_dim"],
        c_dim=cfg["c_dim"],
        h_dim=cfg["h_dim"],
        w_dim=cfg["w_dim"],
        img_resolution=cfg["img_resolution"],
        img_channels=cfg["img_channels"],
        mapping_kwargs=dict(num_layers=cfg["num_mapping_layers"]),
        synthesis_kwargs=dict(
            channel_base=cfg["channel_base"],
            channel_max=cfg["channel_max"],
            num_fp16_res=cfg["num_fp16_res"],
            conv_clamp=cfg["conv_clamp"],
        ),
    )


def make_ref_D(**overrides):
    nets = _ref_networks()
    cfg = dict(CFG, **overrides)
    return nets.Discriminator(
        c_dim=cfg["c_dim"],
        h_dim=cfg["h_dim"],
        img_resolution=cfg["img_resolution"],
        img_channels=cfg["img_channels"],
        channel_base=cfg["channel_base"],
        channel_max=cfg["channel_max"],
        num_fp16_res=cfg["num_fp16_res"],
        conv_clamp=cfg["conv_clamp"],
        mapping_kwargs=dict(num_layers=cfg["num_mapping_layers"]),
    )


def our_cfg(**overrides):
    cfg = dict(CFG, **overrides)
    return sg2.StyleGAN2Config(
        img_resolution=cfg["img_resolution"],
        img_channels=cfg["img_channels"],
        z_dim=cfg["z_dim"],
        c_dim=cfg["c_dim"],
        h_dim=cfg["h_dim"],
        w_dim=cfg["w_dim"],
        channel_base=cfg["channel_base"],
        channel_max=cfg["channel_max"],
        num_fp16_res=cfg["num_fp16_res"],
        conv_clamp=cfg["conv_clamp"],
        num_mapping_layers=cfg["num_mapping_layers"],
    )


def test_generator_matches_reference():
    tg = make_ref_G()
    _randomize(tg)
    tg.eval()

    rng = np.random.RandomState(0)
    z = rng.randn(2, CFG["z_dim"]).astype(np.float32)
    h = rng.randn(2, CFG["h_dim"]).astype(np.float32)

    with torch.no_grad():
        ref_out = tg(
            torch.from_numpy(z), None, torch.from_numpy(h), noise_mode="const"
        ).numpy()

    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    variables = convert_state_dict(sd)
    g = sg2.Generator(our_cfg())
    out = g.apply(
        variables, jnp.asarray(z), None, jnp.asarray(h), noise_mode="const",
    )
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)


def test_generator_truncation_matches():
    tg = make_ref_G()
    _randomize(tg, 1)
    # Give w_avg a nonzero value so truncation actually does something.
    with torch.no_grad():
        tg.mapping.w_avg.copy_(torch.randn(CFG["w_dim"]) * 0.3)
    tg.eval()

    rng = np.random.RandomState(1)
    z = rng.randn(2, CFG["z_dim"]).astype(np.float32)
    h = rng.randn(2, CFG["h_dim"]).astype(np.float32)
    with torch.no_grad():
        ref_out = tg(
            torch.from_numpy(z), None, torch.from_numpy(h),
            truncation_psi=0.5, noise_mode="const",
        ).numpy()

    variables = convert_state_dict({k: v.numpy() for k, v in tg.state_dict().items()})
    g = sg2.Generator(our_cfg())
    out = g.apply(
        variables, jnp.asarray(z), None, jnp.asarray(h),
        truncation_psi=0.5, noise_mode="const",
    )
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)


def test_discriminator_matches_reference():
    td = make_ref_D()
    _randomize(td, 2)
    td.eval()

    rng = np.random.RandomState(2)
    img = rng.randn(4, 3, 32, 32).astype(np.float32) * 0.5
    h = rng.randn(4, CFG["h_dim"]).astype(np.float32)
    with torch.no_grad():
        ref_out = td(torch.from_numpy(img), None, torch.from_numpy(h)).numpy()

    variables = convert_state_dict({k: v.numpy() for k, v in td.state_dict().items()})
    d = sg2.Discriminator(our_cfg())
    out = d.apply(
        variables, jnp.asarray(np.transpose(img, (0, 2, 3, 1))), None,
        jnp.asarray(h),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-4, rtol=1e-3)


def test_class_and_instance_conditioning_matches():
    # cc_icgan-style: one-hot class + instance features.
    td = make_ref_D(c_dim=5)
    _randomize(td, 3)
    td.eval()
    tg = make_ref_G(c_dim=5)
    _randomize(tg, 4)
    tg.eval()

    rng = np.random.RandomState(3)
    z = rng.randn(2, CFG["z_dim"]).astype(np.float32)
    h = rng.randn(2, CFG["h_dim"]).astype(np.float32)
    c = np.eye(5, dtype=np.float32)[[1, 3]]
    img = rng.randn(2, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        ref_g = tg(
            torch.from_numpy(z), torch.from_numpy(c), torch.from_numpy(h),
            noise_mode="const",
        ).numpy()
        ref_d = td(
            torch.from_numpy(img), torch.from_numpy(c), torch.from_numpy(h)
        ).numpy()

    gv = convert_state_dict({k: v.numpy() for k, v in tg.state_dict().items()})
    dv = convert_state_dict({k: v.numpy() for k, v in td.state_dict().items()})
    g = sg2.Generator(our_cfg(c_dim=5))
    d = sg2.Discriminator(our_cfg(c_dim=5))
    out_g = g.apply(gv, jnp.asarray(z), jnp.asarray(c), jnp.asarray(h),
                    noise_mode="const")
    out_d = d.apply(dv, jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                    jnp.asarray(c), jnp.asarray(h))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_g), (0, 3, 1, 2)), ref_g, atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(out_d), ref_d, atol=5e-4, rtol=1e-3)


def test_our_init_structure_matches_converted():
    # Our own init must produce the same tree structure/shapes the converter
    # emits (so converted checkpoints slot into training/eval unchanged).
    from flax.traverse_util import flatten_dict

    tg = make_ref_G()
    variables = convert_state_dict({k: v.numpy() for k, v in tg.state_dict().items()})
    g = sg2.Generator(our_cfg())
    rng = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    ours = g.init(rng, jnp.zeros((1, CFG["z_dim"])), None,
                  jnp.zeros((1, CFG["h_dim"])), noise_mode="const")
    conv_flat = flatten_dict(variables)
    init_flat = flatten_dict(ours)
    missing = set(conv_flat) ^ set(init_flat)
    assert not missing, sorted(missing)[:10]
    for k in conv_flat:
        assert tuple(conv_flat[k].shape) == tuple(init_flat[k].shape), k
