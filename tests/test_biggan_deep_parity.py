"""BigGAN-deep parity vs the reference torch implementation (oracle)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/BigGAN_PyTorch")

import jax
import jax.numpy as jnp

from ic_gan_tpu.models.biggan_deep import (
    BigGANDeepConfig,
    Discriminator,
    Generator,
)
from ic_gan_tpu.io.torch_import import (
    load_deep_discriminator_variables,
    load_deep_generator_variables,
)


def _ref():
    from BigGAN_PyTorch import BigGANdeep

    return BigGANdeep


def make_cfg(resolution=32, attn="0"):
    return BigGANDeepConfig(
        resolution=resolution,
        n_classes=6,
        G_ch=8,
        D_ch=8,
        dim_z=16,
        G_attn=attn,
        D_attn=attn,
        shared_dim=12,
        hier=True,
        G_depth=2,
        D_depth=2,
    )


def _init_weights(module, seed=0):
    gen = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    for name, b in module.named_buffers():
        with torch.no_grad():
            if name.endswith("stored_var"):
                b.copy_(torch.rand(b.shape, generator=gen) * 0.5 + 0.5)
            elif name.endswith("stored_mean"):
                b.copy_(torch.randn(b.shape, generator=gen) * 0.1)
            elif "u0" in name:
                b.copy_(torch.randn(b.shape, generator=gen))


@pytest.mark.parametrize("resolution,attn", [(32, "0"), (64, "32")])
def test_deep_generator_matches_reference(resolution, attn):
    ref = _ref()
    cfg = make_cfg(resolution, attn)
    tg = ref.Generator(
        G_ch=cfg.G_ch, G_depth=cfg.G_depth, dim_z=cfg.dim_z,
        resolution=cfg.resolution, G_attn=cfg.G_attn, n_classes=cfg.n_classes,
        G_shared=True, shared_dim=cfg.shared_dim, hier=True,
        no_optim=True, skip_init=True, SN_eps=1e-6, BN_eps=1e-5,
    )
    _init_weights(tg)
    tg.eval()

    rng = np.random.RandomState(0)
    z = rng.randn(2, cfg.dim_z).astype(np.float32)
    label = np.array([2, 5])
    with torch.no_grad():
        # Reference deep G.forward takes the *embedded* y (G(z), ys passed
        # through G.shared by the caller — trainer does G.shared(y)).
        y_emb = tg.shared(torch.from_numpy(label))
        ref_out = tg(torch.from_numpy(z), y_emb).numpy()

    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    variables = load_deep_generator_variables(sd, cfg)
    g = Generator(cfg)
    out = g.apply(variables, jnp.asarray(z), jnp.asarray(label), None,
                  train=False)
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref_out, atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("resolution,attn", [(32, "0"), (64, "32")])
def test_deep_discriminator_matches_reference(resolution, attn):
    ref = _ref()
    cfg = make_cfg(resolution, attn)
    td = ref.Discriminator(
        D_ch=cfg.D_ch, D_depth=cfg.D_depth, resolution=cfg.resolution,
        D_attn=cfg.D_attn, n_classes=cfg.n_classes, SN_eps=1e-6,
        skip_init=True,
    )
    # Reference deep D builds an embedded optimizer unconditionally unless
    # D_lr handled; strip grads only.
    _init_weights(td, 1)
    td.eval()

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, cfg.resolution, cfg.resolution).astype(np.float32) * 0.5
    label = np.array([0, 3])
    with torch.no_grad():
        ref_out = td(torch.from_numpy(x), torch.from_numpy(label)).numpy()

    sd = {k: v.numpy() for k, v in td.state_dict().items()}
    variables = load_deep_discriminator_variables(sd, cfg)
    d = Discriminator(cfg)
    out = d.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(label), None, train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=1e-3)


def test_deep_instance_conditioning_extension():
    # Our extension: IC-GAN conditioning on the deep backbone.
    cfg = make_cfg().replace(class_cond=False, instance_cond=True,
                             shared_dim_feat=16, instance_sz=24)
    g = Generator(cfg)
    d = Discriminator(cfg)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((2, cfg.dim_z))
    feats = jnp.ones((2, 24))
    gv = g.init(rng, z, None, feats, train=True)
    imgs, _ = g.apply(gv, z, None, feats, train=True,
                      mutable=["batch_stats", "sn"])
    assert imgs.shape == (2, 32, 32, 3)
    dv = d.init(rng, imgs, None, feats, train=False)
    out = d.apply(dv, imgs, None, feats, train=False)
    assert out.shape == (2, 1)
