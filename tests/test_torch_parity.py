"""Parity tests: ic_gan_tpu BigGAN vs the reference PyTorch implementation.

The reference (read-only at /root/reference) is used as the numerical oracle:
instantiate its Generator/Discriminator, export the torch state dict through
the ``io.torch_import`` converter, and compare eval-mode forwards.  This is
the gate for loading released IC-GAN checkpoints (SURVEY.md §7.2 step 2).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/BigGAN_PyTorch")

import jax
import jax.numpy as jnp

from ic_gan_tpu.models.biggan import BigGANConfig, Generator, Discriminator
from ic_gan_tpu.io.torch_import import (
    load_generator_variables,
    load_discriminator_variables,
)


def _ref_biggan():
    from BigGAN_PyTorch import BigGAN as ref_biggan

    return ref_biggan


def make_cfg(resolution=32, attn="0"):
    return BigGANConfig(
        resolution=resolution,
        n_classes=10,
        G_ch=8,
        D_ch=8,
        dim_z=20,
        G_attn=attn,
        D_attn=attn,
        shared_dim=16,
        hier=True,
        class_cond=False,
        instance_cond=True,
        G_shared_feat=True,
        shared_dim_feat=24,
        instance_sz=2048,  # reference hardcodes the 2048-d feature input
    )


def ref_kwargs(cfg):
    return dict(
        G_ch=cfg.G_ch,
        D_ch=cfg.D_ch,
        dim_z=cfg.dim_z,
        resolution=cfg.resolution,
        G_attn=cfg.G_attn,
        D_attn=cfg.D_attn,
        n_classes=cfg.n_classes,
        G_shared=cfg.G_shared,
        shared_dim=cfg.shared_dim,
        hier=cfg.hier,
        class_cond=cfg.class_cond,
        instance_cond=cfg.instance_cond,
        G_shared_feat=cfg.G_shared_feat,
        shared_dim_feat=cfg.shared_dim_feat,
        no_optim=True,
        embedded_optimizer=False,
        skip_init=True,
        SN_eps=1e-6,
        BN_eps=1e-5,
    )


def _init_ref_weights(module):
    # skip_init=True leaves torch default init; randomize for a stronger test.
    gen = torch.Generator().manual_seed(0)
    for p in module.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    for name, b in module.named_buffers():
        if name.endswith("stored_var"):
            with torch.no_grad():
                b.copy_(torch.rand(b.shape, generator=gen) * 0.5 + 0.5)
        elif name.endswith("stored_mean"):
            with torch.no_grad():
                b.copy_(torch.randn(b.shape, generator=gen) * 0.1)
        elif ".u" in name or name.endswith("u0"):
            with torch.no_grad():
                b.copy_(torch.randn(b.shape, generator=gen))


@pytest.mark.parametrize("resolution,attn", [(32, "0"), (64, "32")])
def test_generator_matches_reference(resolution, attn):
    ref = _ref_biggan()
    cfg = make_cfg(resolution, attn)
    tg = ref.Generator(**ref_kwargs(cfg))
    _init_ref_weights(tg)
    tg.eval()

    rng = np.random.RandomState(0)
    z = rng.randn(3, cfg.effective_dim_z).astype(np.float32)
    feats = rng.randn(3, 2048).astype(np.float32)

    with torch.no_grad():
        ref_out = tg(torch.from_numpy(z), None, torch.from_numpy(feats)).numpy()

    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    variables = load_generator_variables(sd, cfg)
    g = Generator(cfg)
    out = g.apply(variables, jnp.asarray(z), None, jnp.asarray(feats), train=False)
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))  # NHWC -> NCHW

    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("resolution,attn", [(32, "0"), (64, "32")])
def test_discriminator_matches_reference(resolution, attn):
    ref = _ref_biggan()
    cfg = make_cfg(resolution, attn)
    td = ref.Discriminator(instance_sz=cfg.instance_sz, **ref_kwargs(cfg))
    _init_ref_weights(td)
    td.eval()

    rng = np.random.RandomState(1)
    x = rng.randn(3, 3, resolution, resolution).astype(np.float32) * 0.5
    feats = rng.randn(3, 2048).astype(np.float32)

    with torch.no_grad():
        ref_out = td(
            torch.from_numpy(x), None, torch.from_numpy(feats)
        ).numpy()

    sd = {k: v.numpy() for k, v in td.state_dict().items()}
    variables = load_discriminator_variables(sd, cfg)
    d = Discriminator(cfg)
    out = d.apply(
        variables,
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        None,
        jnp.asarray(feats),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=1e-3)


def test_generator_class_and_instance_parity():
    ref = _ref_biggan()
    cfg = make_cfg(32, "0").replace(class_cond=True)
    tg = ref.Generator(**ref_kwargs(cfg))
    _init_ref_weights(tg)
    tg.eval()

    rng = np.random.RandomState(2)
    z = rng.randn(2, cfg.effective_dim_z).astype(np.float32)
    feats = rng.randn(2, 2048).astype(np.float32)
    label = np.array([1, 7])

    with torch.no_grad():
        ref_out = tg(
            torch.from_numpy(z), torch.from_numpy(label), torch.from_numpy(feats)
        ).numpy()

    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    variables = load_generator_variables(sd, cfg)
    g = Generator(cfg)
    out = g.apply(
        variables, jnp.asarray(z), jnp.asarray(label), jnp.asarray(feats),
        train=False,
    )
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_export_roundtrip():
    """Flax → torch state_dict → Flax round-trips exactly, and the exported
    dict loads into the reference torch module."""
    from ic_gan_tpu.io.torch_import import (
        export_generator_state_dict,
        load_generator_variables,
    )
    from flax.traverse_util import flatten_dict

    cfg = make_cfg(32, "0")
    g = Generator(cfg)
    rng = np.random.RandomState(7)
    z = jnp.asarray(rng.randn(1, cfg.effective_dim_z).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 2048).astype(np.float32))
    import jax

    variables = g.init(jax.random.PRNGKey(0), z, None, feats, train=False)

    sd = export_generator_state_dict(variables, cfg)
    back = load_generator_variables(sd, cfg)
    a, b = flatten_dict(variables), flatten_dict(back)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=str(k))

    # The exported dict must load into the actual reference module.
    ref = _ref_biggan()
    tg = ref.Generator(**ref_kwargs(cfg))
    missing, unexpected = tg.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    # Only sv-logging buffers, BN counters, and the reference's unused class
    # embedding (instantiated even when class_cond=False, BigGAN.py:230-234)
    # may be absent from our export.
    assert all(
        "sv" in m or "counter" in m or "num_batches" in m
        or m == "shared.weight"
        for m in missing
    ), missing

    # And the reference module with our exported weights matches our forward.
    tg.eval()
    with torch.no_grad():
        ref_out = tg(torch.from_numpy(np.asarray(z)), None,
                     torch.from_numpy(np.asarray(feats))).numpy()
    ours = g.apply(variables, z, None, feats, train=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref_out, atol=2e-4,
        rtol=1e-3,
    )
