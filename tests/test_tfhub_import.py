"""TFHub BigGAN converter vs the reference's composed transform chain.

No TFHub module (or TF) exists offline, so the tests build synthetic
variable dumps with the exact TFHub names/shapes and verify the one-hop
conversion reproduces the reference's composition of ``TFHub2Pytorch`` +
``convert_from_v1`` (``BigGAN_PyTorch/TFHub/converter.py:84-391``): layout
transposes, the ccbn ``[y|z]`` column reorder, the first-linear 4×4×C
reshuffle, EMA-suffix reads, and SN buffer synthesis — ending in validated
Flax variables and a forward smoke at toy width.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ic_gan_tpu.io.tfhub_import as tfhub
from ic_gan_tpu.io.tfhub_import import (
    convert_tfhub_dump, load_tfhub_generator, tfhub_config,
)


def _make_dump(resolution, ch, rng, ema=True):
    """Synthetic TFHub variable dump (name → array) at width ``ch``."""
    g = tfhub._GEOMETRY[resolution]
    cfg = tfhub_config(resolution).replace(G_ch=ch)
    arch = cfg.g_arch
    z_chunk = g["dim_z"] // (g["blocks"] + 1)
    cond = 128 + z_chunk
    suff = "/ema_b999900" if ema else ""

    d = {}

    def add(path, shape, with_ema=True):
        d[f"{path}{suff if with_ema else ''}:0"] = \
            np.asarray(rng.randn(*shape) * 0.05, np.float32)

    GEN = "module/Generator"
    for i, (cin, cout) in enumerate(zip(arch["in_channels"],
                                        arch["out_channels"])):
        blk = f"{GEN}/GBlock" + (f"_{i}" if i else "")
        add(f"{blk}/conv0/w", (3, 3, cin, cout))
        add(f"{blk}/conv0/b", (cout,))
        add(f"{blk}/conv0/u0", (1, cout), with_ema=False)
        add(f"{blk}/conv1/w", (3, 3, cout, cout))
        add(f"{blk}/conv1/b", (cout,))
        add(f"{blk}/conv1/u0", (1, cout), with_ema=False)
        add(f"{blk}/conv_sc/w", (1, 1, cin, cout))
        add(f"{blk}/conv_sc/b", (cout,))
        add(f"{blk}/conv_sc/u0", (1, cout), with_ema=False)
        for hyper, c in (("HyperBN", cin), ("HyperBN_1", cout)):
            add(f"{blk}/{hyper}/gamma/w", (cond, c))
            add(f"{blk}/{hyper}/gamma/u0", (1, c), with_ema=False)
            add(f"{blk}/{hyper}/beta/w", (cond, c))
            add(f"{blk}/{hyper}/beta/u0", (1, c), with_ema=False)
            cr = hyper.replace("HyperBN", "CrossReplicaBN")
            d[f"{blk}/{cr}/accumulated_mean:0"] = \
                rng.randn(c).astype(np.float32) * 0.01
            d[f"{blk}/{cr}/accumulated_var:0"] = \
                1 + rng.rand(c).astype(np.float32) * 0.1

    a = g["attn_block"]
    ca = arch["out_channels"][a]
    attn = f"{GEN}/attention"
    add(f"{attn}/theta/w", (1, 1, ca, ca // 8))
    add(f"{attn}/theta/u0", (1, ca // 8), with_ema=False)
    add(f"{attn}/phi/w", (1, 1, ca, ca // 8))
    add(f"{attn}/phi/u0", (1, ca // 8), with_ema=False)
    add(f"{attn}/g/w", (1, 1, ca, ca // 2))
    add(f"{attn}/g/u0", (1, ca // 2), with_ema=False)
    add(f"{attn}/o_conv/w", (1, 1, ca // 2, ca))
    add(f"{attn}/o_conv/u0", (1, ca), with_ema=False)
    add(f"{attn}/gamma", ())

    first = ch * 16
    add(f"{GEN}/G_Z/G_linear/w", (z_chunk, 16 * first))
    add(f"{GEN}/G_Z/G_linear/b", (16 * first,))
    add(f"{GEN}/G_Z/G_linear/u0", (1, 16 * first), with_ema=False)
    add("module/linear/w", (1000, 128))
    add(f"{GEN}/ScaledCrossReplicaBN/gamma", (1, 1, 1, ch))
    add(f"{GEN}/ScaledCrossReplicaBN/beta", (1, 1, 1, ch))
    d[f"{GEN}/ScaledCrossReplicaBNbn/accumulated_mean:0"] = \
        rng.randn(ch).astype(np.float32) * 0.01
    d[f"{GEN}/ScaledCrossReplicaBNbn/accumulated_var:0"] = \
        1 + rng.rand(ch).astype(np.float32) * 0.1
    add(f"{GEN}/conv_2d/w", (3, 3, ch, 3))
    add(f"{GEN}/conv_2d/b", (3,))
    add(f"{GEN}/conv_2d/u0", (1, 3), with_ema=False)
    return d, cfg


def test_transforms_match_reference_composition(monkeypatch):
    monkeypatch.setattr(tfhub, "_CH", 8)
    rng = np.random.RandomState(0)
    dump, cfg = _make_dump(128, 8, rng)
    sd = convert_tfhub_dump(dump, 128)
    z_chunk = 20
    suff = "/ema_b999900"

    # conv0 → conv1, OIHW transpose (TFHub2Pytorch.load_snconv:169-176 +
    # convert_from_v1 convnum shift :268)
    w_tf = dump[f"module/Generator/GBlock/conv0/w{suff}:0"]
    np.testing.assert_array_equal(
        sd["blocks.0.0.conv1.weight"], np.transpose(w_tf, (3, 2, 0, 1)))

    # ccbn gain: (out,in) transpose + [y(128) | z_chunk] column reorder
    # (convert_from_v1:345-357)
    w_tf = dump[f"module/Generator/GBlock/HyperBN/gamma/w{suff}:0"]
    w_t = np.transpose(w_tf)
    want = np.concatenate([w_t[:, -128:], w_t[:, :z_chunk]], axis=1)
    np.testing.assert_array_equal(sd["blocks.0.0.bn1.gain.weight"], want)

    # first linear: (4,4,C) → (C,4,4) flattening (convert_from_v1:358-372)
    w_tf = dump[f"module/Generator/G_Z/G_linear/w{suff}:0"]
    want = (np.transpose(w_tf).reshape(4, 4, 128, -1)
            .transpose(2, 0, 1, 3).reshape(-1, z_chunk))
    np.testing.assert_array_equal(sd["linear.weight"], want)
    b_tf = dump[f"module/Generator/G_Z/G_linear/b{suff}:0"]
    np.testing.assert_array_equal(
        sd["linear.bias"], b_tf.reshape(4, 4, 128).transpose(2, 0, 1).reshape(-1))

    # shared embedding: double transpose = identity (convert_from_v1:382-385)
    np.testing.assert_array_equal(
        sd["shared.weight"], dump[f"module/linear/w{suff}:0"])

    # output BN: squeeze (load_ScaledCrossReplicaBNs:199-216)
    assert sd["output_layer.0.gain"].shape == (8,)

    # attention placed at the reference's blocknum (convert_from_v1:269)
    assert "blocks.3.1.theta.weight" in sd
    assert sd["blocks.3.1.gamma"].shape == ()


def test_load_ema_false_reads_raw_names():
    rng = np.random.RandomState(1)
    dump, cfg = _make_dump(128, 8, rng, ema=False)
    import ic_gan_tpu.io.tfhub_import as t
    old = t._CH
    t._CH = 8
    try:
        sd = convert_tfhub_dump(dump, 128, load_ema=False)
    finally:
        t._CH = old
    assert "blocks.0.0.conv1.weight" in sd


def test_load_tfhub_generator_forward_smoke(monkeypatch):
    """Full pipeline at toy width: dump → state dict (+SN synthesis) →
    validated Flax variables → eval forward."""
    monkeypatch.setattr(tfhub, "_CH", 8)
    rng = np.random.RandomState(2)
    dump, cfg = _make_dump(128, 8, rng)
    variables, out_cfg = load_tfhub_generator(dump, 128)
    assert out_cfg.G_ch == 8 and out_cfg.class_cond and not out_cfg.instance_cond

    from ic_gan_tpu.models.biggan import Generator

    g = Generator(out_cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, out_cfg.effective_dim_z))
    y = jnp.asarray([3, 500], jnp.int32)
    imgs = jax.jit(lambda v: g.apply(v, z, y, None, train=False))(variables)
    assert imgs.shape == (2, 128, 128, 3)
    assert bool(jnp.all(jnp.isfinite(imgs)))


@pytest.mark.slow
def test_full_geometry_shapes_res128():
    """The real ch96 geometry converts and shape-validates end-to-end
    (zeros dump — validation is the reference's released-model shapes)."""
    rng = np.random.RandomState(3)
    dump, _ = _make_dump(128, 96, rng)
    variables, cfg = load_tfhub_generator(dump, 128)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree.leaves(variables["params"]))
    assert n_params > 50e6  # the released biggan-128 is a ~50M-param G


def test_convert_tfhub_cli(monkeypatch, tmp_path):
    """cli/convert_tfhub end-to-end: dump h5 → native checkpoint +
    reference pth export + σ-folded sample grid (converter.py CLI flow)."""
    import h5py

    from ic_gan_tpu.cli import convert_tfhub

    monkeypatch.setattr(tfhub, "_CH", 8)
    dump, _ = _make_dump(128, 8, np.random.RandomState(4))
    h5_path = tmp_path / "biggan-128.h5"
    with h5py.File(h5_path, "w") as f:
        for k, v in dump.items():
            f.create_dataset(k, data=v)

    out = tmp_path / "native_ckpt"
    pth = tmp_path / "biggan-128.pth"
    grid = tmp_path / "samples.png"
    variables, cfg = convert_tfhub.main([
        "--set", f"dump={h5_path}", "resolution=128", f"out={out}",
        f"pth_out={pth}", f"sample_grid={grid}", "sample_batch=4",
    ])
    assert (out.exists() or (tmp_path / "native_ckpt").exists())
    assert pth.exists() and grid.exists()

    # round-trip: the exported pth reloads identically
    import torch

    from ic_gan_tpu.io.torch_import import load_generator_variables

    sd = {k: v.numpy() for k, v in torch.load(pth).items()}
    again = load_generator_variables(sd, cfg)
    a = jax.tree.leaves(variables)
    b = jax.tree.leaves(again)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
