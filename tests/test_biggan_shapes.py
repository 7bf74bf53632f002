import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gan_tpu.models.biggan import BigGANConfig, Generator, Discriminator


def tiny_cfg(**kw):
    base = dict(
        resolution=32,
        n_classes=10,
        G_ch=8,
        D_ch=8,
        dim_z=20,
        G_attn="0",
        D_attn="0",
        shared_dim=16,
        shared_dim_feat=24,
        instance_sz=32,
    )
    base.update(kw)
    return BigGANConfig(**base)


@pytest.mark.parametrize(
    "class_cond,instance_cond",
    [(False, True), (True, False), (True, True)],
)
def test_generator_forward_shapes(class_cond, instance_cond):
    cfg = tiny_cfg(class_cond=class_cond, instance_cond=instance_cond)
    g = Generator(cfg)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (2, cfg.effective_dim_z))
    label = jnp.zeros((2,), jnp.int32) if class_cond else None
    feats = jnp.ones((2, cfg.instance_sz)) if instance_cond else None
    variables = g.init(rng, z, label, feats, train=True)
    out, mutated = g.apply(
        variables, z, label, feats, train=True, mutable=["batch_stats", "sn"]
    )
    assert out.shape == (2, 32, 32, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)
    assert "batch_stats" in mutated and "sn" in mutated


def test_generator_eval_uses_stored_stats():
    cfg = tiny_cfg()
    g = Generator(cfg)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (2, cfg.effective_dim_z))
    feats = jnp.ones((2, cfg.instance_sz))
    variables = g.init(rng, z, None, feats, train=True)
    out = g.apply(variables, z, None, feats, train=False)
    assert out.shape == (2, 32, 32, 3)


@pytest.mark.parametrize("resolution", [32, 64])
def test_discriminator_forward(resolution):
    cfg = tiny_cfg(resolution=resolution)
    d = Discriminator(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, resolution, resolution, 3))
    feats = jnp.ones((2, cfg.instance_sz))
    variables = d.init(rng, x, None, feats, train=True)
    out, _ = d.apply(variables, x, None, feats, train=True, mutable=["sn"])
    assert out.shape == (2, 1)


def test_hier_z_geometry():
    cfg = BigGANConfig(resolution=64, dim_z=120, hier=True)
    # res64: 4 blocks -> 5 slots -> chunk 24 -> effective 120.
    assert cfg.num_slots == 5
    assert cfg.z_chunk_size == 24
    assert cfg.effective_dim_z == 120


def test_res64_param_count_matches_reference_magnitude():
    # Full-size icgan res64 G has ~25-30M params in the reference; make sure
    # the graph builds at full width and isn't degenerate.
    cfg = BigGANConfig(resolution=64, G_attn="32", D_attn="32")
    g = Generator(cfg)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1, cfg.effective_dim_z))
    feats = jnp.zeros((1, cfg.instance_sz))
    variables = jax.eval_shape(lambda: g.init(rng, z, None, feats, train=False))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))
    assert 15_000_000 < n_params < 60_000_000


def test_apply_weight_init_styles():
    """Post-construction re-draw (ref ``init_weights``, BigGAN.py:294-345):
    N02/glorot touch every kernel/embedding/shared leaf, leave biases and BN
    gain/bias alone; "ortho" is a no-op (construction default)."""
    from ic_gan_tpu.models.layers import apply_weight_init

    cfg = tiny_cfg(class_cond=True)
    g = Generator(cfg)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((2, cfg.effective_dim_z))
    feats = jnp.zeros((2, cfg.instance_sz))
    label = jnp.zeros((2,), jnp.int32)
    params = g.init(rng, z, label, feats, train=True)["params"]

    assert apply_weight_init(params, rng, "ortho") is params

    redrawn = apply_weight_init(params, jax.random.PRNGKey(1), "N02")
    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = jax.tree.leaves(redrawn)
    n_weights = 0
    for (path, old), new in zip(flat_old, flat_new):
        name = path[-1].key
        if name in ("kernel", "embedding", "shared"):
            n_weights += 1
            assert not np.allclose(np.asarray(old), np.asarray(new)), path
            std = float(np.std(np.asarray(new)))
            assert 0.005 < std < 0.05, (path, std)  # N(0, 0.02) draws
        else:
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new),
                                          err_msg=str(path))
    assert n_weights > 10  # the whole module tree was visited

    # Determinism: same rng -> identical draws.
    again = apply_weight_init(params, jax.random.PRNGKey(1), "N02")
    for a, b in zip(jax.tree.leaves(redrawn), jax.tree.leaves(again)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # xavier/glorot: bounded uniform, distinct streams per leaf.
    xav = apply_weight_init(params, jax.random.PRNGKey(2), "xavier")
    kernels = [
        np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(xav)[0]
        if path[-1].key == "kernel"
    ]
    assert all(np.abs(k).max() < 1.5 for k in kernels)


@pytest.mark.parametrize("norm_style", ["in", "gn", "gn_ch_4", "gn_grp_2", "nonorm"])
def test_generator_norm_styles(norm_style):
    """ccbn norm_style variants (ref layers.py:410-436) — forward runs in
    train and eval, output well-formed.  The reference's own "gn" branch
    crashes on a typo (layers.py:433 ``self.normstyle``); here it works."""
    cfg = tiny_cfg(norm_style=norm_style)
    g = Generator(cfg)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (2, cfg.effective_dim_z))
    feats = jnp.ones((2, cfg.instance_sz))
    variables = g.init(rng, z, None, feats, train=True)
    out, _ = g.apply(variables, z, None, feats, train=True,
                     mutable=["batch_stats", "sn"])
    assert out.shape == (2, cfg.resolution, cfg.resolution, 3)
    assert np.isfinite(np.asarray(out)).all()
    out_eval = g.apply(variables, z, None, feats, train=False)
    assert np.isfinite(np.asarray(out_eval)).all()


def test_instance_norm_semantics():
    """Train: each sample normalized with its own (H, W) moments; running
    stats accumulate batch-averaged instance moments (torch F.instance_norm
    with running stats, the reference ccbn "in" branch layers.py:421-431)."""
    from ic_gan_tpu.models.layers import InstanceNorm

    m = InstanceNorm(5, eps=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 4, 5)) * 2.0 + 1.0
    variables = m.init(jax.random.PRNGKey(1), x, train=True)
    y, mut = m.apply(variables, x, train=True, mutable=["batch_stats"])
    y = np.asarray(y)
    # Per-sample per-channel zero mean / unit var.
    np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=(1, 2)), 1.0, atol=1e-4)
    xm = np.asarray(x).mean(axis=(1, 2)).mean(axis=0)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), 0.1 * xm, atol=1e-5
    )
    # Eval path uses the stored per-channel stats.
    y_eval = m.apply({"batch_stats": mut["batch_stats"]}, x, train=False)
    expect = (np.asarray(x) - np.asarray(mut["batch_stats"]["mean"])) / np.sqrt(
        np.asarray(mut["batch_stats"]["var"])
    )
    np.testing.assert_allclose(np.asarray(y_eval), expect, atol=1e-5)
