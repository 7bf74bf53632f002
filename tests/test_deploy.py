import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.io.deploy import cast_params, fold_spectral_norm
from ic_gan_tpu.models.biggan import BigGANConfig, Generator, Discriminator


def build():
    cfg = BigGANConfig(
        resolution=32, n_classes=10, G_ch=8, D_ch=8, dim_z=20, G_attn="0",
        D_attn="0", shared_dim=16, shared_dim_feat=24, instance_sz=48,
        class_cond=True, instance_cond=True,
    )
    g = Generator(cfg)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (2, cfg.effective_dim_z))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.instance_sz))
    label = jnp.asarray([1, 3])
    variables = g.init(rng, z, label, feats, train=False)
    return cfg, g, variables, z, label, feats


def test_folded_matches_unfolded_eval():
    cfg, g, variables, z, label, feats = build()
    ref = g.apply(variables, z, label, feats, train=False)
    folded = fold_spectral_norm(variables)
    assert "sn" not in folded
    out = g.apply(folded, z, label, feats, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_folded_discriminator_matches():
    cfg, g, variables, z, label, feats = build()
    d = Discriminator(cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    d_vars = d.init(jax.random.PRNGKey(0), x, label, feats, train=False)
    ref = d.apply(d_vars, x, label, feats, train=False)
    out = d.apply(fold_spectral_norm(d_vars), x, label, feats, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_cast_params_keeps_bn_stats_fp32():
    cfg, g, variables, z, label, feats = build()
    folded = cast_params(fold_spectral_norm(variables))
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(folded)
    for path, leaf in flat.items():
        if "batch_stats" in path:
            assert leaf.dtype == jnp.float32, path
        elif jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16, path
    out = g.apply(folded, z, label, feats, train=False)
    # bf16 weights: looser tolerance vs the fp32 reference.
    ref = g.apply(variables, z, label, feats, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)
