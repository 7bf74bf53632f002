import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gan_tpu.models.biggan import BigGANConfig, Generator, Discriminator
from ic_gan_tpu.train.state import GANTrainState
from ic_gan_tpu.train.step import TrainConfig, make_train_step
from ic_gan_tpu.parallel.mesh import make_mesh, shard_batch


def build(res=32, mb=4, n_acc_d=2, n_acc_g=2, n_d_steps=1, debug_grads=False,
          tcfg_kw=None, **cfg_kw):
    mcfg = BigGANConfig(
        resolution=res, n_classes=10, G_ch=8, D_ch=8, dim_z=20,
        G_attn="0", D_attn="0", shared_dim=16, shared_dim_feat=24,
        instance_sz=32, **cfg_kw,
    )
    tcfg = TrainConfig(
        num_D_steps=n_d_steps,
        num_D_accumulations=n_acc_d,
        num_G_accumulations=n_acc_g,
        ema_start=0,
        class_cond=mcfg.class_cond,
        instance_cond=mcfg.instance_cond,
        **(tcfg_kw or {}),
    )
    g, d = Generator(mcfg), Discriminator(mcfg)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((mb, mcfg.effective_dim_z))
    feats = jnp.zeros((mb, mcfg.instance_sz)) if mcfg.instance_cond else None
    label = jnp.zeros((mb,), jnp.int32) if mcfg.class_cond else None
    g_vars = g.init(rng, z, label, feats, train=True)
    x = jnp.zeros((mb, res, res, 3))
    d_vars = d.init(rng, x, label, feats, train=True)
    state = GANTrainState.create(g_vars, d_vars, tcfg.g_optimizer(), tcfg.d_optimizer())
    step = make_train_step(g.apply, d.apply, tcfg, mcfg.effective_dim_z,
                           debug_grads=debug_grads)

    nD = n_d_steps * n_acc_d
    rngs = jax.random.split(jax.random.PRNGKey(1), 8)
    batch = {
        "x": jax.random.normal(rngs[0], (nD, mb, res, res, 3)),
    }
    if mcfg.instance_cond:
        batch["feats"] = jax.random.normal(rngs[1], (nD, mb, mcfg.instance_sz))
        batch["gen_feats"] = jax.random.normal(
            rngs[2], (nD + n_acc_g, mb, mcfg.instance_sz)
        )
    if mcfg.class_cond:
        batch["label"] = jax.random.randint(rngs[3], (nD, mb), 0, 10)
        batch["gen_label"] = jax.random.randint(rngs[4], (nD + n_acc_g, mb), 0, 10)
    return state, step, batch


def test_train_step_updates_everything():
    state, step, batch = build()
    jit_step = jax.jit(step)
    new_state, metrics = jit_step(state, batch, jax.random.PRNGKey(42))
    assert int(new_state.step) == 1
    for k in ("G_loss", "D_loss_real", "D_loss_fake"):
        assert np.isfinite(float(metrics[k])), k

    def changed(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert changed(state.g_params, new_state.g_params)
    assert changed(state.d_params, new_state.d_params)
    assert changed(state.g_state, new_state.g_state)  # BN stats + SN u moved
    # ema_start=0 -> EMA is a lerp of old ema and new params; with decay
    # 0.9999 the movement is ~1e-4 of the param delta, so compare exactly.
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state.g_ema_params),
            jax.tree.leaves(new_state.g_ema_params),
        )
    )
    assert moved


def test_train_step_diffaugment_and_ortho():
    state, step, batch = build()
    # Rebuild step with DiffAugment + ortho reg enabled.
    mcfg = BigGANConfig(
        resolution=32, n_classes=10, G_ch=8, D_ch=8, dim_z=20,
        G_attn="0", D_attn="0", shared_dim=16, shared_dim_feat=24, instance_sz=32,
    )
    tcfg = TrainConfig(
        num_D_steps=1, num_D_accumulations=2, num_G_accumulations=2,
        DiffAugment="color,translation,cutout", G_ortho=1e-4, D_ortho=1e-4,
        ema_start=0,
    )
    g, d = Generator(mcfg), Discriminator(mcfg)
    step2 = make_train_step(g.apply, d.apply, tcfg, mcfg.effective_dim_z)
    new_state, metrics = jax.jit(step2)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["G_loss"]))


def test_train_step_split_d_matches_concat_fake_pass():
    """``split_D`` (ref ``BigGAN.py:679-687``): D runs fake and real as two
    forwards.  The fake forward normalizes with the same SN state the concat
    path's single forward uses, so ``D_loss_fake`` must match the concat
    step; the real pass runs on a once-more-iterated SN state and may drift
    slightly — asserted finite, and the step must still update everything."""
    state, step, batch = build()
    state2, step2, batch2 = build(tcfg_kw={"split_D": True})
    rng = jax.random.PRNGKey(11)
    _, m_concat = jax.jit(step)(state, batch, rng)
    new_state, m_split = jax.jit(step2)(state2, batch2, rng)
    np.testing.assert_allclose(
        float(m_split["D_loss_fake"]), float(m_concat["D_loss_fake"]),
        rtol=1e-5, atol=1e-6,
    )
    for k in ("G_loss", "D_loss_real", "D_loss_fake"):
        assert np.isfinite(float(m_split[k])), k
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state2.d_params),
                        jax.tree.leaves(new_state.d_params))
    )


def test_train_step_class_and_instance_cond():
    state, step, batch = build(class_cond=True, instance_cond=True)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["D_loss_real"]))


def test_train_step_sharded_over_mesh_matches_single_device():
    """The 8-device data-parallel step must be numerically EQUIVALENT to the
    single-device step on the same global batch — the reference's DDP
    contract (every replica identical after allreduce, ``misc.py:233-242``).
    Finiteness alone would not catch a wrong psum placement or per-device
    RNG skew.

    The contract is asserted on the raw GRADIENTS (tight tolerance): after
    Adam, scale errors are normalized away (m/√v is scale-invariant) and
    near-zero-gradient elements (|g| ≲ adam_eps) legitimately amplify f32
    reassociation noise into O(lr) param deltas — params are checked at a
    loose lr-scale tolerance only as a sanity bound."""
    assert len(jax.devices()) == 8
    state, step, batch = build(mb=8, debug_grads=True)
    mesh = make_mesh()
    rng = jax.random.PRNGKey(3)

    ref_state, ref_metrics = jax.jit(step)(state, batch, rng)
    sharded_batch = shard_batch(mesh, batch, axis=1)  # shard microbatch dim
    new_state, metrics = jax.jit(step)(state, sharded_batch, rng)

    assert np.isfinite(float(metrics["G_loss"]))
    for k in ("g_grads", "d_grads"):
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(ref_metrics[k])[0],
            jax.tree.leaves(metrics[k]),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-4,
                err_msg=f"{k}{jax.tree_util.keystr(path)}")
    for k in ref_metrics:
        if k in ("g_grads", "d_grads"):
            continue
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), atol=1e-5, rtol=1e-5,
            err_msg=k)
    for keyed in ("g_params", "d_params", "g_state", "d_state",
                  "g_ema_params"):
        for a, b in zip(jax.tree.leaves(getattr(ref_state, keyed)),
                        jax.tree.leaves(getattr(new_state, keyed))):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-3, rtol=1e-3,
                err_msg=keyed)


def test_ema_gate_before_start():
    # With ema_start large, EMA decay is 0 -> ema == live params after step.
    mcfg = BigGANConfig(
        resolution=32, n_classes=10, G_ch=8, D_ch=8, dim_z=20,
        G_attn="0", D_attn="0", shared_dim=16, shared_dim_feat=24, instance_sz=32,
    )
    tcfg = TrainConfig(num_D_accumulations=1, num_G_accumulations=1,
                       ema_start=10_000)
    g, d = Generator(mcfg), Discriminator(mcfg)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((2, mcfg.effective_dim_z))
    feats = jnp.zeros((2, mcfg.instance_sz))
    g_vars = g.init(rng, z, None, feats, train=True)
    d_vars = d.init(rng, jnp.zeros((2, 32, 32, 3)), None, feats, train=True)
    state = GANTrainState.create(g_vars, d_vars, tcfg.g_optimizer(), tcfg.d_optimizer())
    step = make_train_step(g.apply, d.apply, tcfg, mcfg.effective_dim_z)
    batch = {
        "x": jnp.ones((1, 2, 32, 32, 3)) * 0.1,
        "feats": jnp.ones((1, 2, 32)),
        "gen_feats": jnp.ones((2, 2, 32)),
    }
    new_state, _ = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    for e, p in zip(
        jax.tree.leaves(new_state.g_ema_params), jax.tree.leaves(new_state.g_params)
    ):
        assert np.allclose(np.asarray(e), np.asarray(p))


def test_train_step_survives_nan_microbatch():
    """A NaN real microbatch must not poison params/Adam/EMA — grads are
    scrubbed before the update (ref training_loop.py:517-521)."""
    state, step, batch = build()
    batch = dict(batch)
    x = np.asarray(batch["x"]).copy()
    x[0, 1] = np.nan  # one corrupt sample in the first D microbatch
    batch["x"] = jnp.asarray(x)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(3))
    assert float(metrics["D_grad_nonfinite"]) > 0
    for leaf in jax.tree.leaves(new_state.d_params):
        assert np.isfinite(np.asarray(leaf)).all()
    for leaf in jax.tree.leaves(new_state.d_opt_state):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            assert np.isfinite(arr).all()
    # Healthy run reports a zero count.
    state2, step2, batch2 = build()
    _, m2 = jax.jit(step2)(state2, batch2, jax.random.PRNGKey(4))
    assert float(m2["D_grad_nonfinite"]) == 0
    assert float(m2["G_grad_nonfinite"]) == 0


def test_split_d_disables_diffaugment_everywhere():
    """Under split_D the reference never augments (DA exists only on the
    concat path, BigGAN.py:679-704) — a split_D step with DiffAugment set
    must be bit-identical to one without it, in BOTH phases."""
    state, step, batch = build(
        tcfg_kw={"split_D": True, "DiffAugment": "color,translation,cutout"})
    state2, step2, batch2 = build(tcfg_kw={"split_D": True})
    rng = jax.random.PRNGKey(5)
    s1, m1 = jax.jit(step)(state, batch, rng)
    s2, m2 = jax.jit(step2)(state2, batch2, rng)
    for k in ("D_loss_real", "D_loss_fake", "G_loss"):
        np.testing.assert_array_equal(
            np.asarray(m1[k]), np.asarray(m2[k]), err_msg=k)
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
