import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gan_tpu.models import stylegan2 as sg2
from ic_gan_tpu.train.stylegan2_step import (
    SG2TrainConfig,
    SG2TrainState,
    make_sg2_train_step,
    ada_update,
)
from ic_gan_tpu.data.augment import diff_augment


def build(do_pl=False, do_r1=False, augment=False, debug_grads=False):
    cfg = sg2.StyleGAN2Config(
        img_resolution=16, z_dim=8, c_dim=0, h_dim=12, w_dim=16,
        channel_base=512, channel_max=32, num_fp16_res=0, conv_clamp=None,
        num_mapping_layers=2, mbstd_group_size=2,
    )
    tcfg = SG2TrainConfig()
    g = sg2.Generator(cfg)
    d = sg2.Discriminator(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    N = 4
    z = jnp.zeros((N, cfg.z_dim))
    h = jnp.ones((N, cfg.h_dim))
    g_vars = g.init(rngs, z, None, h)
    x = jnp.zeros((N, 16, 16, 3))
    d_vars = d.init(rngs, x, None, h)
    state = SG2TrainState.create(g_vars, d_vars, tcfg)
    aug = (lambda rng, img, p: diff_augment(rng, img, "color")) if augment else None
    step = make_sg2_train_step(g, d, tcfg, cfg.z_dim, do_pl=do_pl, do_r1=do_r1,
                               augment_fn=aug, debug_grads=debug_grads)
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(2), (N, 16, 16, 3)) * 0.5,
        "h": jax.random.normal(jax.random.PRNGKey(3), (N, cfg.h_dim)),
        "gen_h": jax.random.normal(jax.random.PRNGKey(4), (N, cfg.h_dim)),
    }
    return state, step, batch


@pytest.mark.parametrize("do_pl,do_r1", [(False, False), (True, True)])
def test_sg2_step_runs_and_updates(do_pl, do_r1):
    state, step, batch = build(do_pl=do_pl, do_r1=do_r1)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["G_loss"]))
    assert np.isfinite(float(metrics["D_loss"]))
    if do_pl:
        assert "pl_penalty" in metrics and np.isfinite(float(metrics["pl_penalty"]))
        assert float(new_state.pl_mean) != 0.0
    if do_r1:
        assert "r1_penalty" in metrics and np.isfinite(float(metrics["r1_penalty"]))

    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.g_params),
                        jax.tree.leaves(new_state.g_params))
    )
    assert changed
    # w_avg moving average updated during Gmain.
    w_avg_old = state.g_state["batch_stats"]["mapping"]["w_avg"]
    w_avg_new = new_state.g_state["batch_stats"]["mapping"]["w_avg"]
    assert not np.allclose(np.asarray(w_avg_old), np.asarray(w_avg_new))


def test_sg2_step_with_augment_pipe():
    state, step, batch = build(augment=True)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["D_loss"]))


def test_ada_controller_moves_p():
    state, step, batch = build()
    cfg = SG2TrainConfig()
    # Fake overfitting signal: real signs strongly positive -> p must rise.
    state = state.replace(ada_sign_sum=jnp.asarray(40.0), ada_count=jnp.asarray(40.0))
    new_state = ada_update(state, cfg, batch_size=4)
    assert float(new_state.ada_p) > float(state.ada_p)
    assert float(new_state.ada_count) == 0.0
    # Underfitting: negative signs -> p must fall (clipped at 0).
    state2 = state.replace(ada_p=jnp.asarray(0.5),
                           ada_sign_sum=jnp.asarray(-40.0),
                           ada_count=jnp.asarray(40.0))
    new2 = ada_update(state2, cfg, batch_size=4)
    assert float(new2.ada_p) < 0.5


def test_ema_rampup_beta_small_early():
    # Early in training (cur_nimg small) the EMA must track the live weights
    # closely (ema_nimg clipped by rampup).
    state, step, batch = build()
    new_state, _ = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    for e, p in zip(jax.tree.leaves(new_state.g_ema_params),
                    jax.tree.leaves(new_state.g_params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p), atol=1e-4)


def test_sg2_step_sharded_over_mesh_matches_single_device():
    """Sharded SG2 step (with the hard parts on: R1/PL grad-of-grad through
    the augment pipe) must equal the single-device step on the same global
    batch — the DDP replica-consistency contract (ref ``misc.py:233-242``).

    Asserted on raw gradients (tight): Adam normalizes away scale errors,
    and |g| ≲ adam_eps elements legitimately amplify reassociation noise
    into O(lr) param deltas, so params get only a loose lr-scale bound."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ic_gan_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    state, step, batch = build(do_pl=True, do_r1=True, augment=True,
                               debug_grads=True)
    # Pad batch to 8 for even sharding.
    batch = jax.tree.map(lambda a: jnp.concatenate([a, a], axis=0), batch)
    rng = jax.random.PRNGKey(0)

    ref_state, ref_metrics = jax.jit(step)(state, batch, rng)

    mesh = make_mesh()
    sh = NamedSharding(mesh, P("data"))
    sharded = jax.tree.map(lambda a: jax.device_put(a, sh), batch)
    new_state, metrics = jax.jit(step)(state, sharded, rng)

    assert np.isfinite(float(metrics["G_loss"]))
    assert np.isfinite(float(metrics["D_loss"]))
    for k in ("g_grads", "d_grads"):
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(ref_metrics[k])[0],
            jax.tree.leaves(metrics[k]),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4,
                err_msg=f"{k}{jax.tree_util.keystr(path)}")
    for k in ref_metrics:
        if k in ("g_grads", "d_grads"):
            continue
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), atol=1e-5, rtol=1e-5,
            err_msg=k)
    for keyed in ("g_params", "d_params", "g_state", "g_ema_params",
                  "pl_mean"):
        for a, b in zip(jax.tree.leaves(getattr(ref_state, keyed)),
                        jax.tree.leaves(getattr(new_state, keyed))):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-2, rtol=1e-3,
                err_msg=keyed)


def test_freeze_d_keeps_top_layers_fixed():
    from ic_gan_tpu.train.stylegan2_step import freeze_d_mask

    state, _, batch = build()
    mask = freeze_d_mask(state.d_params, 2)
    # Highest-resolution block (b16): fromrgb + conv0 frozen, conv1 trainable.
    import jax as _jax

    leaves_frozen = _jax.tree.leaves(mask["b16"]["fromrgb"]) + _jax.tree.leaves(
        mask["b16"]["conv0"]
    )
    assert not any(leaves_frozen)
    assert all(_jax.tree.leaves(mask["b16"]["conv1"]))
    assert all(_jax.tree.leaves(mask["b8"]))
    assert all(_jax.tree.leaves(mask["b4"]))

    # A training step must not move frozen params.
    tcfg = SG2TrainConfig(freeze_d_layers=2)
    mcfg = sg2.StyleGAN2Config(
        img_resolution=16, z_dim=8, c_dim=0, h_dim=12, w_dim=16,
        channel_base=512, channel_max=32, num_fp16_res=0, conv_clamp=None,
        num_mapping_layers=2, mbstd_group_size=2,
    )
    g, d = sg2.Generator(mcfg), sg2.Discriminator(mcfg)
    step = jax.jit(make_sg2_train_step(g, d, tcfg, mcfg.z_dim, False, False))
    new_state, _ = step(state, batch, jax.random.PRNGKey(0))
    before = np.asarray(jax.tree.leaves(state.d_params["b16"]["fromrgb"])[0])
    after = np.asarray(jax.tree.leaves(new_state.d_params["b16"]["fromrgb"])[0])
    np.testing.assert_array_equal(before, after)
    c1_before = np.asarray(jax.tree.leaves(state.d_params["b16"]["conv1"])[0])
    c1_after = np.asarray(jax.tree.leaves(new_state.d_params["b16"]["conv1"])[0])
    assert not np.array_equal(c1_before, c1_after)
