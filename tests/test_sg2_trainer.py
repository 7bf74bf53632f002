import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from ic_gan_tpu.data.datasets import HDF5Dataset, hdf5_filenames
from ic_gan_tpu.models import stylegan2 as sg2
from ic_gan_tpu.train.stylegan2_step import SG2TrainConfig
from ic_gan_tpu.train.stylegan2_trainer import SG2LoopConfig, SG2Trainer


@pytest.fixture()
def env(tmp_path):
    rng = np.random.RandomState(0)
    names = hdf5_filenames(16, "imagenet", k_nn=3)
    with h5py.File(tmp_path / names["xy"], "w") as f:
        f.create_dataset(
            "imgs", data=rng.randint(0, 255, (16, 3, 16, 16), dtype=np.uint8)
        )
        f.create_dataset("labels", data=rng.randint(0, 3, (16,)).astype(np.int64))
    with h5py.File(tmp_path / names["feats"], "w") as f:
        f.create_dataset("feats", data=rng.randn(16, 12).astype(np.float32))
    ds = HDF5Dataset(
        root=str(tmp_path / names["xy"]),
        root_feats=str(tmp_path / names["feats"]),
        load_labels=False, load_features=True, k_nn=3, feature_dim=12,
    )
    mcfg = sg2.StyleGAN2Config(
        img_resolution=16, z_dim=8, c_dim=0, h_dim=12, w_dim=16,
        channel_base=512, channel_max=32, num_fp16_res=0, conv_clamp=None,
        num_mapping_layers=2, mbstd_group_size=2,
    )
    tcfg = SG2TrainConfig(G_reg_interval=2, D_reg_interval=3, ada_interval=2,
                          ada_kimg=0.01)
    lcfg = SG2LoopConfig(
        run_dir=str(tmp_path / "runs"), batch_size=4, kimg_per_tick=1,
        snapshot_ticks=1, augment_spec="color",
    )
    return ds, mcfg, tcfg, lcfg


def test_sg2_trainer_runs_with_ada_and_snapshots(env):
    ds, mcfg, tcfg, lcfg = env
    evals = []

    def eval_fn(tr):
        imgs, _, _ = tr.sample_fn(2, jax.random.PRNGKey(0))
        assert imgs.shape == (2, 16, 16, 3)
        evals.append(1)
        return {"FID": 50.0 - len(evals)}

    tr = SG2Trainer(mcfg, tcfg, lcfg, ds, eval_fn=eval_fn)
    tr.run(max_steps=8)
    assert int(tr.state.step) == 8
    assert evals
    run_dir = tr.run_dir
    assert os.path.exists(os.path.join(run_dir, "stats.jsonl"))
    assert os.path.isdir(os.path.join(run_dir, "network-snapshot"))
    assert os.path.isdir(os.path.join(run_dir, "best-network-snapshot"))
    # ADA p adjusted at least once (controller ran).
    assert float(tr.state.ada_p) >= 0.0


def test_sg2_trainer_profiler_trace_capture(env, tmp_path):
    """profile_dir captures a jax.profiler trace window with per-phase
    StepTraceAnnotations (ref annotates every SG2 phase,
    training_loop.py:346-351; mirrors train/trainer.py's BigGAN hook)."""
    ds, mcfg, tcfg, lcfg = env
    import dataclasses

    prof_dir = str(tmp_path / "prof")
    lcfg = dataclasses.replace(
        lcfg, profile_dir=prof_dir, profile_start=1, profile_steps=2
    )
    tr = SG2Trainer(mcfg, tcfg, lcfg, ds)
    tr.run(max_steps=4)
    # The trace window must have closed (stop_trace ran) and produced the
    # standard plugins/profile/<run>/*.trace.json.gz artifact tree.
    found = []
    for root, _dirs, files in os.walk(prof_dir):
        found += [f for f in files if ".trace" in f or f.endswith(".xplane.pb")]
    assert found, f"no profiler artifacts under {prof_dir}"
    # And a fifth step after the window must not raise (trace is closed).
    tr.run(max_steps=1)


def test_sg2_trainer_ada_p_moves_with_overfit_signal(env):
    ds, mcfg, tcfg, lcfg = env
    tr = SG2Trainer(mcfg, tcfg, lcfg, ds)
    # Force a strongly positive real-sign accumulator and run ada_update.
    from ic_gan_tpu.train.stylegan2_step import ada_update

    tr.state = tr.state.replace(
        ada_sign_sum=jnp.asarray(100.0), ada_count=jnp.asarray(100.0)
    )
    tr.state = ada_update(tr.state, tcfg, lcfg.batch_size)
    assert float(tr.state.ada_p) > 0.0
