"""Checkpointed-sampler parity: resuming restores the exact data stream
(ref ``CheckpointedSampler``, ``data_utils/utils.py:125-224``)."""

import numpy as np
import pytest

import jax

h5py = pytest.importorskip("h5py")

from ic_gan_tpu.data.datasets import HDF5Dataset, hdf5_filenames
from ic_gan_tpu.data.image_datasets import filter_by_hd
from ic_gan_tpu.models.biggan import BigGANConfig
from ic_gan_tpu.train.step import TrainConfig
from ic_gan_tpu.train.trainer import Trainer, TrainerConfig


def make_env(tmp_path):
    rng = np.random.RandomState(0)
    names = hdf5_filenames(32, "imagenet", feature_extractor="selfsupervised",
                           k_nn=3)
    with h5py.File(tmp_path / names["xy"], "w") as f:
        f.create_dataset("imgs", data=rng.randint(0, 255, (24, 3, 32, 32),
                                                  dtype=np.uint8))
        f.create_dataset("labels", data=rng.randint(0, 4, (24,)).astype(np.int64))
    with h5py.File(tmp_path / names["feats"], "w") as f:
        f.create_dataset("feats", data=rng.randn(24, 16).astype(np.float32))

    def build(seed=5):
        ds = HDF5Dataset(
            root=str(tmp_path / names["xy"]),
            root_feats=str(tmp_path / names["feats"]),
            load_labels=False, load_features=True, k_nn=3, feature_dim=16,
            seed=seed,
        )
        mcfg = BigGANConfig(resolution=32, n_classes=4, G_ch=4, D_ch=4,
                            dim_z=8, G_attn="0", D_attn="0", shared_dim=8,
                            shared_dim_feat=8, instance_sz=16)
        tcfg = TrainConfig(ema_start=0)
        trcfg = TrainerConfig(
            experiment_name="det", weights_root=str(tmp_path / "w"),
            logs_root=str(tmp_path / "l"), num_epochs=1, batch_size=4,
            test_every=100, save_every=1,
        )
        return Trainer(mcfg, tcfg, trcfg, ds)

    return build


def test_resume_restores_sampler_stream(tmp_path):
    build = make_env(tmp_path)
    tr = build()
    tr.run(steps_per_epoch=2)
    tr.save()
    # Continue: next conditioning draw after the save.
    _, feats_next = tr.dataset.sample_conditioning_instance_balance(4)

    tr2 = build(seed=999)  # different initial seed; resume must override it
    tr2.resume()
    _, feats_resumed = tr2.dataset.sample_conditioning_instance_balance(4)
    np.testing.assert_array_equal(feats_next, feats_resumed)


def test_filter_by_hd(tmp_path):
    all_ids = np.asarray([100, 101, 102, 103, 104])
    by_hd = np.empty(3, object)
    by_hd[0] = [101, 104]   # seen combinations
    by_hd[1] = [100]
    by_hd[2] = [103]
    np.save(tmp_path / "all.npy", all_ids)
    np.save(tmp_path / "byhd.npy", by_hd, allow_pickle=True)
    seen = filter_by_hd(0, str(tmp_path / "all.npy"), str(tmp_path / "byhd.npy"))
    assert seen.tolist() == [1, 4]
    unseen = filter_by_hd(1, str(tmp_path / "all.npy"), str(tmp_path / "byhd.npy"))
    assert unseen.tolist() == [0, 3]
