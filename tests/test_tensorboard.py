"""Native TensorBoard event writer (``utils/tensorboard.py``): wire-format
correctness (CRC32C, TFRecord framing, Event/Summary protos) and trainer
integration. Reference behavior: ``training_loop.py:389-396,698-715`` writes
scalar events per tick when tensorboard is importable."""

import glob
import os
import struct

import numpy as np


def test_crc32c_check_value():
    # The standard CRC32C check vector (RFC 3720 appendix B / "123456789").
    from ic_gan_tpu.utils.tensorboard import _crc32c, _masked_crc

    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    # Mask is rotate-right-15 + constant (TF record_writer.h).
    crc = _crc32c(b"abc")
    want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert _masked_crc(b"abc") == want


def test_event_file_roundtrip(tmp_path):
    from ic_gan_tpu.utils.tensorboard import SummaryWriter, read_scalar_events

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("Loss/G", 1.5, 10)
    w.add_scalar("Loss/D", -0.25, 10)
    w.add_scalars({"Metrics/FID": 42.0, "skip": None}, 20)
    w.close()

    events = read_scalar_events(w.path)  # validates every record CRC
    assert events == [
        (10, "Loss/G", 1.5),
        (10, "Loss/D", -0.25),
        (20, "Metrics/FID", 42.0),
    ]


def test_file_version_header(tmp_path):
    """TensorBoard only loads files whose first event carries
    ``file_version = "brain.Event:2"``."""
    from ic_gan_tpu.utils.tensorboard import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.close()
    data = open(w.path, "rb").read()
    (length,) = struct.unpack_from("<Q", data, 0)
    payload = data[12:12 + length]
    assert b"brain.Event:2" in payload
    assert os.path.basename(w.path).startswith("events.out.tfevents.")


def test_sg2_trainer_writes_events(tmp_path):
    """SG2 tick loop emits Progress/* scalars (nimg-stamped, like the
    reference's global_step=nimg tagging)."""
    h5py = __import__("pytest").importorskip("h5py")

    from ic_gan_tpu.data.datasets import HDF5Dataset, hdf5_filenames
    from ic_gan_tpu.models import stylegan2 as sg2
    from ic_gan_tpu.train.stylegan2_step import SG2TrainConfig
    from ic_gan_tpu.train.stylegan2_trainer import SG2LoopConfig, SG2Trainer
    from ic_gan_tpu.utils.tensorboard import read_scalar_events

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
        channel_base=256, channel_max=16, num_fp16_res=0, conv_clamp=None,
        num_mapping_layers=1, mbstd_group_size=2,
    )
    loop = SG2LoopConfig(
        experiment_name="tb", run_dir=str(tmp_path / "runs"), total_kimg=1,
        kimg_per_tick=1, snapshot_ticks=1000, batch_size=4,
        ada_enabled=False,
    )
    trainer = SG2Trainer(mcfg, SG2TrainConfig(), loop, ds)
    trainer.run(max_steps=2)

    files = glob.glob(os.path.join(trainer.run_dir, "tb", "events.*"))
    assert len(files) == 1
    events = read_scalar_events(files[0])
    tags = {t for _, t, _ in events}
    assert "Progress/sec_per_kimg" in tags and "Progress/augment_p" in tags
    assert all(np.isfinite(v) for _, _, v in events)
