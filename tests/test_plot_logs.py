"""Log-plotting CLI (reference ``BigGAN_PyTorch/logs/{process_training.m,
process_inception_log.m,compare_IS.m}`` — MATLAB scripts rebuilt on the
framework's jsonl / per-metric ``.log`` formats)."""

import json
import os

import numpy as np
import pytest

from ic_gan_tpu.cli import plot_logs


def _write_run(root, name, n_itr=30, fid_offset=0.0):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(hash(name) % 1000)
    with open(os.path.join(d, f"{name}_log.jsonl"), "w") as f:
        for i in range(n_itr):
            row = {
                "itr": i * 100,
                "D_loss_real": float(1.0 + 0.3 * rng.randn()),
                "D_loss_fake": float(0.8 + 0.3 * rng.randn()),
                "G_loss": float(1.2 + 0.3 * rng.randn()),
                "_stamp": 1000.0 + i,
            }
            if i % 10 == 0:  # sv_log_interval stream
                row["G_sv/blocks_0_conv_0"] = float(1.0 + 0.01 * i)
                row["D_sv/blocks_0_conv_0"] = float(2.0 - 0.01 * i)
            f.write(json.dumps(row) + "\n")
    with open(os.path.join(d, f"{name}_test_log.jsonl"), "w") as f:
        for i in range(0, n_itr, 5):
            f.write(json.dumps({
                "itr": i * 100,
                "IS_mean": float(5 + 0.5 * i),
                "IS_std": 0.1,
                "FID": float(100 - 2 * i + fid_offset),
                "_stamp": 1000.0 + i,
            }) + "\n")
    return d


def _argv(d):
    out = ["--set"]
    for k, v in d.items():
        out.append(f"{k}={v}")
    return out


def test_training_mode(tmp_path):
    d = _write_run(str(tmp_path), "expA")
    # also a reference-format per-metric .log (MyLogger "itr: value" lines)
    with open(os.path.join(d, "G_sv1_extra.log"), "w") as f:
        for i in range(10):
            f.write(f"{i * 100}: {1.5 + 0.01 * i:3.3e}\n")
    out = tmp_path / "plots"
    written = plot_logs.main(_argv({
        "logs_dir": d, "out_dir": str(out), "loss_ylim": "-1,4",
    }))
    names = {os.path.basename(p) for p in written}
    assert names == {"losses.png", "G_sv.png", "D_sv.png"}
    for p in written:
        assert os.path.getsize(p) > 1000


def test_metric_log_parser(tmp_path):
    p = tmp_path / "x.log"
    p.write_text("0: 1.000e+00\n100: -2.500e-01\n200: 3.3\n")
    itr, val = plot_logs.read_metric_log(str(p))
    np.testing.assert_array_equal(itr, [0, 100, 200])
    np.testing.assert_allclose(val, [1.0, -0.25, 3.3])


def test_smooth_preserves_mean():
    v = np.random.RandomState(0).randn(200) + 5.0
    s = plot_logs.smooth(v, 51)
    assert s.shape == v.shape
    assert abs(s.mean() - v.mean()) < 0.1
    assert s.std() < v.std()


def test_inception_mode(tmp_path):
    d = _write_run(str(tmp_path), "expB")
    written = plot_logs.main(_argv({
        "mode": "inception", "logs_dir": d, "out_dir": str(tmp_path / "p"),
    }))
    assert [os.path.basename(p) for p in written] == ["inception.png"]


def test_compare_mode(tmp_path, capsys):
    d1 = _write_run(str(tmp_path), "runA", fid_offset=0.0)
    d2 = _write_run(str(tmp_path), "runB", fid_offset=10.0)
    written = plot_logs.main(_argv({
        "mode": "compare", "runs": f"{d1},{d2}",
        "out_dir": str(tmp_path / "p"),
    }))
    names = {os.path.basename(p) for p in written}
    assert names == {"compare_IS.png", "compare_FID.png"}
    table = capsys.readouterr().out
    assert "runA" in table and "runB" in table

    # IS threshold drops every run (compare_IS.m:42 semantics).
    written = plot_logs.main(_argv({
        "mode": "compare", "runs": f"{d1},{d2}",
        "out_dir": str(tmp_path / "p2"), "is_threshold": 1e9,
    }))
    assert written == []


def test_unknown_mode_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown mode"):
        plot_logs.main(_argv({"mode": "nope", "logs_dir": str(tmp_path)}))
