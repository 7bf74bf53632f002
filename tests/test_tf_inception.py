"""TF-free GraphDef parsing + execution vs oracles.

The real ``classify_image_graph_def.pb`` cannot be downloaded here, so these
tests exercise the full chain on synthetic graphs built with the same wire
format (``io/graphdef.py`` encoders): parse round-trips, the TF1-legacy
ResizeBilinear grid against a loop oracle, the executor against a torch
oracle, and ``OfficialTF1Evaluator`` end-to-end from a .pb file on disk.
Reference semantics: ``data_utils/inception_tf13.py:120-199``.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ic_gan_tpu.io.graphdef import (
    encode_graphdef, encode_node, encode_tensor, parse_graphdef,
)
from ic_gan_tpu.eval.tf_inception import (
    OfficialTF1Evaluator, TFGraphExecutor, _resize_bilinear_tf_legacy,
    evaluate_images, official_inception_score,
)


def test_graphdef_roundtrip():
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 4) * 0.5
    nodes = [
        encode_node("w", "Const", [], {"value": {"tensor": w}}),
        encode_node("x", "Placeholder", [], {"dtype": {"type": 1}}),
        encode_node("y", "Conv2D", ["x", "w"], {
            "strides": {"list_i": [1, 2, 2, 1]},
            "padding": {"s": b"SAME"},
            "align": {"b": True},
            "eps": {"f": 1.5},
        }),
    ]
    parsed = parse_graphdef(encode_graphdef(nodes))
    assert [n.name for n in parsed] == ["w", "x", "y"]
    assert parsed[0].op == "Const"
    np.testing.assert_array_equal(parsed[0].attrs["value"].tensor, w)
    assert parsed[2].inputs == ["x", "w"]
    assert list(parsed[2].attrs["strides"].list_i) == [1, 2, 2, 1]
    assert parsed[2].attrs["padding"].s == b"SAME"
    assert parsed[2].attrs["align"].b is True
    assert abs(parsed[2].attrs["eps"].f - 1.5) < 1e-7


def test_resize_bilinear_legacy_grid():
    """src = dst * in/out (no half-pixel shift) — loop oracle."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    for out_h, out_w, ac in [(9, 11, False), (3, 4, False), (9, 11, True)]:
        got = np.asarray(_resize_bilinear_tf_legacy(jnp.asarray(x), out_h, out_w, ac))
        want = np.zeros((2, out_h, out_w, 3), np.float32)
        in_h, in_w = 5, 7
        sh = (in_h - 1) / (out_h - 1) if ac else in_h / out_h
        sw = (in_w - 1) / (out_w - 1) if ac else in_w / out_w
        for i in range(out_h):
            for j in range(out_w):
                si, sj = i * sh, j * sw
                i0, j0 = min(int(si), in_h - 1), min(int(sj), in_w - 1)
                i1, j1 = min(i0 + 1, in_h - 1), min(j0 + 1, in_w - 1)
                fi, fj = si - i0, sj - j0
                want[:, i, j] = (
                    x[:, i0, j0] * (1 - fi) * (1 - fj)
                    + x[:, i1, j0] * fi * (1 - fj)
                    + x[:, i0, j1] * (1 - fi) * fj
                    + x[:, i1, j1] * fi * fj
                )
        np.testing.assert_allclose(got, want, atol=1e-5)


def _mini_graph(seed=0):
    """ExpandDims-fed graph: resize → (x-128)*1/128 → conv → BN → relu →
    maxpool → avgpool(pool_3), plus softmax weights const."""
    rng = np.random.RandomState(seed)
    conv_w = rng.randn(3, 3, 3, 8).astype(np.float32) * 0.2
    bn_m = rng.randn(8).astype(np.float32) * 0.1
    bn_v = np.abs(rng.randn(8)).astype(np.float32) + 0.5
    bn_b = rng.randn(8).astype(np.float32) * 0.1
    bn_g = np.abs(rng.randn(8)).astype(np.float32) + 0.5
    sm_w = rng.randn(8, 10).astype(np.float32) * 0.3
    nodes = [
        encode_node("ExpandDims", "Placeholder", [], {"dtype": {"type": 1}}),
        encode_node("resize/size", "Const", [],
                    {"value": {"tensor": np.asarray([16, 16], np.int32)}}),
        encode_node("resize", "ResizeBilinear", ["ExpandDims", "resize/size"],
                    {"align_corners": {"b": False}}),
        encode_node("sub/y", "Const", [],
                    {"value": {"tensor": np.asarray(128.0, np.float32).reshape(())}}),
        encode_node("sub", "Sub", ["resize", "sub/y"], {}),
        encode_node("mul/y", "Const", [],
                    {"value": {"tensor": np.asarray(1 / 128.0, np.float32).reshape(())}}),
        encode_node("mul", "Mul", ["sub", "mul/y"], {}),
        encode_node("conv/w", "Const", [], {"value": {"tensor": conv_w}}),
        encode_node("conv", "Conv2D", ["mul", "conv/w"], {
            "strides": {"list_i": [1, 1, 1, 1]}, "padding": {"s": b"SAME"}}),
        encode_node("bn/m", "Const", [], {"value": {"tensor": bn_m}}),
        encode_node("bn/v", "Const", [], {"value": {"tensor": bn_v}}),
        encode_node("bn/b", "Const", [], {"value": {"tensor": bn_b}}),
        encode_node("bn/g", "Const", [], {"value": {"tensor": bn_g}}),
        encode_node("bn", "BatchNormWithGlobalNormalization",
                    ["conv", "bn/m", "bn/v", "bn/b", "bn/g"], {
                        "variance_epsilon": {"f": 1e-3},
                        "scale_after_normalization": {"b": True}}),
        encode_node("relu", "Relu", ["bn"], {}),
        encode_node("maxpool", "MaxPool", ["relu"], {
            "ksize": {"list_i": [1, 2, 2, 1]},
            "strides": {"list_i": [1, 2, 2, 1]}, "padding": {"s": b"VALID"}}),
        encode_node("pool_3", "AvgPool", ["maxpool"], {
            "ksize": {"list_i": [1, 8, 8, 1]},
            "strides": {"list_i": [1, 1, 1, 1]}, "padding": {"s": b"VALID"}}),
        encode_node("softmax/logits/MatMul/w", "Const", [],
                    {"value": {"tensor": sm_w}}),
        encode_node("softmax/logits/MatMul", "MatMul",
                    ["squeezed_unused", "softmax/logits/MatMul/w"], {}),
    ]
    tensors = dict(conv_w=conv_w, bn_m=bn_m, bn_v=bn_v, bn_b=bn_b, bn_g=bn_g,
                   sm_w=sm_w)
    return encode_graphdef(nodes), tensors


def _torch_oracle(tensors, x255):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = torch.from_numpy(x255).permute(0, 3, 1, 2)
    # legacy-grid resize 8→16 with scale exactly 2: src = dst*0.5, same as
    # half-size checkerboard; compute via our loop-free equivalence:
    # for integer upscale factor f and align_corners=False legacy grid,
    # use explicit gather oracle instead of F.interpolate (different grid).
    t = _legacy_resize_torch(t, 16, 16)
    t = (t - 128.0) * (1 / 128.0)
    w = torch.from_numpy(tensors["conv_w"]).permute(3, 2, 0, 1)
    t = F.conv2d(t, w, padding=1)
    inv = torch.from_numpy(tensors["bn_g"]) / torch.sqrt(
        torch.from_numpy(tensors["bn_v"]) + 1e-3)
    t = t * inv.view(1, -1, 1, 1) + (
        torch.from_numpy(tensors["bn_b"])
        - torch.from_numpy(tensors["bn_m"]) * inv).view(1, -1, 1, 1)
    t = F.relu(t)
    t = F.max_pool2d(t, 2, 2)
    t = F.avg_pool2d(t, 8, 1)
    return t.permute(0, 2, 3, 1).numpy()


def _legacy_resize_torch(t, out_h, out_w):
    import torch

    n, c, in_h, in_w = t.shape
    out = torch.zeros(n, c, out_h, out_w, dtype=t.dtype)
    for i in range(out_h):
        for j in range(out_w):
            si, sj = i * in_h / out_h, j * in_w / out_w
            i0, j0 = min(int(si), in_h - 1), min(int(sj), in_w - 1)
            i1, j1 = min(i0 + 1, in_h - 1), min(j0 + 1, in_w - 1)
            fi, fj = si - i0, sj - j0
            out[:, :, i, j] = (
                t[:, :, i0, j0] * (1 - fi) * (1 - fj)
                + t[:, :, i1, j0] * fi * (1 - fj)
                + t[:, :, i0, j1] * (1 - fi) * fj
                + t[:, :, i1, j1] * fi * fj)
    return out


def test_executor_matches_torch_oracle():
    pb, tensors = _mini_graph()
    nodes = parse_graphdef(pb)
    exe = TFGraphExecutor(nodes, feed="ExpandDims", fetches=["pool_3"])
    rng = np.random.RandomState(1)
    x = rng.rand(3, 8, 8, 3).astype(np.float32) * 255
    got = np.asarray(exe(jnp.asarray(x))[0])
    want = _torch_oracle(tensors, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_official_evaluator_end_to_end(tmp_path):
    pb, tensors = _mini_graph(2)
    path = tmp_path / "classify_image_graph_def.pb"
    path.write_bytes(pb)
    ev = OfficialTF1Evaluator(str(path))
    rng = np.random.RandomState(3)
    imgs = rng.rand(20, 8, 8, 3).astype(np.float32) * 2 - 1  # [-1,1]
    out = evaluate_images(ev, imgs, batch=8, splits=2)
    assert out["pool"].shape == (20, 8)
    assert out["mu"].shape == (8,) and out["sigma"].shape == (8, 8)
    assert np.isfinite(out["IS_mean"]) and out["IS_mean"] >= 1.0
    # softmax weights were pulled from the graph, not recomputed
    pool, preds = ev(np.uint8(255 * (imgs[:4] + 1) / 2).astype(np.float32))
    logits = pool @ tensors["sm_w"]
    want = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    np.testing.assert_allclose(preds, want, rtol=1e-4, atol=1e-5)


def test_official_inception_score_formula():
    rng = np.random.RandomState(4)
    preds = rng.dirichlet(np.ones(10), size=40).astype(np.float32)
    m, s = official_inception_score(preds, splits=4)
    # direct re-computation (inception_tf13.py:148-159)
    scores = []
    for i in range(4):
        part = preds[i * 10:(i + 1) * 10]
        kl = part * (np.log(part) - np.log(np.expand_dims(np.mean(part, 0), 0)))
        scores.append(np.exp(np.mean(np.sum(kl, 1))))
    assert abs(m - np.mean(scores)) < 1e-6
    assert abs(s - np.std(scores)) < 1e-6


def test_missing_pb_raises(monkeypatch):
    monkeypatch.delenv("ICGAN_TF_INCEPTION_PB", raising=False)
    with pytest.raises(FileNotFoundError):
        OfficialTF1Evaluator()


def test_official_eval_cli_end_to_end(tmp_path):
    """cli/official_eval: samples.npz → IS + TF_pool.npz; then the fid_a/b
    moment-file mode (inception_tf13.py flow + FID tail)."""
    from ic_gan_tpu.cli import official_eval

    pb, _ = _mini_graph(7)
    pb_path = tmp_path / "graph.pb"
    pb_path.write_bytes(pb)

    rng = np.random.RandomState(8)
    x = (rng.rand(12, 3, 8, 8) * 255).astype(np.uint8)  # NCHW uint8 export
    np.savez(tmp_path / "samples.npz", x=x)

    out = official_eval.main([
        "--set", f"samples={tmp_path/'samples.npz'}",
        f"pb_path={pb_path}", f"out_dir={tmp_path}", "batch_size=5",
    ])
    assert np.isfinite(out["IS_mean"])
    pool_npz = np.load(tmp_path / "TF_pool.npz")
    assert pool_npz["mu"].shape == (8,)

    # second "dataset": shifted samples → nonzero FID between moment files
    np.savez(tmp_path / "samples2.npz",
             x=np.clip(x.astype(np.int32) + 40, 0, 255).astype(np.uint8))
    official_eval.main([
        "--set", f"samples={tmp_path/'samples2.npz'}",
        f"pb_path={pb_path}", f"out_dir={tmp_path}", "pool_npz=TF_pool2.npz",
        "batch_size=5",
    ])
    res = official_eval.main([
        "--set", f"fid_a={tmp_path/'TF_pool.npz'}",
        f"fid_b={tmp_path/'TF_pool2.npz'}",
    ])
    assert res["FID"] > 0


def test_official_eval_ground_truth_stratified(tmp_path):
    """GT mode: read the _xy.hdf5, write the reference's moment filename,
    plus ImageNet-LT many/low/few stratified moments
    (inception_tf13.py:271-320)."""
    import h5py

    from ic_gan_tpu.cli import official_eval

    pb, _ = _mini_graph(12)
    pb_path = tmp_path / "graph.pb"
    pb_path.write_bytes(pb)

    rng = np.random.RandomState(13)
    n = 30
    imgs = rng.randint(0, 255, (n, 3, 8, 8), dtype=np.uint8)
    labels = rng.randint(0, 3, n)
    with h5py.File(tmp_path / "ILSVRC8_val_xy.hdf5", "w") as f:
        f.create_dataset("imgs", data=imgs)
        f.create_dataset("labels", data=labels)
    # class 0: many (>=100), class 1: low (21..99), class 2: few (<=20)
    np.save(tmp_path / "spc.npy", np.asarray([150, 50, 10]))

    out = official_eval.main([
        "--set", "use_ground_truth_data=1", f"data_root={tmp_path}",
        "which_dataset=imagenet_lt", "resolution=8", "split=val",
        f"pb_path={pb_path}", f"out_dir={tmp_path}", "batch_size=16",
        f"samples_per_class_path={tmp_path/'spc.npy'}",
    ])
    assert np.isfinite(out["IS_mean"])
    base = np.load(tmp_path / "imagenet_lt_val_res8_tf_inception_moments_ground_truth.npz")
    assert base["mu"].shape == (8,)
    for strat in ("_many", "_low", "_few"):
        m = np.load(tmp_path /
                    f"imagenet_lt_res8_tf_inception_moments_ground_truth{strat}.npz")
        assert m["mu"].shape == (8,) and np.isfinite(m["mu"]).all()


def test_tensorproto_splat_and_packed_values():
    """Parser edge cases the frozen graphs use: splat-encoded constants
    (single float_val broadcast over the shape) and packed int lists."""
    from ic_gan_tpu.io.graphdef import (
        _decode_tensor, _ld, _tag, _varint, encode_node,
    )
    import struct

    # splat: dtype float, shape (2,3), one float_val
    payload = (_tag(1, 0) + _varint(1)
               + _ld(2, _ld(2, _tag(1, 0) + _varint(2))
                     + _ld(2, _tag(1, 0) + _varint(3)))
               + _tag(5, 5) + struct.pack("<f", 2.5))
    arr = _decode_tensor(payload)
    assert arr.shape == (2, 3)
    np.testing.assert_array_equal(arr, np.full((2, 3), 2.5, np.float32))

    # negative int64 attr round-trips through two's-complement varint
    node = encode_node("n", "Op", [], {"i": {"i": -7}})
    parsed = parse_graphdef(b"\x0a" + bytes([len(node)]) + node)
    assert parsed[0].attrs["i"].i == -7
