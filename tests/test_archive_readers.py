"""Archive input readers for prepare_data (ref ``dataset_tool.py:69-343``)
and the pure-Python LMDB reader underneath the LSUN path.

The LMDB fixtures are built from raw bytes per the upstream ``mdb.c`` page
layout (64-bit little-endian): meta pages with txnid-based liveness, leaf
pages, a branch root, F_BIGDATA overflow values spanning pages.  The writer
here is derived independently from the format spec (struct offsets spelled
out below), so it cross-checks the reader's parsing rather than mirroring
its code.
"""

import gzip
import io
import json
import os
import pickle
import struct
import tarfile
import zipfile

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image

from ic_gan_tpu.data.archive_readers import (
    as_chw_batches,
    open_cifar10,
    open_image_zip,
    open_lsun_lmdb,
    open_mnist,
    open_source,
)
from ic_gan_tpu.io.lmdb_reader import LMDBReader

# ---------------------------------------------------------------- LMDB fixture

MAGIC = 0xBEEFC0DE
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
PSIZE = 4096


def _hdr(pgno, flags, lower=0, upper=0, pages=None):
    # MDB_page: mp_pgno(8) mp_pad(2) mp_flags(2) then the union
    # {pb_lower(2)+pb_upper(2)} | pb_pages(4) at offset 12.
    if pages is not None:
        return struct.pack("<QHHI", pgno, 0, flags, pages)
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _leaf_page(pgno, items):
    """items: (key, value bytes) or (key, ("big", ovpgno, dsize))."""
    base = 16 + 2 * len(items)
    ptrs, nodes = [], b""
    for key, val in items:
        ptrs.append(base + len(nodes))
        # MDB_node: mn_lo(2) mn_hi(2) mn_flags(2) mn_ksize(2) key [data]
        if isinstance(val, tuple):
            _, ovpg, dsize = val
            nodes += struct.pack(
                "<HHHH", dsize & 0xFFFF, dsize >> 16, F_BIGDATA, len(key)
            ) + key + struct.pack("<Q", ovpg)
        else:
            nodes += struct.pack(
                "<HHHH", len(val) & 0xFFFF, len(val) >> 16, 0, len(key)
            ) + key + val
    body = struct.pack(f"<{len(ptrs)}H", *ptrs) + nodes
    page = _hdr(pgno, P_LEAF, lower=16 + 2 * len(items), upper=base) + body
    assert len(page) <= PSIZE
    return page + b"\0" * (PSIZE - len(page))


def _branch_page(pgno, children):
    """children: list of (first_key, child_pgno); pgno is 48-bit split
    across mn_lo | mn_hi<<16 | mn_flags<<32."""
    base = 16 + 2 * len(children)
    ptrs, nodes = [], b""
    for key, child in children:
        ptrs.append(base + len(nodes))
        nodes += struct.pack(
            "<HHHH", child & 0xFFFF, (child >> 16) & 0xFFFF,
            child >> 32, len(key),
        ) + key
    body = struct.pack(f"<{len(ptrs)}H", *ptrs) + nodes
    page = _hdr(pgno, P_BRANCH, lower=16 + 2 * len(children), upper=base) + body
    return page + b"\0" * (PSIZE - len(page))


def _meta_page(pgno, txnid, root, entries, last_pg, main_flags=0, depth=1):
    # MDB_meta: magic(4) version(4) address(8) mapsize(8) dbs[2] last_pg(8)
    # txnid(8); MDB_db: pad(4) flags(2) depth(2) branch(8) leaf(8) ovf(8)
    # entries(8) root(8).
    meta = struct.pack("<IIQQ", MAGIC, 1, 0, PSIZE * (last_pg + 1))
    free_db = struct.pack("<IHHQQQQq", PSIZE, 0, 0, 0, 0, 0, 0, -1)
    main_db = struct.pack(
        "<IHHQQQqq", 0, main_flags, depth, 0, 0, 0, entries, root
    )
    tail = struct.pack("<Qq", last_pg, txnid)
    page = _hdr(pgno, P_META) + meta + free_db + main_db + tail
    return page + b"\0" * (PSIZE - len(page))


def build_lmdb(path, items, per_leaf=None, live_slot=1, main_flags=0):
    """Write an LMDB env dir holding ``items`` in the main DB; the other
    meta slot is a stale empty-tree txn the reader must skip."""
    os.makedirs(path, exist_ok=True)
    items = list(items)
    per_leaf = per_leaf or max(len(items), 1)
    next_pg = 2
    extra_pages = {}  # pgno -> bytes (may span multiple page slots)
    resolved = []
    for k, v in items:
        if len(v) > PSIZE // 8:  # inline values must fit per_leaf to a page
            npg = (16 + len(v) + PSIZE - 1) // PSIZE
            blob = _hdr(next_pg, P_OVERFLOW, pages=npg) + v
            extra_pages[next_pg] = blob + b"\0" * (npg * PSIZE - len(blob))
            resolved.append((k, ("big", next_pg, len(v))))
            next_pg += npg
        else:
            resolved.append((k, v))
    leaves = []
    for i in range(0, len(resolved), per_leaf):
        chunk = resolved[i : i + per_leaf]
        extra_pages[next_pg] = _leaf_page(next_pg, chunk)
        leaves.append((chunk[0][0], next_pg))
        next_pg += 1
    if not items:
        root, depth = -1, 0
    elif len(leaves) == 1:
        root, depth = leaves[0][1], 1
    else:
        root, depth = next_pg, 2
        extra_pages[next_pg] = _branch_page(next_pg, leaves)
        next_pg += 1
    last_pg = next_pg - 1
    live = _meta_page(live_slot, 2, root, len(items), last_pg,
                      main_flags=main_flags, depth=depth)
    stale = _meta_page(1 - live_slot, 1, -1, 0, 1)
    metas = (stale, live) if live_slot == 1 else (live, stale)
    buf = bytearray(next_pg * PSIZE)
    buf[0:PSIZE] = metas[0]
    buf[PSIZE : 2 * PSIZE] = metas[1]
    for pg, blob in extra_pages.items():
        buf[pg * PSIZE : pg * PSIZE + len(blob)] = blob
    with open(os.path.join(path, "data.mdb"), "wb") as f:
        f.write(bytes(buf))
    return path


def test_lmdb_single_leaf(tmp_path):
    items = [(b"a", b"alpha"), (b"b", b"beta"), (b"c", b"\x00\xffgamma")]
    build_lmdb(tmp_path / "x_lmdb", items)
    with LMDBReader(str(tmp_path / "x_lmdb")) as r:
        assert r.entries == 3
        assert list(r) == items


def test_lmdb_branch_and_overflow(tmp_path):
    rng = np.random.RandomState(0)
    items = [
        (f"k{i:04d}".encode(), rng.bytes(rng.randint(1, 9000)))
        for i in range(40)
    ]
    build_lmdb(tmp_path / "y_lmdb", items, per_leaf=7)
    with LMDBReader(str(tmp_path / "y_lmdb")) as r:
        assert r.entries == 40
        got = list(r)
    assert got == items  # b-tree walk preserves key order across leaves
    assert any(len(v) > PSIZE for _, v in items)  # overflow really exercised


@pytest.mark.parametrize("live_slot", [0, 1])
def test_lmdb_meta_liveness(tmp_path, live_slot):
    """The reader must pick the meta with the larger txnid, whichever slot
    holds it — the stale slot points at an empty tree."""
    items = [(b"only", b"row")]
    build_lmdb(tmp_path / "m_lmdb", items, live_slot=live_slot)
    with LMDBReader(str(tmp_path / "m_lmdb")) as r:
        assert list(r) == items


def test_lmdb_empty_db(tmp_path):
    build_lmdb(tmp_path / "e_lmdb", [])
    with LMDBReader(str(tmp_path / "e_lmdb")) as r:
        assert r.entries == 0
        assert list(r) == []


def test_lmdb_dupsort_rejected(tmp_path):
    build_lmdb(tmp_path / "d_lmdb", [(b"k", b"v")], main_flags=0x04)
    with pytest.raises(NotImplementedError):
        LMDBReader(str(tmp_path / "d_lmdb"))


def test_lmdb_bad_magic(tmp_path):
    p = tmp_path / "bad_lmdb"
    os.makedirs(p)
    blob = bytearray(_meta_page(0, 1, -1, 0, 1) * 2)
    blob[16] ^= 0xFF  # corrupt magic
    (p / "data.mdb").write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        LMDBReader(str(p))


# ------------------------------------------------------------- LSUN ingestion


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_open_lsun_lmdb(tmp_path, capsys):
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 255, (24, 32, 3), np.uint8) for _ in range(4)]
    items = [(f"i{i}".encode(), _png_bytes(a)) for i, a in enumerate(imgs)]
    items.insert(2, (b"junk", b"not an image at all"))
    build_lmdb(tmp_path / "bedroom_train_lmdb", items, per_leaf=2)
    n, it = open_lsun_lmdb(str(tmp_path / "bedroom_train_lmdb"))
    assert n == 5  # entry count from the meta page (pre-decode)
    rows = list(it)
    assert "skipping undecodable" in capsys.readouterr().out
    assert len(rows) == 4  # junk row skipped, like the reference
    for row, ref in zip(rows, imgs):
        assert row["label"] is None
        np.testing.assert_array_equal(row["img"], ref)


def test_open_lsun_max_images(tmp_path):
    imgs = [np.full((8, 8, 3), i, np.uint8) for i in range(5)]
    build_lmdb(
        tmp_path / "cat_train_lmdb",
        [(f"i{i}".encode(), _png_bytes(a)) for i, a in enumerate(imgs)],
    )
    n, it = open_lsun_lmdb(str(tmp_path / "cat_train_lmdb"), max_images=2)
    assert n == 2 and len(list(it)) == 2


# ------------------------------------------------------------ zip/cifar/mnist


def _make_zip(path, n=5, labeled=True, size=(16, 16)):
    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, size + (3,), np.uint8) for _ in range(n)]
    with zipfile.ZipFile(path, "w") as z:
        for i, a in enumerate(imgs):
            z.writestr(f"img{i:03d}.png", _png_bytes(a))
        z.writestr("README.txt", "not an image")
        if labeled:
            z.writestr(
                "dataset.json",
                json.dumps(
                    {"labels": [[f"img{i:03d}.png", i % 3] for i in range(n)]}
                ),
            )
    return imgs


def test_open_image_zip(tmp_path):
    imgs = _make_zip(tmp_path / "d.zip")
    n, it = open_image_zip(str(tmp_path / "d.zip"))
    rows = list(it)
    assert n == len(rows) == 5
    for i, row in enumerate(rows):
        np.testing.assert_array_equal(row["img"], imgs[i])
        assert row["label"] == i % 3


def test_open_image_zip_unlabeled_and_capped(tmp_path):
    _make_zip(tmp_path / "u.zip", labeled=False)
    n, it = open_image_zip(str(tmp_path / "u.zip"), max_images=3)
    rows = list(it)
    assert n == 3 and len(rows) == 3
    assert all(r["label"] is None for r in rows)


def _make_cifar(path, per_batch=4):
    rng = np.random.RandomState(3)
    all_imgs, all_labels = [], []
    with tarfile.open(path, "w:gz") as tar:
        for b in range(1, 6):
            data = rng.randint(0, 255, (per_batch, 3072), np.uint8)
            labels = list(rng.randint(0, 10, per_batch))
            all_imgs.append(data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
            all_labels += labels
            blob = pickle.dumps({"data": data, "labels": labels})
            info = tarfile.TarInfo(f"cifar-10-batches-py/data_batch_{b}")
            info.size = len(blob)
            tar.addfile(info, io.BytesIO(blob))
    return np.concatenate(all_imgs), np.asarray(all_labels)


def test_open_cifar10(tmp_path):
    ref_imgs, ref_labels = _make_cifar(tmp_path / "cifar-10-python.tar.gz")
    n, it = open_cifar10(str(tmp_path / "cifar-10-python.tar.gz"))
    rows = list(it)
    assert n == len(rows) == 20
    for i, row in enumerate(rows):
        assert row["img"].shape == (32, 32, 3)
        np.testing.assert_array_equal(row["img"], ref_imgs[i])
        assert row["label"] == ref_labels[i]


def _make_mnist(tmp_path, n=6):
    rng = np.random.RandomState(4)
    imgs = rng.randint(0, 255, (n, 28, 28), np.uint8)
    labels = rng.randint(0, 10, n).astype(np.uint8)
    ip = tmp_path / "train-images-idx3-ubyte.gz"
    lp = tmp_path / "train-labels-idx1-ubyte.gz"
    with gzip.open(ip, "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28) + imgs.tobytes())
    with gzip.open(lp, "wb") as f:
        f.write(struct.pack(">II", 2049, n) + labels.tobytes())
    return str(ip), imgs, labels


def test_open_mnist(tmp_path):
    ip, imgs, labels = _make_mnist(tmp_path)
    n, it = open_mnist(ip)
    rows = list(it)
    assert n == len(rows) == 6
    for i, row in enumerate(rows):
        assert row["img"].shape == (32, 32)  # zero-padded 28 -> 32
        np.testing.assert_array_equal(row["img"][2:30, 2:30], imgs[i])
        assert row["img"][0].sum() == 0
        assert row["label"] == labels[i]


# ------------------------------------------------------------------- dispatch


def test_open_source_dispatch(tmp_path):
    # Plain image folder -> None (caller uses the labeled folder walker).
    os.makedirs(tmp_path / "folder" / "class_0")
    assert open_source(str(tmp_path / "folder")) is None
    # *_lmdb dir or data.mdb presence -> LSUN reader.
    build_lmdb(tmp_path / "x_lmdb", [(b"k", _png_bytes(
        np.zeros((4, 4, 3), np.uint8)))])
    n, _ = open_source(str(tmp_path / "x_lmdb"))
    assert n == 1
    _make_zip(tmp_path / "z.zip", n=2)
    assert open_source(str(tmp_path / "z.zip"))[0] == 2
    _make_cifar(tmp_path / "cifar-10-python.tar.gz", per_batch=1)
    assert open_source(str(tmp_path / "cifar-10-python.tar.gz"))[0] == 5
    ip, _, _ = _make_mnist(tmp_path, n=3)
    assert open_source(ip)[0] == 3
    with pytest.raises(IOError, match="unrecognized"):
        open_source(str(tmp_path / "something.xyz"))


def test_as_chw_batches(tmp_path):
    ip, imgs, labels = _make_mnist(tmp_path, n=5)
    batches = list(as_chw_batches(open_mnist(ip), resolution=16, batch=2))
    assert [b[0].shape for b in batches] == [
        (2, 3, 16, 16), (2, 3, 16, 16), (1, 3, 16, 16)
    ]
    got_labels = np.concatenate([b[1] for b in batches])
    np.testing.assert_array_equal(got_labels, labels.astype(np.int64))
    # Grayscale replicated across channels.
    b0 = batches[0][0]
    np.testing.assert_array_equal(b0[:, 0], b0[:, 1])
    # Unlabeled rows become -1.
    build_lmdb(tmp_path / "u_lmdb", [(b"k", _png_bytes(
        np.zeros((16, 16, 3), np.uint8)))])
    (_, labs), = list(as_chw_batches(
        open_lsun_lmdb(str(tmp_path / "u_lmdb")), resolution=16))
    assert labs.tolist() == [-1]


def test_as_chw_batches_crop_resize(tmp_path):
    # Non-square input: center-crop the long edge then resize, matching
    # iter_image_folder / the reference's CenterCropLongEdge.
    arr = np.zeros((8, 16, 3), np.uint8)
    arr[:, 4:12] = 255  # center square
    reader = (1, iter([dict(img=arr, label=7)]))
    (imgs, labs), = list(as_chw_batches(reader, resolution=4))
    assert imgs.shape == (1, 3, 4, 4)
    assert imgs.min() == imgs.max() == 255  # crop kept only the center square
    assert labs.tolist() == [7]


def test_prepare_data_zip_source(tmp_path):
    """prepare_data end-to-end from a zip archive source (xy stage)."""
    pytest.importorskip("h5py")
    import h5py

    from ic_gan_tpu.cli import prepare_data

    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 255, (32, 32, 3), np.uint8) for _ in range(6)]
    zp = tmp_path / "src.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for i, a in enumerate(imgs):
            z.writestr(f"im{i}.png", _png_bytes(a))
        z.writestr("dataset.json", json.dumps(
            {"labels": [[f"im{i}.png", i % 2] for i in range(6)]}))
    cfg = {
        "resolution": 32, "which_dataset": "imagenet",
        "data_root": str(tmp_path / "data"), "out_path": str(tmp_path / "data"),
        "image_root": str(zp), "feature_extractor": "selfsupervised",
        "k_nn": 2, "kmeans_subsampled": 2, "max_images": 4,
    }
    argv = ["--set"] + [f"{k}={json.dumps(v)}" for k, v in cfg.items()]
    prepare_data.main(argv)
    with h5py.File(tmp_path / "data" / "ILSVRC32_xy.hdf5", "r") as f:
        assert f["imgs"].shape == (4, 3, 32, 32)  # max_images honored
        np.testing.assert_array_equal(
            f["imgs"][0], np.transpose(imgs[0], (2, 0, 1)))
        assert f["labels"][:].tolist() == [0, 1, 0, 1]
