"""HDF5 data-pipeline read throughput vs the reference's logged rates.

Reference point (BASELINE.md / ``data_utils/make_hdf5.py:178-184`` logs):
the reference pipeline reads ~102 img/s at 128² and 77-81 img/s at 256²
(chunk 500, uncompressed). Here: the framework's actual training fetch path
— h5py chunk read → native fastloader (threaded C++ uint8-CHW →
normalized float32-NHWC) → conditioning draw — on a synthetic dataset of
the same layout.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_dataloader.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_synthetic(root, res, n=2000, chunk=500):
    """``chunk`` = image chunk length: 500 is the reference layout
    (make_hdf5.py), 4 is this framework's default (prepare_data.py
    ``io_chunk``)."""
    import h5py

    rng = np.random.RandomState(0)
    xy = os.path.join(root, f"ILSVRC{res}_xy.hdf5")
    with h5py.File(xy, "w") as f:
        f.create_dataset(
            "imgs", (n, 3, res, res), dtype="uint8",
            chunks=(min(chunk, n), 3, res, res),
            data=rng.randint(0, 255, (n, 3, res, res), dtype=np.uint8))
        f.create_dataset("labels", data=rng.randint(0, 10, n))
    feats = os.path.join(root, f"ILSVRC{res}_feats_selfsupervised_resnet50.hdf5")
    with h5py.File(feats, "w") as f:
        f.create_dataset("feats", data=rng.rand(n, 64).astype(np.float32))
    nns = os.path.join(root, f"ILSVRC{res}_feats_selfsupervised_resnet50_nn_k50.hdf5")
    with h5py.File(nns, "w") as f:
        f.create_dataset("sample_nns", data=rng.randint(0, n, (n, 50)))
        f.create_dataset("sample_nns_radius", data=rng.rand(n).astype(np.float32))
    return xy, feats, nns


def bench(res, batch=64, iters=40, in_mem=False, chunk=500):
    from ic_gan_tpu.data.datasets import HDF5Dataset

    with tempfile.TemporaryDirectory() as root:
        xy, feats, nns = build_synthetic(root, res, chunk=chunk)
        ds = HDF5Dataset(xy, feats, nns, load_in_mem_images=in_mem,
                         feature_dim=64)
        rng = np.random.RandomState(1)

        def one_batch():
            idxs = rng.randint(0, len(ds), batch)
            imgs = ds._prepare_images(idxs)
            lab, f = ds.sample_conditioning_instance_balance(batch)
            return imgs

        one_batch()  # warm (open file, allocate buffer)
        t0 = time.perf_counter()
        for _ in range(iters):
            one_batch()
        dt = (time.perf_counter() - t0) / iters
        rate = batch / dt
        src = "in-mem" if in_mem else f"h5 chunk{chunk}"
        print(f"{res}^2 {src}: {rate:8.0f} img/s ({dt*1e3:.1f} ms/batch-{batch})")
        return rate


def main():
    from _results import record

    out = {}
    for res in (128, 256):
        out[f"r{res}_chunk500_img_s"] = bench(res, chunk=500)  # reference layout
        out[f"r{res}_chunk4_img_s"] = bench(res, chunk=4)  # framework default
        out[f"r{res}_inmem_img_s"] = bench(res, in_mem=True)
    record("dataloader", **out)


if __name__ == "__main__":
    main()
