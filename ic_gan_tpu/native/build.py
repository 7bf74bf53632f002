"""JIT build + import of the native fastloader extension.

Mirrors the reference's incremental kernel-build loader
(``torch_utils/custom_ops.py:52-148``): source is hashed, compiled once into
a per-user cache directory with a lock against concurrent builds, and
imported from there.  Uses plain g++ + the CPython C API (no torch
cpp_extension / pybind11).
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import sysconfig
import time
from typing import Optional

_CACHED = None
_FAILED = False


def _cache_dir() -> str:
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "ic_gan_tpu",
    )


def build_and_import(verbose: bool = False):
    """Return the ``_fastloader`` module, building it if needed; returns None
    (and remembers the failure) if no toolchain is available."""
    global _CACHED, _FAILED
    if _CACHED is not None:
        return _CACHED
    if _FAILED:
        return None

    src_path = os.path.join(os.path.dirname(__file__), "fastloader.cpp")
    try:
        with open(src_path, "rb") as f:
            src = f.read()
        digest = hashlib.md5(src).hexdigest()[:16]
        out_dir = _cache_dir()
        os.makedirs(out_dir, exist_ok=True)
        so_path = os.path.join(out_dir, f"_fastloader_{digest}.so")

        if not os.path.exists(so_path):
            lock = so_path + ".lock"
            # File-baton against concurrent builds (ref custom_ops.py:107-120).
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                try:
                    include = sysconfig.get_paths()["include"]
                    tmp = so_path + ".tmp.so"
                    cmd = [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        f"-I{include}", src_path, "-o", tmp, "-pthread",
                    ]
                    subprocess.run(cmd, check=True, capture_output=not verbose)
                    os.replace(tmp, so_path)
                finally:
                    os.unlink(lock)
            except FileExistsError:
                # Another process is building; wait for it.
                for _ in range(600):
                    if os.path.exists(so_path):
                        break
                    time.sleep(0.1)

        spec = importlib.util.spec_from_file_location("_fastloader", so_path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        _CACHED = module
        return module
    except Exception as e:  # toolchain missing, compile error, …
        if verbose:
            print(f"fastloader build failed ({e}); using numpy fallback")
        _FAILED = True
        return None


def normalize_batch(imgs_u8_chw, hflip_mask=None, apply_norm: bool = True,
                    out=None):
    """uint8 (B, C, H, W) → float32 (B, H, W, C) in [-1, 1]; numpy fallback
    when the native module is unavailable."""
    import numpy as np

    imgs_u8_chw = np.ascontiguousarray(imgs_u8_chw)
    B, C, H, W = imgs_u8_chw.shape
    mod = build_and_import()
    if out is None:
        out = np.empty((B, H, W, C), np.float32)
    if mod is not None:
        flip = (
            None
            if hflip_mask is None
            else np.ascontiguousarray(hflip_mask, np.uint8)
        )
        mod.normalize_batch(
            imgs_u8_chw, out, flip if flip is not None else None,
            B, C, H, W, bool(apply_norm),
        )
        return out
    # Fallback.
    x = np.transpose(imgs_u8_chw, (0, 2, 3, 1)).astype(np.float32)
    if hflip_mask is not None:
        m = np.asarray(hflip_mask, bool)
        x[m] = x[m, :, ::-1]
    if apply_norm:
        x = (x / 255.0 - 0.5) * 2.0
    out[...] = x
    return out


def gather_rows(src: "np.ndarray", indices) -> "np.ndarray":
    """float32 row gather (feature-bank lookup); numpy fallback."""
    import numpy as np

    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(indices, np.int64).reshape(-1)
    mod = build_and_import()
    if mod is None:
        return src[idx]
    out = np.empty((len(idx), src.shape[1]), np.float32)
    mod.gather_rows(src, idx, out, src.shape[0], src.shape[1], len(idx))
    return out
