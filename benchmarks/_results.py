"""Machine-readable bench artifacts: every bench records its numbers to
``benchmarks/results/<name>.json`` so README perf claims are auditable and
regression-checkable in-tree.  Regenerate everything with
``python benchmarks/run_all.py`` (real TPU).
"""

from __future__ import annotations

import json
import os
import time

import jax

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")


def record(name: str, **fields):
    """Write one bench result JSON (atomic, sorted keys, with environment
    provenance)."""
    os.makedirs(RESULTS_DIR, exist_ok=True)
    payload = dict(fields)
    payload["_bench"] = name
    payload["_backend"] = jax.default_backend()
    try:
        payload["_device"] = jax.devices()[0].device_kind
    except Exception:
        payload["_device"] = "unknown"
    payload["_date"] = time.strftime("%Y-%m-%d")
    path = os.path.join(RESULTS_DIR, f"{name}.json")
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True, default=float)
        f.write("\n")
    os.replace(tmp, path)
    print(f"[results] wrote {path}")
    return path


def enable_compile_cache():
    """Persistent XLA compile cache — relay TPU compiles are minutes cold,
    seconds warm.  One place so every bench uses the same path/threshold."""
    import os as _os

    jax.config.update("jax_compilation_cache_dir",
                      _os.path.expanduser("~/.cache/ic_gan_tpu/xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
