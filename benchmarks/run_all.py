"""Run every benchmark sequentially and collect ``benchmarks/results/*.json``.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/run_all.py

Each bench runs in its own subprocess (fresh XLA client — the relay backend
holds per-process state) and writes its own result JSON via
``benchmarks._results.record``.  Pass bench names to run a subset:

    python benchmarks/run_all.py bench_train_step bench_eval_fid
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# Order: cheapest first; each entry is (module, args).
BENCHES = [
    ("bench_attention", []),
    ("bench_ada_warp", []),
    ("bench_dataloader", []),
    ("bench_train_step", []),
    ("bench_train_attribution", []),
    ("bench_sampling_breakdown", []),
    ("bench_batch_sweep", []),
    ("bench_conv_ceiling", []),
    ("bench_sg2_train", []),
    ("bench_sg2_attribution", []),
    ("bench_eval_fid", []),
]


def main(selected=None):
    env = dict(os.environ)
    root = os.path.dirname(HERE)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    failures = []
    for name, args in BENCHES:
        if selected and name not in selected:
            continue
        print(f"\n=== {name} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, f"{name}.py"), *args],
            env=env,
        )
        if proc.returncode != 0:
            failures.append(name)
            print(f"[run_all] {name} FAILED ({proc.returncode})", flush=True)
    if failures:
        sys.exit(f"failed: {failures}")
    print("\nall benches done; results in benchmarks/results/")


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
