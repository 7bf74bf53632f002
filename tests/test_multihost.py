"""Multi-host (pod) data parallelism, exercised locally by spawning two
processes with 4 virtual CPU devices each — the same pattern the reference
uses to test DDP without a cluster (mp.spawn + file:// rendezvous,
stylegan2_ada_pytorch/train.py:616-633; SURVEY.md §4).

Asserts: a jitted IC-GAN train step runs over the global 8-device mesh with
per-host batch feeding (jax.make_array_from_process_local_data) and leaves
IDENTICAL parameters on both processes.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import sys
import numpy as np
import jax

jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_platforms", "cpu")

port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from ic_gan_tpu.parallel.mesh import (
    distributed_init, is_main_process, local_batch_size, make_mesh,
    replicated, shard_batch,
)

assert distributed_init(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2 and jax.device_count() == 8

import jax.numpy as jnp
from ic_gan_tpu.models.biggan import BigGANConfig, Generator, Discriminator
from ic_gan_tpu.train.state import GANTrainState
from ic_gan_tpu.train.step import TrainConfig, make_train_step

mcfg = BigGANConfig(
    resolution=32, n_classes=10, G_ch=8, D_ch=8, dim_z=20, G_attn="0",
    D_attn="0", shared_dim=16, shared_dim_feat=24, instance_sz=32,
)
tcfg = TrainConfig(num_D_steps=1, num_D_accumulations=2,
                   num_G_accumulations=2, ema_start=0)
g, d = Generator(mcfg), Discriminator(mcfg)

GLOBAL_MB = 16
mb_local = local_batch_size(GLOBAL_MB)
assert mb_local == 8

rng = jax.random.PRNGKey(0)
z = jnp.zeros((2, mcfg.effective_dim_z))
feats = jnp.zeros((2, mcfg.instance_sz))
g_vars = g.init(rng, z, None, feats, train=True)
d_vars = d.init(rng, jnp.zeros((2, 32, 32, 3)), None, feats, train=True)
state = GANTrainState.create(g_vars, d_vars, tcfg.g_optimizer(),
                             tcfg.d_optimizer())

mesh = make_mesh()
assert mesh.devices.size == 8

repl = replicated(mesh)
state = jax.tree.map(
    lambda a: jax.make_array_from_process_local_data(repl, np.asarray(a)),
    state,
)

# Per-host data: DIFFERENT content per process (the point of pod feeding).
nD = tcfg.num_D_steps * tcfg.num_D_accumulations
host_rng = np.random.RandomState(100 + pid)
local = {
    "x": host_rng.randn(nD, mb_local, 32, 32, 3).astype(np.float32) * 0.1,
    "feats": host_rng.randn(nD, mb_local, mcfg.instance_sz).astype(np.float32),
    "gen_feats": host_rng.randn(
        nD + tcfg.num_G_accumulations, mb_local, mcfg.instance_sz
    ).astype(np.float32),
}
batch = shard_batch(mesh, local, axis=1)
assert batch["x"].shape == (nD, GLOBAL_MB, 32, 32, 3)

step = make_train_step(g.apply, d.apply, tcfg, mcfg.effective_dim_z)
with mesh:
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(new_state)

assert int(np.asarray(new_state.step)) == 1
for k, v in metrics.items():
    assert np.isfinite(float(np.asarray(v))), (k, v)

# Fully-replicated output params: fetch locally and fingerprint.
leaves = jax.tree.leaves(new_state.g_params) + jax.tree.leaves(
    new_state.d_params
)
digest = np.asarray(
    [float(np.asarray(l, np.float64).sum()) for l in leaves]
)
np.save(out_path, digest)
print("WORKER_OK", pid, is_main_process())
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    # Avoid inheriting the 8-device flag from conftest: the worker sets its
    # own 4-device count via jax.config before backend init.
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i),
             str(tmp_path / f"digest{i}.npy")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out
    d0 = np.load(tmp_path / "digest0.npy")
    d1 = np.load(tmp_path / "digest1.npy")
    np.testing.assert_array_equal(d0, d1)
    assert np.isfinite(d0).all()
