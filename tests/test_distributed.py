"""Multi-host training exercised for real: 2 OS processes, a coordinator on
localhost, 4 virtual CPU devices per process, one data-parallel stage-1 step
over the global 8-device mesh through ``initialize_distributed`` +
``global_batch_slice`` + ``shard_batch`` (SURVEY §2.8 multi-host row).
"""

import os
import pathlib
import socket
import subprocess
import sys

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from image_compression_2_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from image_compression_2_tpu.parallel.distributed import (
    global_batch_slice, initialize_distributed,
)

pid = int(sys.argv[1])
initialize_distributed(coordinator_address="localhost:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4, jax.local_devices()
assert jax.device_count() == 8, jax.devices()

import numpy as np
import jax.numpy as jnp
from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
from image_compression_2_tpu.parallel import create_mesh, shard_batch
from image_compression_2_tpu.train import build_stage1

mesh = create_mesh(n_data=8)

# Tiny collective FIRST: initializes the gloo clique for the full 8-device
# mesh while both processes are within seconds of each other.  The gloo
# rendezvous has a fixed 30s timeout, and the train-step compile below can
# skew the two processes past it on a loaded single-core box.
warm = shard_batch(np.ones([4, 8], np.float32), mesh)  # local half -> global 8
with mesh:
    total = float(jax.jit(jnp.sum)(warm))
assert total == 64.0, total

res = 32
gen_cfg = GeneratorConfig.tiny(img_resolution=res)
enc_cfg = EncoderConfig.tiny(img_resolution=res, w_dim=gen_cfg.w_dim,
                             num_ws=gen_cfg.num_ws)
setup = build_stage1(enc_cfg, gen_cfg, mesh=mesh, use_lpips=True)

GLOBAL_BATCH = 8
full = np.linspace(-1.0, 1.0, GLOBAL_BATCH * res * res * 3, dtype=np.float32)
full = full.reshape(GLOBAL_BATCH, res, res, 3)
local = full[global_batch_slice(GLOBAL_BATCH)]
assert local.shape[0] == GLOBAL_BATCH // 2
batch = shard_batch(local, mesh)
assert batch.shape == (GLOBAL_BATCH, res, res, 3)  # global shape

with mesh:
    state, metrics = setup.train_step(
        setup.state, setup.gen_vars, setup.lpips_vars, setup.w_avg,
        batch, jax.random.PRNGKey(0),
    )
jax.block_until_ready(state)
assert int(state.step) == 1
vals = {{k: float(v) for k, v in sorted(metrics.items())}}
assert all(np.isfinite(v) for v in vals.values()), vals
print("METRICS", pid, vals, flush=True)
"""


def test_two_process_distributed_dp_step():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    child = _CHILD.format(repo=_REPO, port=port)

    procs = [
        subprocess.Popen([sys.executable, "-c", child, str(pid)], env=env,
                         cwd=_REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(out)

    # both processes observed the SAME global step (gradients were
    # all-reduced over the full mesh, not computed per-host)
    lines = [
        line for out in outs for line in out.splitlines()
        if line.startswith("METRICS")
    ]
    assert len(lines) == 2, outs
    m0 = lines[0].split(" ", 2)[2]
    m1 = lines[1].split(" ", 2)[2]
    assert m0 == m1, (m0, m1)
