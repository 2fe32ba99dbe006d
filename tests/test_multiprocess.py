"""A REAL multi-process jax.distributed run (VERDICT r2 #7).

Spawns 2 OS processes, each with 4 forced-host CPU devices, wires them with
jax.distributed (parallel/distributed.py::initialize_multihost), runs one
sharded train step over the global 8-device ('data','sample') mesh, and
asserts the psum'ed multi-process gradients equal the single-process
(unsharded) gradients computed in this test process. Also exercises
host_rows device-ownership (asserted inside the worker: the two processes'
row spans are disjoint and cover the image).

The reference is strictly single-process (SURVEY.md §2.7); this is the
TPU-native scaling contract: the same SPMD program on every host.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_grads_match_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "grads.npz")
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    # The axon sitecustomize registers its PJRT plugin at interpreter start
    # (initializing the XLA backend) when this var is set, which breaks
    # jax.distributed.initialize's must-be-first requirement.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", WORKER, str(pid), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker hung")
        logs.append(stdout)
    for pid, (p, lg) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{lg[-4000:]}"

    data = np.load(out)

    # Single-process (completely unsharded) reference gradients.
    import jax
    import jax.numpy as jnp

    from tracy_tpu.config import RenderConfig
    from tracy_tpu.diff import extract_params
    from tracy_tpu.diff.gradients import render_loss
    from tracy_tpu.scene.scn_parser import default_scene

    scene = default_scene(32, 32).build()
    cfg = RenderConfig(width=32, height=32, spp=2, max_bounces=2,
                       tonemap="none", accel="none", russian_roulette=False)
    params = extract_params(scene)
    target = jnp.zeros((32, 32, 3))
    frame = jnp.asarray(0, jnp.int32)
    g_single = jax.grad(render_loss)(params, scene, target, cfg, frame)

    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, g_single))
    assert len(leaves) == sum(1 for k in data.files if k.startswith("g"))
    for i, ref in enumerate(leaves):
        np.testing.assert_allclose(
            data[f"g{i}"], ref, rtol=1e-4, atol=1e-6,
            err_msg=f"gradient leaf {i} diverges across processes",
        )
