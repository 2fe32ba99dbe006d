"""Worker for the 2-process jax.distributed test (test_multiprocess.py).

Each process runs this same program (the multi-host SPMD contract,
parallel/distributed.py): initialize the distributed runtime, build the
global ('data','sample') mesh over ALL processes' devices, run ONE sharded
SGD train step, and have process 0 write the recovered gradient leaves to
an .npz for the parent test to compare against the single-process run.

Usage: python mp_worker.py <process_id> <num_processes> <port> <out.npz>
Launched with XLA_FLAGS=--xla_force_host_platform_device_count=4 so the
2-process run spans 8 global devices — the same global mesh shape as the
in-process test suite.
"""

import sys

import numpy as np


def main() -> int:
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tracy_tpu.parallel.distributed import host_rows, initialize_multihost

    ok = initialize_multihost(coordinator_address=f"localhost:{port}",
                              num_processes=nproc, process_id=pid)
    assert ok, "initialize_multihost did not enter multi-process mode"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tracy_tpu.config import RenderConfig
    from tracy_tpu.diff import extract_params
    from tracy_tpu.parallel import make_render_mesh, make_sharded_train_step
    from tracy_tpu.scene.scn_parser import default_scene

    # Identical host-side inputs on every process (SPMD contract).
    scene = default_scene(32, 32).build()
    cfg = RenderConfig(width=32, height=32, spp=2, max_bounces=2,
                       tonemap="none", accel="none", russian_roulette=False)
    mesh = make_render_mesh(4, 2)

    # host_rows: the two processes must own disjoint, covering row spans.
    rows = host_rows(cfg.height, mesh)
    spans = jax.experimental.multihost_utils.process_allgather(
        jnp.asarray(rows, jnp.int32))
    spans = np.asarray(spans).reshape(nproc, 2)
    starts = sorted(int(s) for s in spans[:, 0])
    ends = sorted(int(e) for e in spans[:, 1])
    assert starts[0] == 0 and ends[-1] == cfg.height, spans
    assert all(e > s for s, e in spans), spans

    def to_global(tree, spec=P()):
        """Host np arrays -> global jax Arrays: every process holds the FULL
        array, make_array_from_callback slices each device's shard."""
        sh = NamedSharding(mesh, spec)

        def one(x):
            x = np.asarray(x)
            if x.ndim == 0:
                return jax.make_array_from_callback(
                    x.shape, NamedSharding(mesh, P()), lambda idx: x)
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

        return jax.tree_util.tree_map(one, tree)

    sc = to_global(scene)  # replicated, like replicate_scene single-process
    params = to_global(extract_params(scene))
    target = to_global(np.zeros((32, 32, 3), np.float32),
                       P("data", None, None))
    frame = to_global(np.asarray(0, np.int32))

    # SGD(1.0): update = -grad, so params - p2 recovers the psum'ed gradient.
    step, opt_state = make_sharded_train_step(sc, cfg, mesh, optax.sgd(1.0))
    opt_state = jax.tree_util.tree_map(
        lambda x: to_global(np.asarray(x)) if hasattr(x, "shape") else x,
        opt_state)
    p2, _, loss = step(params, opt_state, target, frame)
    grads = jax.tree_util.tree_map(lambda a, b: a - b, params, p2)

    # Gradients are replicated (psum over both axes) — every process reads
    # its local copy; process 0 records them for the parent to check.
    local = jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_data(0)), grads)
    leaves = jax.tree_util.tree_leaves(local)
    if pid == 0:
        np.savez(out, loss=float(loss.addressable_data(0)),
                 **{f"g{i}": leaf for i, leaf in enumerate(leaves)})
    jax.experimental.multihost_utils.sync_global_devices("done")
    print(f"[mp_worker {pid}] ok, loss={float(loss.addressable_data(0)):.6f}",
          flush=True)
    return 0


if __name__ == "__main__":
    import jax.experimental.multihost_utils  # noqa: F401  (resolve early)

    sys.exit(main())
