"""2-process CPU dry run of the multi-host path: proves jax.distributed.initialize +
the global ("data","gauss") mesh + host-sharded batch feeding + cross-process
collectives compose with the batched train step.

Run: python tools/dryrun_multihost.py        (spawns 2 worker processes)
     TPU_SPLAT_MH_WORKER=... (internal worker mode)
"""

import os
import pathlib
import subprocess
import sys

ROOT = str(pathlib.Path(__file__).parents[1])


def worker(pid: int, nproc: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    sys.path.insert(0, ROOT)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_splat.parallel import distributed as dist
    from tpu_splat.parallel.mesh import state_shardings
    from tpu_splat.parallel.step import make_batched_train_step
    from tpu_splat.training.train_step import RasterPlan, StepConfig, init_train_state
    from tpu_splat.core.splat import init_from_pointcloud

    dist.initialize(f"localhost:{port}", nproc, pid)
    assert jax.device_count() == 2 * nproc, jax.device_count()
    mesh = dist.global_mesh(data=nproc)  # data=2 x gauss=2

    rng = np.random.default_rng(0)
    pts = rng.normal(0, 0.8, (64, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    splat = init_from_pointcloud(
        pts, rng.random((64, 3), np.float32), np.array([0, 0, 5.0], np.float32), 128
    )
    import dataclasses

    ts = init_train_state(splat)
    rng_raw = jax.random.key_data(ts.rng)
    ts = dataclasses.replace(ts, rng=rng_raw)  # typed PRNG keys can't cross numpy
    sh = state_shardings(mesh, ts)
    # every host holds the same full state; device_put distributes it over the mesh
    ts = jax.tree.map(
        lambda x, s: dist.make_global_array(mesh, s.spec, np.asarray(x)),
        ts, sh, is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )
    ts = dataclasses.replace(ts, rng=jax.random.wrap_key_data(ts.rng))

    w, h, f = 48, 32, 40.0
    batch = 2  # one camera per host
    sl = dist.local_batch_slice(batch)
    gts_all = np.random.default_rng(1).random((batch, 3, h, w)).astype(np.float32)
    w2c = np.eye(4, dtype=np.float32)
    gts = dist.make_global_array(mesh, P("data"), gts_all[sl])
    w2cs = dist.make_global_array(mesh, P("data"), np.tile(w2c[None], (1, 1, 1)))
    cpos = dist.make_global_array(mesh, P("data"), np.zeros((1, 3), np.float32))
    intr = dist.make_global_array(
        mesh, P("data"), np.asarray([[f, f, w / 2, h / 2]], np.float32)
    )

    step = make_batched_train_step(mesh)
    ts, stats = step(
        ts, gts, w2cs, cpos, intr, jnp.zeros(3, jnp.float32),
        width=w, height=h,
        plan=RasterPlan(max_instances=1 << 11, k_max=256, chunk=128, tile_size=16),
        opt=StepConfig(), total_iterations=100,
    )
    loss = float(stats.loss)
    assert np.isfinite(loss), loss
    print(f"[proc {pid}] multihost step OK: loss={loss:.4f} "
          f"devices={jax.device_count()} mesh={dict(mesh.shape)}", flush=True)


def main() -> None:
    if "TPU_SPLAT_MH_WORKER" in os.environ:
        pid, nproc, port = map(int, os.environ["TPU_SPLAT_MH_WORKER"].split(","))
        worker(pid, nproc, port)
        return
    nproc, port = 2, 29671
    procs = []
    for pid in range(nproc):
        env = dict(os.environ, TPU_SPLAT_MH_WORKER=f"{pid},{nproc},{port}",
                   JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen([sys.executable, __file__], env=env))
    rcs = [p.wait(timeout=900) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    print("dryrun_multihost OK (2 processes, 2x2 mesh)")


if __name__ == "__main__":
    main()
