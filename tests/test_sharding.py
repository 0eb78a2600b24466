"""Multi-device sharding tests on the virtual 8-CPU mesh: the batched train step compiles
and executes with gaussians sharded over 'gauss' and cameras over 'data', and matches the
unsharded single-device result."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_splat.core.splat import init_from_pointcloud
from tpu_splat.parallel.mesh import make_mesh, shard_train_state
from tpu_splat.parallel.step import batched_train_step
from tpu_splat.training.optim import init_adam_state
from tpu_splat.training.train_step import RasterPlan, StepConfig, init_train_state, refine_step

from utils import make_camera


def _setup(batch=2, capacity=256):
    rng = np.random.default_rng(11)
    pts = rng.normal(0, 0.8, (100, 3)).astype(np.float32)
    pts[:, 2] += 5
    splat = init_from_pointcloud(
        pts, rng.random((100, 3), np.float32), np.array([0, 0, 5.0]), capacity=capacity
    )
    ts = init_train_state(splat, seed=3)
    cam = make_camera(32, 32)
    gts = jnp.asarray(rng.random((batch, 3, 32, 32), np.float32))
    w2cs = jnp.tile(jnp.asarray(cam["w2c"])[None], (batch, 1, 1))
    cpos = jnp.tile(jnp.asarray(cam["cam_position"])[None], (batch, 1))
    f = jnp.full((batch,), cam["fx"], jnp.float32)
    c = jnp.full((batch,), 16.0, jnp.float32)
    args = (gts, w2cs, cpos, f, f, c, c, jnp.zeros(3))
    kwargs = dict(width=32, height=32, plan=RasterPlan(1 << 13, 256, 32),
                  opt=StepConfig(), total_iterations=100)
    return ts, args, kwargs


def test_mesh_shapes():
    mesh = make_mesh(jax.devices(), data=2)
    assert mesh.shape == {"data": 2, "gauss": 4}


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    ts, args, kwargs = _setup()

    ts1, stats1 = batched_train_step(ts, *args, **kwargs)
    loss1 = float(stats1.loss)

    mesh = make_mesh(jax.devices(), data=2)
    ts_sharded = shard_train_state(mesh, ts)
    data_sh = NamedSharding(mesh, P("data"))
    gt_sh = jax.device_put(args[0], NamedSharding(mesh, P("data", None, None, None)))
    rest = [jax.device_put(a, NamedSharding(mesh, P("data") if a.ndim >= 1 and a.shape[0] == 2 else P()))
            for a in args[1:-1]]
    ts2, stats2 = batched_train_step(ts_sharded, gt_sh, *rest, args[-1], **kwargs)
    loss2 = float(stats2.loss)

    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert abs(loss1 - loss2) < 1e-4, (loss1, loss2)
    # parameters evolve identically (up to collective reduction order)
    m1 = np.asarray(ts1.splat.means)
    m2 = np.asarray(ts2.splat.means)
    np.testing.assert_allclose(m1, m2, atol=1e-5, rtol=1e-4)


def test_sharded_multi_step_with_refine():
    ts, args, kwargs = _setup()
    mesh = make_mesh(jax.devices(), data=2)
    ts = shard_train_state(mesh, ts)
    for i in range(3):
        ts, stats = batched_train_step(ts, *args, **kwargs)
        assert np.isfinite(float(stats.loss))
    ts, info = refine_step(ts, min_opacity=0.005, max_cap=200)
    assert int(info["n_alive"]) >= 100
    ts, stats = batched_train_step(ts, *args, **kwargs)
    assert np.isfinite(float(stats.loss))
