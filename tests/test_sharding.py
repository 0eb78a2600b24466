"""Multi-device sharding tests on the virtual 8-CPU mesh: the shard_map'd Pallas
rasterizer (interpret mode on CPU) and the batched train step built over a
("data", "gauss") mesh match the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_splat.core.splat import init_from_pointcloud
from tpu_splat.ops.rasterize import rasterize
from tpu_splat.parallel.mesh import make_mesh, shard_train_state
from tpu_splat.parallel.raster_mc import render_batch_mc
from tpu_splat.parallel.step import make_batched_train_step
from tpu_splat.training.train_step import (
    RasterPlan, StepConfig, init_train_state, refine_step, train_step)

from utils import make_camera


def _setup(batch=2, capacity=256, size=32):
    rng = np.random.default_rng(11)
    pts = rng.normal(0, 0.8, (100, 3)).astype(np.float32)
    pts[:, 2] += 5
    splat = init_from_pointcloud(
        pts, rng.random((100, 3), np.float32), np.array([0, 0, 5.0]), capacity=capacity
    )
    ts = init_train_state(splat, seed=3)
    cam = make_camera(size, size)
    gts = jnp.asarray(rng.random((batch, 3, size, size), np.float32))
    w2cs = jnp.tile(jnp.asarray(cam["w2c"])[None], (batch, 1, 1))
    cpos = jnp.tile(jnp.asarray(cam["cam_position"])[None], (batch, 1))
    intr = jnp.tile(
        jnp.asarray([cam["fx"], cam["fy"], size / 2.0, size / 2.0], jnp.float32)[None],
        (batch, 1),
    )
    plan = RasterPlan(1 << 13, 256, chunk=128, tile_size=16)
    kwargs = dict(width=size, height=size, plan=plan, opt=StepConfig(),
                  total_iterations=100)
    return ts, (gts, w2cs, cpos, intr, jnp.zeros(3)), kwargs, cam


def test_mesh_shapes():
    mesh = make_mesh(jax.devices(), data=2)
    assert mesh.shape == {"data": 2, "gauss": 4}


def test_mc_render_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    ts, (gts, w2cs, cpos, intr, bg), kwargs, cam = _setup()
    splat = ts.splat
    plan = kwargs["plan"]

    ref = rasterize(
        splat.means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
        splat.sh0, splat.shN, splat.alive,
        w2cs[0], cpos[0], intr[0, 0], intr[0, 1], intr[0, 2], intr[0, 3],
        2, bg, width=32, height=32,
        max_instances=plan.max_instances, k_max=plan.k_max, chunk=128, tile_size=16,
        backend="xla",
    )
    mesh = make_mesh(jax.devices(), data=2)
    imgs, alphas, tots, mxts, *_ = render_batch_mc(
        mesh, splat.params(), splat.alive,
        jnp.zeros((2, splat.capacity, 2), jnp.float32),
        w2cs, cpos, intr, 2, bg, width=32, height=32, plan=plan, batch=2,
    )
    assert imgs.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(np.asarray(imgs[0]), np.asarray(ref.image), atol=5e-5)
    np.testing.assert_allclose(np.asarray(imgs[1]), np.asarray(ref.image), atol=5e-5)
    # windowed per-chip tile counts cover the same instances
    assert int(jnp.max(mxts)) <= plan.k_max

    # pre-all-gather compaction branch: capacity 512 over gauss=4 -> 128 rows/shard,
    # all 100 live gaussians land in shard 0 -> budget 112 (>= visible, < shard rows)
    # takes the compacted path and must render identically, with dead compaction slots
    # gathering distinct masked rows. (An insufficient budget DROPS rows by design —
    # the trainer grows gather_budget and redoes, like the instance budget.)
    ts2, (gts2, w2cs2, cpos2, intr2, bg2), kwargs2, _ = _setup(capacity=512)
    splat2 = ts2.splat
    plan_c = RasterPlan(plan.max_instances, plan.k_max, chunk=128, tile_size=16,
                        gather_budget=112)
    imgs_c, _, _, _, _, nshard, _ = render_batch_mc(
        mesh, splat2.params(), splat2.alive,
        jnp.zeros((2, splat2.capacity, 2), jnp.float32),
        w2cs2, cpos2, intr2, 2, bg2, width=32, height=32, plan=plan_c, batch=2,
    )
    assert int(jnp.max(nshard)) <= 112  # budget sufficient: no dropped rows
    np.testing.assert_allclose(np.asarray(imgs_c[0]), np.asarray(ref.image), atol=5e-5)


def test_batched_step_matches_single_step():
    ts, (gts, w2cs, cpos, intr, bg), kwargs, cam = _setup()
    # reference: one single-camera step (identical cameras in the batch -> same grads)
    ts1, stats1 = train_step(
        ts, gts[0], w2cs[0], cpos[0],
        intr[0, 0], intr[0, 1], intr[0, 2], intr[0, 3], bg, jnp.int32(0), **kwargs
    )
    # batch of two identical samples over the mesh
    gts2 = jnp.stack([gts[0], gts[0]])
    mesh = make_mesh(jax.devices(), data=2)
    ts_sh = shard_train_state(mesh, ts)
    step = make_batched_train_step(mesh)
    dsh = NamedSharding(mesh, P("data"))
    ts2, stats2 = step(
        ts_sh, jax.device_put(gts2, NamedSharding(mesh, P("data", None, None, None))),
        jax.device_put(w2cs, dsh), jax.device_put(cpos, dsh), jax.device_put(intr, dsh),
        bg, **kwargs,
    )
    l1, l2 = float(stats1.loss), float(stats2.loss)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) < 1e-4, (l1, l2)
    np.testing.assert_allclose(
        np.asarray(ts1.splat.means), np.asarray(ts2.splat.means), atol=1e-5, rtol=1e-4
    )


def test_batched_gut_matches_single_step():
    """GUT (distorted pinhole) under --batch-size: the mesh path with per-camera
    traced distortion matches the single-camera GUT train_step (VERDICT r2 task 5)."""
    from tpu_splat.ops.cameras import CameraParams

    ts, (gts, w2cs, cpos, intr, bg), kwargs, cam = _setup()
    cp = CameraParams(radial=(0.05, -0.01, 0, 0, 0, 0), tangential=(0.001, 0.0))
    cfg = StepConfig(gut=True, cam_params=CameraParams())  # static base, traced coeffs
    kwargs = dict(kwargs, opt=cfg)
    d12 = jnp.asarray(cp.coeff_vector())

    ts1, stats1 = train_step(
        ts, gts[0], w2cs[0], cpos[0],
        intr[0, 0], intr[0, 1], intr[0, 2], intr[0, 3], bg, jnp.int32(0), d12, **kwargs
    )
    gts2 = jnp.stack([gts[0], gts[0]])
    mesh = make_mesh(jax.devices(), data=2)
    ts_sh = shard_train_state(mesh, ts)
    step = make_batched_train_step(mesh)
    dsh = NamedSharding(mesh, P("data"))
    ts2, stats2 = step(
        ts_sh, jax.device_put(gts2, NamedSharding(mesh, P("data", None, None, None))),
        jax.device_put(w2cs, dsh), jax.device_put(cpos, dsh), jax.device_put(intr, dsh),
        bg, jnp.zeros((2,), jnp.int32), jnp.stack([d12, d12]), **kwargs,
    )
    l1, l2 = float(stats1.loss), float(stats2.loss)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) < 1e-4, (l1, l2)
    np.testing.assert_allclose(
        np.asarray(ts1.splat.means), np.asarray(ts2.splat.means), atol=1e-4, rtol=1e-4
    )


def test_batched_pose_bilateral_matches_single_step():
    """Pose-opt + bilateral grid under --batch-size match the single-camera step
    (VERDICT r2 task 7): same losses, same component-optimizer updates."""
    from tpu_splat.core.config import OptimizationParameters
    from tpu_splat.core.splat import init_from_pointcloud
    import numpy as _np

    rng = np.random.default_rng(11)
    pts = rng.normal(0, 0.8, (100, 3)).astype(np.float32)
    pts[:, 2] += 5
    splat = init_from_pointcloud(
        pts, rng.random((100, 3), np.float32), np.array([0, 0, 5.0]), capacity=256
    )
    op = OptimizationParameters(
        pose_optimization="direct", use_bilateral_grid=True,
        bilateral_grid_X=4, bilateral_grid_Y=4, bilateral_grid_W=4,
    )
    ts = init_train_state(splat, seed=3, n_train_images=4, opt=op)
    cam = make_camera(32, 32)
    size, batch = 32, 2
    gt0 = jnp.asarray(rng.random((3, size, size), np.float32))
    gts = jnp.stack([gt0, gt0])
    w2cs = jnp.tile(jnp.asarray(cam["w2c"])[None], (batch, 1, 1))
    cpos = jnp.tile(jnp.asarray(cam["cam_position"])[None], (batch, 1))
    intr = jnp.tile(
        jnp.asarray([cam["fx"], cam["fy"], 16.0, 16.0], jnp.float32)[None], (batch, 1)
    )
    bg = jnp.zeros(3)
    plan = RasterPlan(1 << 13, 256, chunk=128, tile_size=16)
    cfg = StepConfig(pose_optimization="direct", use_bilateral_grid=True,
                     tv_loss_weight=10.0)
    kwargs = dict(width=size, height=size, plan=plan, opt=cfg, total_iterations=100)

    ts1, stats1 = train_step(
        ts, gt0, w2cs[0], cpos[0],
        intr[0, 0], intr[0, 1], intr[0, 2], intr[0, 3], bg, jnp.int32(1), **kwargs
    )
    mesh = make_mesh(jax.devices(), data=2)
    ts_sh = shard_train_state(mesh, ts)
    step = make_batched_train_step(mesh)
    dsh = NamedSharding(mesh, P("data"))
    ts2, stats2 = step(
        ts_sh, jax.device_put(gts, NamedSharding(mesh, P("data", None, None, None))),
        jax.device_put(w2cs, dsh), jax.device_put(cpos, dsh), jax.device_put(intr, dsh),
        bg, jnp.ones((2,), jnp.int32), **kwargs,
    )
    assert abs(float(stats1.loss) - float(stats2.loss)) < 1e-4
    np.testing.assert_allclose(
        np.asarray(ts1.pose_params["embeddings"]),
        np.asarray(ts2.pose_params["embeddings"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ts1.bilateral_grids), np.asarray(ts2.bilateral_grids),
        atol=1e-5, rtol=1e-4,
    )


def test_batched_adc_accumulation_matches_sequential():
    """ADC densification info under batching reproduces single-path accumulation
    (VERDICT r2 task 9): a batch of two DIFFERENT cameras accumulates exactly the
    sum of the two single-camera steps' densification terms from the same state."""
    ts, (gts, w2cs, cpos, intr, bg), kwargs, cam = _setup()
    cfg = StepConfig(strategy="default")
    kwargs = dict(kwargs, opt=cfg)
    # second camera: shifted/rotated viewpoint of the same cloud
    th = 0.15
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
                 np.float32)
    p2 = np.array([0.8, 0.2, 0.3], np.float32)
    w2c2 = np.eye(4, dtype=np.float32)
    w2c2[:3, :3] = R
    w2c2[:3, 3] = -R @ p2
    w2cs = jnp.stack([w2cs[0], jnp.asarray(w2c2)])
    cpos = jnp.stack([cpos[0], jnp.asarray(p2)])

    # single-camera accumulation terms, each from the SAME starting state
    base_cnt, base_g2d = np.asarray(ts.dens_count), np.asarray(ts.dens_grad2d)
    ts_a, _ = train_step(
        ts, gts[0], w2cs[0], cpos[0],
        intr[0, 0], intr[0, 1], intr[0, 2], intr[0, 3], bg, jnp.int32(0), **kwargs
    )
    ts_b, _ = train_step(
        ts, gts[1], w2cs[1], cpos[1],
        intr[1, 0], intr[1, 1], intr[1, 2], intr[1, 3], bg, jnp.int32(1), **kwargs
    )
    want_cnt = np.asarray(ts_a.dens_count) + np.asarray(ts_b.dens_count) - base_cnt
    want_g2d = np.asarray(ts_a.dens_grad2d) + np.asarray(ts_b.dens_grad2d) - base_g2d

    mesh = make_mesh(jax.devices(), data=2)
    ts_sh = shard_train_state(mesh, ts)
    step = make_batched_train_step(mesh)
    dsh = NamedSharding(mesh, P("data"))
    ts2, _ = step(
        ts_sh, jax.device_put(gts, NamedSharding(mesh, P("data", None, None, None))),
        jax.device_put(w2cs, dsh), jax.device_put(cpos, dsh), jax.device_put(intr, dsh),
        bg, **kwargs,
    )
    np.testing.assert_allclose(np.asarray(ts2.dens_count), want_cnt, atol=1e-6)
    # rtol headroom: batched and sequential are *differently compiled* graphs; the
    # flat-column covariance chain reassociates FP ops enough for ~3e-3 relative drift
    # on isolated elements of the grad-magnitude accumulation
    np.testing.assert_allclose(
        np.asarray(ts2.dens_grad2d), want_g2d, atol=1e-5, rtol=6e-3
    )


def test_batched_multi_step_with_refine():
    ts, args, kwargs, _ = _setup()
    mesh = make_mesh(jax.devices(), data=2)
    ts = shard_train_state(mesh, ts)
    step = make_batched_train_step(mesh)
    for _ in range(3):
        ts, stats = step(ts, *args, **kwargs)
        assert np.isfinite(float(stats.loss))
    ts, info = refine_step(ts, min_opacity=0.005, max_cap=200)
    assert int(info["n_alive"]) >= 100
    ts, stats = step(ts, *args, **kwargs)
    assert np.isfinite(float(stats.loss))


def test_trainer_batched_product_path(tmp_path):
    """The --batch-size product surface: Trainer builds the mesh, shards state, and
    trains through the shard_map'd Pallas rasterizer."""
    from synth_data import make_synthetic_colmap
    from tpu_splat.core.config import (
        DatasetConfig, OptimizationParameters, TrainingParameters)
    from tpu_splat.training.trainer import Trainer

    base = tmp_path / "ds"
    make_synthetic_colmap(base, n_gauss=60, n_cams=4, size=32, seed=2)
    opt = OptimizationParameters(
        iterations=4, batch_size=2, max_cap=256, sh_degree=1,
        eval_steps=[], save_steps=[], stop_refine=2, lambda_dssim=0.0,
    )
    params = TrainingParameters(
        dataset=DatasetConfig(data_path=str(base), output_path=str(tmp_path / "out"),
                              test_every=100),
        optimization=opt,
    )
    tr = Trainer(params)
    assert tr.mesh is not None and tr.mesh.shape == {"data": 2, "gauss": 4}
    tr.train(progress_every=1000)
    assert (tmp_path / "out" / "splat_final.ply").exists()
