"""Benchmark: garden-like training throughput on the real chip.

Workload mirrors the reference's quality-of-record benchmark scale (MipNeRF360 garden at
images_4: ~1297x840 px, up to 1M gaussians, MCMC config): a synthetic gaussian cloud with
realistic screen-space footprints, full train steps (render fwd+bwd, fused Adam, MCMC noise).

Baseline: the only hard wall-clock number the reference publishes is the bounty target of
30k iterations in <20 min (fused_adam.cpp:11-13) ~= 25 it/s on the bounty GPU.
vs_baseline = measured train iters/s / 25.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent compilation cache: the bench compiles ~6 large programs (probe, step,
# render, GUT, mesh) at 1-4 min each on the single-core host; caching them makes
# reruns start in seconds instead of ~20 min.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def build_workload(n_gauss: int, width: int, height: int, seed: int = 0):
    import jax.numpy as jnp

    from tpu_splat.core.splat import SplatState

    rng = np.random.default_rng(seed)
    # positions fill the frustum: z in [2, 12], xy spread to cover the image
    z = rng.uniform(2.0, 12.0, n_gauss).astype(np.float32)
    f = 0.85 * width
    x = rng.uniform(-0.55, 0.55, n_gauss).astype(np.float32) * z * (width / f)
    y = rng.uniform(-0.55, 0.55, n_gauss).astype(np.float32) * z * (height / f)
    means = np.stack([x, y, z], axis=1)
    # footprint ~ few pixels: sigma_px ~ 1.5..4 -> world sigma = sigma_px * z / f
    sigma_px = rng.uniform(1.0, 4.0, n_gauss).astype(np.float32)
    sigma = sigma_px * z / f
    scaling = np.log(np.stack([sigma, sigma * rng.uniform(0.5, 1.0, n_gauss).astype(np.float32),
                               sigma], axis=1))
    q = rng.normal(0, 1, (n_gauss, 4)).astype(np.float32)
    q[:, 0] += 2.0
    opacity = rng.normal(-1.0, 1.0, (n_gauss, 1)).astype(np.float32)
    sh0 = rng.normal(0, 0.5, (n_gauss, 1, 3)).astype(np.float32)
    shN = rng.normal(0, 0.05, (n_gauss, 15, 3)).astype(np.float32)

    splat = SplatState(
        means=jnp.asarray(means),
        sh0=jnp.asarray(sh0),
        shN=jnp.asarray(shN),
        scaling_raw=jnp.asarray(scaling.astype(np.float32)),
        rotation_raw=jnp.asarray(q),
        opacity_raw=jnp.asarray(opacity),
        alive=jnp.ones((n_gauss,), bool),
        max_sh_degree=3,
        scene_scale=3.0,
    )
    cam = dict(
        w2c=jnp.eye(4, dtype=jnp.float32),
        cam_position=jnp.zeros(3, jnp.float32),
        fx=f, fy=f, cx=width / 2.0, cy=height / 2.0,
    )
    return splat, cam


def main():
    import jax
    import jax.numpy as jnp

    from tpu_splat.training.train_step import (RasterPlan, StepConfig, init_train_state,
                                               train_step, train_step_many)

    import os

    n_gauss = int(float(os.environ.get("BENCH_GAUSSIANS", 1_000_000)))
    pack_bf16 = os.environ.get("BENCH_PACK_BF16", "1") == "1"
    width = int(os.environ.get("BENCH_WIDTH", 1296))  # garden images_4 scale
    height = int(os.environ.get("BENCH_HEIGHT", 840))
    warmup, iters = 3, int(os.environ.get("BENCH_ITERS", 20))

    splat, cam = build_workload(n_gauss, width, height)
    ts = init_train_state(splat)
    gt = jnp.asarray(np.random.default_rng(1).random((3, height, width), np.float32))

    # size the plan from a probe step
    plan = RasterPlan(max_instances=1 << 22, k_max=1 << 12, chunk=256, tile_size=32)
    kwargs = dict(width=width, height=height, plan=plan, opt=StepConfig(),
                  total_iterations=30_000)
    args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
            jnp.zeros(3, jnp.float32), jnp.int32(0))

    ts_probe, stats = train_step(ts, *args, **kwargs)
    total = int(stats.total_instances)
    ktile = int(stats.max_tile_count)

    def bucket(v, steps=16):
        # every per-instance stage (scans, gathers, sort, kernels' buffers) scales with
        # the STATIC instance budget — quantize tightly (1/16 steps)
        v = max(v, 256)
        p2 = 1 << int(np.floor(np.log2(v)))
        for i in range(steps + 1):
            if p2 * (1.0 + i / steps) >= v:
                return int((p2 * (1.0 + i / steps) + 127) // 128) * 128
        return 2 * p2

    plan = RasterPlan(max_instances=bucket(int(total * 1.1)), k_max=bucket(int(ktile * 1.2), 4),
                      chunk=256, tile_size=32, pack_bf16=pack_bf16)
    kwargs["plan"] = plan

    # measure the PRODUCT launch path: the trainer folds scan_steps=8 iterations into
    # one train_step_many launch (trainer._dispatch_scan), amortizing the per-launch
    # host/tunnel cost (~6 ms on this single-core host)
    k_scan = 8
    margs = (
        jnp.broadcast_to(gt, (k_scan,) + gt.shape),
        jnp.broadcast_to(cam["w2c"], (k_scan, 4, 4)),
        jnp.broadcast_to(cam["cam_position"], (k_scan, 3)),
        jnp.broadcast_to(
            jnp.asarray([cam["fx"], cam["fy"], cam["cx"], cam["cy"]], jnp.float32),
            (k_scan, 4)),
        jnp.zeros((k_scan, 3), jnp.float32),
        jnp.zeros((k_scan,), jnp.int32),
    )
    for _ in range(warmup):
        ts, stats = train_step_many(ts, *margs, None, **kwargs)
    _ = float(stats.loss[-1])  # device_get: the only true sync through the tunnel

    t0 = time.perf_counter()
    chunks = max(1, iters // k_scan)
    for _ in range(chunks):
        ts, stats = train_step_many(ts, *margs, None, **kwargs)
    _ = float(stats.loss[-1])  # device_get: the only true sync through the tunnel
    dt = time.perf_counter() - t0

    iters_per_s = chunks * k_scan / dt
    mpix_per_s = iters_per_s * width * height / 1e6

    # single-launch rate: the like-for-like denominator for the mesh-overhead ratio
    # (the mesh lane below launches one batched step per call). Warm up OUTSIDE the
    # timed loop: the probe step above compiled with the PROBE plan, so the first call
    # here compiles the final bucketed shapes (~40 s uncached — BENCH_r04's
    # plain_iters_per_s=0.222 artifact was exactly this compile landing in the timing).
    for _ in range(2):
        ts, stats = train_step(ts, *args, **kwargs)
    _ = float(stats.loss)  # device_get sync
    t0 = time.perf_counter()
    for _ in range(10):
        ts, stats = train_step(ts, *args, **kwargs)
    _ = float(stats.loss)
    plain_iters_per_s = 10 / (time.perf_counter() - t0)

    # pure forward render throughput (viewer/eval rate; Mpix/s is the BASELINE.md metric)
    from tpu_splat.ops.rasterize import rasterize

    splat_r = ts.splat

    def render(means):
        out = rasterize(
            means, splat_r.scaling_raw, splat_r.rotation_raw, splat_r.opacity_raw,
            splat_r.sh0, splat_r.shN, splat_r.alive,
            cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
            3, jnp.zeros(3, jnp.float32),
            width=width, height=height,
            max_instances=plan.max_instances, k_max=plan.k_max, chunk=plan.chunk,
        )
        return means + 0.0 * out.image.mean()

    m = render(splat_r.means)
    _ = float(m[0, 0])  # device_get sync
    t0 = time.perf_counter()
    r_iters = 20
    for _ in range(r_iters):
        m = render(m)
    _ = float(m[0, 0])  # device_get sync
    render_fps = r_iters / (time.perf_counter() - t0)
    render_mpix = render_fps * width * height / 1e6

    # GUT path (distorted cameras): fwd+bwd step rate via the Pallas ray kernels
    from tpu_splat.ops.cameras import CameraParams
    from tpu_splat.ops.gut import rasterize_gut

    gut_params = CameraParams(radial=(0.03, 0, 0, 0, 0, 0))

    @jax.jit
    def gut_step(m):
        def loss(mm):
            out = rasterize_gut(
                mm, splat_r.scaling_raw, splat_r.rotation_raw, splat_r.opacity_raw,
                splat_r.sh0, splat_r.shN, splat_r.alive,
                cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                3, jnp.zeros(3, jnp.float32),
                width=width, height=height,
                max_instances=plan.max_instances, k_max=plan.k_max,
                cam_params=gut_params,
            )
            return jnp.sum(out.image)

        return m + 1e-9 * jax.grad(loss)(m)

    m = gut_step(splat_r.means)
    _ = float(m[0, 0])  # device_get sync
    t0 = time.perf_counter()
    g_iters = 8
    for _ in range(g_iters):
        m = gut_step(m)
    _ = float(m[0, 0])  # device_get sync
    gut_fwdbwd_per_s = g_iters / (time.perf_counter() - t0)

    # ---- mesh lane: the multi-chip product path on a 1-chip mesh vs the plain step.
    # Overhead target <=5% (BASELINE.md asks >=80% efficiency at 2 hosts; with one real
    # chip the measurable proxies are the shard_map/compaction overhead and the size of
    # the per-camera all-gather table that would ride ICI at g > 1).
    from tpu_splat.parallel.mesh import make_mesh, shard_train_state
    from tpu_splat.parallel.step import make_batched_train_step

    n_vis = int(stats.n_visible)
    budget = bucket(int(n_vis * 1.2))
    mesh_plan = RasterPlan(
        max_instances=plan.max_instances, k_max=plan.k_max, chunk=plan.chunk,
        tile_size=plan.tile_size, gather_budget=budget, pack_bf16=plan.pack_bf16,
    )
    mesh = make_mesh(jax.devices()[:1], data=1)
    ts_m = shard_train_state(mesh, ts)
    mstep = make_batched_train_step(mesh)
    margs = (gt[None], cam["w2c"][None], cam["cam_position"][None],
             jnp.asarray([[cam["fx"], cam["fy"], cam["cx"], cam["cy"]]], jnp.float32),
             jnp.zeros(3, jnp.float32))
    mkw = dict(width=width, height=height, plan=mesh_plan, opt=StepConfig(),
               total_iterations=30_000)
    for _ in range(warmup):
        ts_m, mstats = mstep(ts_m, *margs, **mkw)
    _ = float(mstats.loss)  # device_get sync
    t0 = time.perf_counter()
    m_iters = 10
    for _ in range(m_iters):
        ts_m, mstats = mstep(ts_m, *margs, **mkw)
    _ = float(mstats.loss)  # device_get sync
    mesh_iters_per_s = m_iters / (time.perf_counter() - t0)
    mesh_overhead = plain_iters_per_s / mesh_iters_per_s - 1.0
    # projected per-chip ICI bytes of the compacted feature-table all-gather at g chips:
    # Projected pytree ~17 f32 cols (+2 bf16-equivalent for color pack) per visible row.
    # When budget >= shard rows the mesh path skips compaction (nothing to save on this
    # everything-visible synthetic scene) and all-gathers the full table.
    table_mb = min(budget, n_gauss) * 17 * 4 / 1e6
    allgather_mb_2chip = table_mb * 0.5  # (g-1)/g at g=2, per camera per step

    result = {
        "metric": "train_iters_per_s_garden_like",
        "value": round(iters_per_s, 3),
        "unit": "iter/s (%dx%d, %dk gaussians, %d instances)" % (
            width, height, n_gauss // 1000, total),
        "vs_baseline": round(iters_per_s / 25.0, 3),
        "extra": {
            "mpix_per_s_trained": round(mpix_per_s, 2),
            "render_fps": round(render_fps, 2),
            "render_mpix_per_s": round(render_mpix, 1),
            "gut_fwdbwd_per_s": round(gut_fwdbwd_per_s, 3),
            "total_instances": total,
            "max_tile_count": ktile,
            "plain_iters_per_s": round(plain_iters_per_s, 3),
            "mesh_iters_per_s": round(mesh_iters_per_s, 3),
            "mesh_overhead": round(mesh_overhead, 4),
            "gather_budget": budget,
            "allgather_mb": round(allgather_mb_2chip, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
