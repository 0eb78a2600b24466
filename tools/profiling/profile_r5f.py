"""Bisect the r5 step at head: where do the ~183 ms live after the unaligned-segment
redesign? Chain rows are dependent-chain jits (device_get sync; trust within-script
deltas).

Rows:
  F   render forward only (proj + instances + pack + fwd kernel)
  FB  value_and_grad of sum(image) through the raster (adds bwd kernel + emission
      gather + segred + proj bwd)
  FBk value_and_grad stopping at the blend custom-VJP output (adds bwd kernel +
      epilogue only; the per-gaussian reduction is cut by summing the blend output
      cotangent path only) -- approximated by grad wrt color (skips proj bwd chain).
  FULL train_step
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.training.train_step import (RasterPlan, StepConfig, init_train_state,
                                           train_step)
from tpu_splat.ops.rasterize import rasterize

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
MAX_INST = 1 << 21
K_MAX = 2048

splat, cam = build_workload(N, W, H)
gt = jax.device_put(jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32)))
plan = RasterPlan(max_instances=MAX_INST, k_max=K_MAX, chunk=CH, tile_size=TS)


def raster(means, sh0):
    return rasterize(
        means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
        sh0, splat.shN, splat.alive,
        cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        3, jnp.zeros(3, jnp.float32),
        width=W, height=H, max_instances=MAX_INST, k_max=K_MAX, chunk=CH, tile_size=TS,
    )


def timeit(name, fn, x0, iters=8):
    step = jax.jit(fn)
    x = step(x0)
    _ = float(jnp.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    _ = float(jnp.asarray(x).ravel()[0])
    print(f"{name:58s} {(time.perf_counter() - t0) / iters * 1e3:9.2f} ms", flush=True)


# F: forward only
timeit("F   render fwd only", lambda m: m + 0.0 * raster(m, splat.sh0).image.mean(),
       splat.means)

# FBc: grad wrt sh0 only (bwd kernel + emission gather + segred for color cols +
# SH chain; skips mean2d/conic/proj bwd heavy chain)
def fbc(s):
    def loss(sh0):
        return jnp.sum(raster(splat.means, sh0).image)
    g = jax.grad(loss)(s)
    return s + 1e-12 * g
timeit("FBc grad wrt sh0 only (bwd kernel + reduce + SH chain)", fbc, splat.sh0)

# FB: grad wrt means (full backward incl. proj chain)
def fb(m):
    def loss(means):
        return jnp.sum(raster(means, splat.sh0).image)
    g = jax.grad(loss)(m)
    return m + 1e-12 * g
timeit("FB  grad wrt means (full raster bwd)", fb, splat.means)

# FULL step
ts0 = init_train_state(splat)
kw = dict(width=W, height=H, plan=plan, opt=StepConfig(), total_iterations=30_000)
args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        jnp.zeros(3, jnp.float32), jnp.int32(0))
ts = ts0
ts, st = train_step(ts, *args, **kw)
_ = float(st.loss)
t0 = time.perf_counter()
for _ in range(12):
    ts, st = train_step(ts, *args, **kw)
_ = float(st.loss)
print(f"{'FULL train_step':58s} {(time.perf_counter() - t0) / 12 * 1e3:9.2f} ms",
      flush=True)
print("done", flush=True)
