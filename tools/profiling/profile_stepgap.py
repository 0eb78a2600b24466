"""Find the gap between isolated-stage sums and the full train step (ts32/chunk256).

Cumulative sub-chains of the REAL step graph, each timed as one jit — the difference
between consecutive rows is the marginal cost of the added stage INSIDE the full graph
(stage-in-isolation timings miss relayouts/copies XLA inserts at stage boundaries).
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.rasterize import rasterize
from tpu_splat.ops.pallas.raster import align_segments, build_sorted_instances
from tpu_splat.training.train_step import (RasterPlan, StepConfig, init_train_state,
                                           train_step)
from tpu_splat.training.losses import photometric_loss

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
GW, GH = -(-W // TS), -(-H // TS)
N_TILES = GW * GH
MAX_INST = 1 << 21
K_MAX = 2048
MAX_CHUNKS = K_MAX // CH

splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"],
        cam["cy"])
gt = jax.device_put(jnp.asarray(
    np.random.default_rng(1).random((3, H, W), np.float32)))
plan = RasterPlan(max_instances=MAX_INST, k_max=K_MAX, chunk=CH, tile_size=TS)
raster_kw = dict(width=W, height=H, max_instances=MAX_INST, k_max=K_MAX, chunk=CH,
                 tile_size=TS)


def chain(name, fn, x0, *args, iters=8):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {ms:9.2f} ms", flush=True)
    return ms


# 1. projection + emission + align + pack-gather (everything before the fwd kernel):
def pre_kernel(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    p = jax.lax.optimization_barrier(p)
    inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
    rs, cc, gid, qem, mal, n_rows = align_segments(inst, N_TILES, MAX_CHUNKS, CH)
    feats = jnp.stack([p.mean2d[:, 0], p.mean2d[:, 1], p.conic[:, 0], p.conic[:, 1],
                       p.conic[:, 2], p.opacity, jnp.maximum(p.color[:, 0], 0),
                       jnp.maximum(p.color[:, 1], 0), jnp.maximum(p.color[:, 2], 0),
                       p.depth], axis=1)
    g = jax.lax.optimization_barrier(feats[gid])
    packed = jnp.pad(g, ((0, 0), (0, 6))).reshape(n_rows, CH, 16).transpose(0, 2, 1)
    return jnp.sum(packed[:, 0, ::64]) * 1e-9 + jnp.sum(rs).astype(jnp.float32) * 1e-9


chain("A pre-kernel (proj+emit+align+pack)", lambda x, m: pre_kernel(m + x),
      jnp.float32(0), splat.means)


# 2. + forward kernel (full forward render)
def fwd_only(m):
    out = rasterize(m, *base[:6], cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"],
                    cam["cx"], cam["cy"], 3, jnp.zeros(3, jnp.float32), **raster_kw)
    return jnp.sum(out.image) * 1e-9


chain("B full forward render", lambda x, m: fwd_only(m + x), jnp.float32(0), splat.means)


# 3. + backward through the rasterizer only (grads to all 6 param groups)
def fwd_bwd(m):
    def loss(mm):
        out = rasterize(mm, *base[:6], cam["w2c"], cam["cam_position"], cam["fx"],
                        cam["fy"], cam["cx"], cam["cy"], 3, jnp.zeros(3, jnp.float32),
                        **raster_kw)
        return jnp.sum(out.image) * 1e-6
    return jnp.sum(jax.grad(loss)(m)) * 1e-3


chain("C render fwd+bwd (sum-loss)", lambda x, m: fwd_bwd(m + x), jnp.float32(0),
      splat.means)


# 4. + real photometric loss (L1+SSIM through assemble)
def fwd_bwd_loss(m):
    def loss(mm):
        out = rasterize(mm, *base[:6], cam["w2c"], cam["cam_position"], cam["fx"],
                        cam["fy"], cam["cx"], cam["cy"], 3, jnp.zeros(3, jnp.float32),
                        **raster_kw)
        return photometric_loss(out.image, gt, 0.2)
    return jax.grad(loss)(m).sum()


chain("D render fwd+bwd (L1+SSIM loss)", lambda x, m: fwd_bwd_loss(m + x),
      jnp.float32(0), splat.means)


# 5. FULL train step (grads to all params + adam + noise)
ts0 = init_train_state(splat)
args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        jnp.zeros(3, jnp.float32), jnp.int32(0))
kw = dict(width=W, height=H, plan=plan, opt=StepConfig(), total_iterations=30_000)

ts1, st = train_step(ts0, *args, **kw)
_ = float(st.loss)
t0 = time.perf_counter()
K = 10
tsx = ts1
for _ in range(K):
    tsx, st = train_step(tsx, *args, **kw)
_ = float(st.loss)
print(f"{'E FULL train_step':52s} {(time.perf_counter() - t0) / K * 1e3:9.2f} ms",
      flush=True)
