"""Bisect the r4 pipeline-restructure regression (660 ms vs 192 ms r3 full step).

Chains of the NEW pipeline, plus isolated row-op candidates (scatter-pack, seg_start
scan, pallas segred)."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

SEGRED = os.environ.get("TPU_SPLAT_SEGRED_IMPL", "")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import (align_segments, build_sorted_instances,
                                         segred_prefix_pallas, NFEAT)
from tpu_splat.training.train_step import RasterPlan, StepConfig, init_train_state, train_step

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
GW, GH = -(-W // TS), -(-H // TS)
N_TILES = GW * GH
MAX_INST = 1 << 21
MAX_AL = MAX_INST + N_TILES * CH
K_MAX = 2048
MAX_CHUNKS = K_MAX // CH

splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"],
        cam["cy"])
gt = jax.device_put(jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32)))


def chain(name, fn, x0, *args, iters=8):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:9.2f} ms", flush=True)
    return ms


def pre_kernel(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    p = jax.lax.optimization_barrier(p)
    inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
    rs, cc, gid, qem, mal, n_rows = align_segments(inst, N_TILES, MAX_CHUNKS, CH)
    flat = jax.lax.optimization_barrier(inst.gtab[gid])
    packed = flat.reshape(n_rows, CH, NFEAT).transpose(0, 2, 1)
    return jnp.sum(packed[:, 0, ::64]) * 1e-9 + jnp.sum(rs).astype(jnp.float32) * 1e-9


def build_only(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    p = jax.lax.optimization_barrier(p)
    inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
    return (jnp.sum(inst.tile_start).astype(jnp.float32) * 1e-9
            + jnp.sum(inst.emis_feat[::4096, ::8]) * 1e-9)


chain("A build_sorted_instances (proj+emit+sort)", lambda x, m: build_only(m + x),
      jnp.float32(0), splat.means)
chain("B pre-kernel (A + align + scatter-pack + transpose)",
      lambda x, m: pre_kernel(m + x), jnp.float32(0), splat.means)

# isolated scatter-pack
rng = np.random.default_rng(0)
qa = jnp.asarray(np.sort(rng.choice(MAX_AL, MAX_INST, replace=False)).astype(np.int32))
rows32 = jnp.asarray(rng.random((MAX_INST, 16), np.float32))
chain("C scatter-set [MAX_INST,16]f32 -> [MAX_AL,16]",
      lambda x, r: jnp.sum(
          jnp.zeros((MAX_AL, 16), jnp.float32).at[qa].set(r, mode="drop")[::512, ::8]
      ) * 1e-9 + x, jnp.float32(0), rows32)

# isolated pallas segred (prefix kernel alone)
ge = jnp.asarray(rng.random((MAX_INST, 10), np.float32))
rank = jnp.asarray(np.sort(rng.integers(0, N, MAX_INST)).astype(np.int32))
chain("D segred_prefix_pallas [MAX_INST,10]",
      lambda x, g: jnp.sum(segred_prefix_pallas(g, rank)[::4096]) * 1e-9 + x,
      jnp.float32(0), ge)

# full steps under the segred impl env override
plan = RasterPlan(max_instances=MAX_INST, k_max=K_MAX, chunk=CH, tile_size=TS)
kw = dict(width=W, height=H, plan=plan, opt=StepConfig(), total_iterations=30_000)
args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        jnp.zeros(3, jnp.float32), jnp.int32(0))
ts = init_train_state(splat)
ts, st = train_step(ts, *args, **kw)
_ = float(st.loss)
t0 = time.perf_counter()
for _ in range(12):
    ts, st = train_step(ts, *args, **kw)
_ = float(st.loss)
print(f"{'E FULL step (segred=' + (SEGRED or 'default') + ')':58s} "
      f"{(time.perf_counter() - t0) / 12 * 1e3:9.2f} ms", flush=True)
print("done", flush=True)
