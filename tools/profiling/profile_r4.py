"""Round-4 profile: candidate glue optimizations at garden scale.

Measures (dependent-chain timing, device_get sync — see profile_stepgap.py for the
tunnel measurement pitfalls):
  1. full train_step, pack_bf16 off vs on
  2. row-op costs: gather vs disjoint scatter, f32 vs bf16, at instance scale
  3. the pack transpose [R, chunk, 16] -> [R, 16, chunk]
  4. the backward unpack strided-slice stack
  5. the segred block_mm stage in isolation
  6. an extra scatter+cummax int32 scan (the seg_start scan of the single-gather plan)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
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


splat, cam = build_workload(N, W, H)
gt = jax.device_put(jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32)))
ts0 = init_train_state(splat)
args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        jnp.zeros(3, jnp.float32), jnp.int32(0))


def step_ms(pack_bf16, tag):
    plan = RasterPlan(max_instances=MAX_INST, k_max=K_MAX, chunk=CH, tile_size=TS,
                      pack_bf16=pack_bf16)
    kw = dict(width=W, height=H, plan=plan, opt=StepConfig(), total_iterations=30_000)
    ts = ts0
    ts, st = train_step(ts, *args, **kw)
    _ = float(st.loss)
    t0 = time.perf_counter()
    iters = 12
    for _ in range(iters):
        ts, st = train_step(ts, *args, **kw)
    _ = float(st.loss)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:58s} {ms:9.2f} ms", flush=True)
    return ms


step_ms(False, "FULL step pack_bf16=off (r3 default)")
step_ms(True, "FULL step pack_bf16=on")

rng = np.random.default_rng(0)
idx_al = jnp.asarray(rng.integers(0, N, MAX_AL, dtype=np.int32))
idx_em = jnp.asarray(rng.integers(0, N, MAX_INST, dtype=np.int32))
qa = jnp.asarray(np.sort(rng.choice(MAX_AL, MAX_INST, replace=False)).astype(np.int32))
feats32 = jnp.asarray(rng.random((N, 16), np.float32))
feats16 = feats32.astype(jnp.bfloat16)
rows32 = jnp.asarray(rng.random((MAX_INST, 16), np.float32))
rows16 = rows32.astype(jnp.bfloat16)

chain("gather [N,16]f32 -> [MAX_AL] rows  (pack gather today)",
      lambda x, f: jnp.sum(f[idx_al][::512, ::8]) * 1e-9 + x, jnp.float32(0), feats32)
chain("gather [N,16]bf16 -> [MAX_AL] rows",
      lambda x, f: jnp.sum((f[idx_al][::512, ::8]).astype(jnp.float32)) * 1e-9 + x,
      jnp.float32(0), feats16)
chain("gather [N,16]f32 -> [MAX_INST] rows (gtab gather today)",
      lambda x, f: jnp.sum(f[idx_em][::512, ::8]) * 1e-9 + x, jnp.float32(0), feats32)
chain("gather [N,16]bf16 -> [MAX_INST] rows",
      lambda x, f: jnp.sum((f[idx_em][::512, ::8]).astype(jnp.float32)) * 1e-9 + x,
      jnp.float32(0), feats16)
chain("scatter-set [MAX_INST,16]f32 -> [MAX_AL,16] disjoint",
      lambda x, r: jnp.sum(
          jnp.zeros((MAX_AL, 16), jnp.float32).at[qa].set(r, mode="drop")[::512, ::8]
      ) * 1e-9 + x, jnp.float32(0), rows32)
chain("scatter-set [MAX_INST,16]bf16 -> [MAX_AL,16] disjoint",
      lambda x, r: jnp.sum(
          jnp.zeros((MAX_AL, 16), jnp.bfloat16).at[qa].set(r, mode="drop")[::512, ::8]
          .astype(jnp.float32)) * 1e-9 + x, jnp.float32(0), rows16)

R = MAX_AL // CH
pk32 = jnp.asarray(rng.random((R * CH, 16), np.float32))
pk16 = pk32.astype(jnp.bfloat16)
chain("pack transpose [R,CH,16]->[R,16,CH] f32",
      lambda x, p: jnp.sum(p.reshape(R, CH, 16).transpose(0, 2, 1)[::64, :, ::64])
      * 1e-9 + x, jnp.float32(0), pk32)
chain("pack transpose [R,CH,16]->[R,16,CH] bf16",
      lambda x, p: jnp.sum(p.reshape(R, CH, 16).transpose(0, 2, 1)[::64, :, ::64]
                           .astype(jnp.float32)) * 1e-9 + x, jnp.float32(0), pk16)

gp16 = jnp.asarray(rng.random((R, 16, CH), np.float32)).astype(jnp.bfloat16)
chain("bwd unpack strided-stack [R,16,CH]bf16 -> [MAX_AL,10]",
      lambda x, g: jnp.sum(jnp.stack(
          [g[:, f, :].reshape(-1) for f in range(10)], axis=1)[::512].astype(jnp.float32))
      * 1e-9 + x, jnp.float32(0), gp16)

# segred block_mm stage in isolation (post-gather part)
from tpu_splat.ops.pallas.raster import segmented_grad_reduce

rank = jnp.asarray(np.sort(rng.integers(0, N, MAX_INST)).astype(np.int32))
seg_s = jnp.zeros((N,), jnp.int32)
seg_e = jnp.zeros((N,), jnp.int32)
ginst = jnp.asarray(rng.random((MAX_AL, 10), np.float32)).astype(jnp.bfloat16)
qem = jnp.asarray(rng.integers(0, MAX_AL, MAX_INST, dtype=np.int32))
chain("segred total block_mm (gather+matmul+carry+segend)",
      lambda x, g: jnp.sum(segmented_grad_reduce(
          g, qem, rank, seg_s, seg_e, gather_dtype=jnp.bfloat16,
          impl="block_mm")[::512]) * 1e-9 + x,
      jnp.float32(0), ginst)
chain("segred total pallas_mm (gather+kernel+segend)",
      lambda x, g: jnp.sum(segmented_grad_reduce(
          g, qem, rank, seg_s, seg_e, gather_dtype=jnp.bfloat16,
          impl="pallas_mm")[::512]) * 1e-9 + x,
      jnp.float32(0), ginst)

# extra scatter+cummax int32 scan over MAX_INST
starts = jnp.asarray(np.sort(rng.choice(MAX_INST, N, replace=False)).astype(np.int32))
vals = jnp.asarray(np.sort(rng.integers(0, MAX_INST, N)).astype(np.int32))
chain("scatter+cummax int32 scan over [MAX_INST]",
      lambda x, v: jnp.sum(jax.lax.cummax(
          jnp.zeros((MAX_INST,), jnp.int32).at[starts].max(v, mode="drop"))[::4096]
          .astype(jnp.float32)) * 1e-9 + x, jnp.float32(0), vals)
chain("2x scatter+cummax int32 scans over [MAX_INST]",
      lambda x, v: jnp.sum((jax.lax.cummax(
          jnp.zeros((MAX_INST,), jnp.int32).at[starts].max(v, mode="drop"))
          + jax.lax.cummax(
          jnp.zeros((MAX_INST,), jnp.int32).at[starts].max(v + 1, mode="drop")))[::4096]
          .astype(jnp.float32)) * 1e-9 + x, jnp.float32(0), vals)
print("done", flush=True)
