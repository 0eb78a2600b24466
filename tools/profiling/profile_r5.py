"""Round-5 baseline + sizing for the 'unaligned segments' redesign.

Measures (dependent-chain timing, device_get sync; see profile_stepgap.py for the
tunnel pitfalls — trust within-script deltas):
  1. FULL train_step (r5 baseline) and pack_bf16 A/B
  2. current pipeline prefix chain: proj+emission -> +align -> +pack gather -> +transpose
  3. redesign pieces: [M,16] row-gather at sorted_gid, full [M,16]->[16,M] transpose
     (f32 and bf16), gather fused into transposed output, [16,M]->[M,16] bwd transpose
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import NFEAT, align_segments, build_sorted_instances
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
    print(f"{name:62s} {ms:9.2f} ms", flush=True)
    return ms


# ---- 1. full step baseline + pack_bf16 A/B
args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        jnp.zeros(3, jnp.float32), jnp.int32(0))
ts0 = init_train_state(splat)
for pack in (False, True):
    plan = RasterPlan(max_instances=MAX_INST, k_max=K_MAX, chunk=CH, tile_size=TS,
                      pack_bf16=pack)
    kw = dict(width=W, height=H, plan=plan, opt=StepConfig(), total_iterations=30_000)
    ts = ts0
    ts, st = train_step(ts, *args, **kw)
    _ = float(st.loss)
    t0 = time.perf_counter()
    for _ in range(12):
        ts, st = train_step(ts, *args, **kw)
    _ = float(st.loss)
    print(f"{'FULL step pack_bf16=' + str(pack):62s} "
          f"{(time.perf_counter() - t0) / 12 * 1e3:9.2f} ms", flush=True)

# ---- 2. current pipeline prefix chain
def stage(depth):
    def f(m):
        p = project(m, *base, W, H, 3, tile_size=TS)
        p = jax.lax.optimization_barrier(p)
        inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
        acc = (jnp.sum(inst.tile_start).astype(jnp.float32) * 1e-9
               + jnp.sum(inst.sorted_gid[::4096]).astype(jnp.float32) * 1e-9)
        if depth == 0:
            return acc
        rs, cc, gid, qem, mal, n_rows = align_segments(inst, N_TILES, MAX_CHUNKS, CH)
        acc = acc + (jnp.sum(rs) + jnp.sum(gid[::4096]) + jnp.sum(qem[::4096])
                     ).astype(jnp.float32) * 1e-9
        if depth == 1:
            return acc
        flat = jax.lax.optimization_barrier(inst.gtab[gid])
        acc = acc + jnp.sum(flat[::4096, ::8]) * 1e-9
        if depth == 2:
            return acc
        packed = flat.reshape(n_rows, CH, NFEAT).transpose(0, 2, 1)
        return acc + jnp.sum(packed[::64, :, ::64]) * 1e-9
    return f


chain("A proj+build_sorted_instances (incl. expand kernel + sort)",
      lambda x, m: stage(0)(m + x), jnp.float32(0), splat.means)
chain("B  + align_segments", lambda x, m: stage(1)(m + x), jnp.float32(0), splat.means)
chain("C  + pack gather gtab[aligned_gid] [MAX_AL,16]",
      lambda x, m: stage(2)(m + x), jnp.float32(0), splat.means)
chain("D  + pack transpose -> [R,16,CH]", lambda x, m: stage(3)(m + x),
      jnp.float32(0), splat.means)

# ---- 3. redesign pieces (isolated, synthetic indices)
rng = np.random.default_rng(0)
gtab32 = jnp.asarray(rng.random((N, 16), np.float32))
gtab16 = gtab32.astype(jnp.bfloat16)
sgid = jnp.asarray(rng.integers(0, N, MAX_INST, dtype=np.int32))

chain("R1 row-gather gtab[sgid] [MAX_INST,16] f32",
      lambda x, g: jnp.sum(g[sgid][::4096, ::8]) * 1e-9 + x, jnp.float32(0), gtab32)
chain("R2 row-gather gtab[sgid] [MAX_INST,16] bf16",
      lambda x, g: jnp.sum(g[sgid][::4096, ::8].astype(jnp.float32)) * 1e-9 + x,
      jnp.float32(0), gtab16)

rows32 = jnp.asarray(rng.random((MAX_INST, 16), np.float32))
rows16 = rows32.astype(jnp.bfloat16)
chain("R3 transpose [MAX_INST,16]->[16,MAX_INST] f32",
      lambda x, r: jnp.sum(r.T[::4, ::4096]) * 1e-9 + x, jnp.float32(0), rows32)
chain("R4 transpose [MAX_INST,16]->[16,MAX_INST] bf16",
      lambda x, r: jnp.sum(r.T[::4, ::4096].astype(jnp.float32)) * 1e-9 + x,
      jnp.float32(0), rows16)
chain("R5 fused gather+transpose gtab[sgid].T f32",
      lambda x, g: jnp.sum(g[sgid].T[::4, ::4096]) * 1e-9 + x, jnp.float32(0), gtab32)
chain("R6 fused gather+transpose gtab[sgid].T bf16",
      lambda x, g: jnp.sum(g[sgid].T[::4, ::4096].astype(jnp.float32)) * 1e-9 + x,
      jnp.float32(0), gtab16)

gflat16 = jnp.asarray(rng.random((16, MAX_INST), np.float32)).astype(jnp.bfloat16)
chain("R7 bwd transpose [16,MAX_INST]->[MAX_INST,16] bf16",
      lambda x, g: jnp.sum(g.T[::4096, ::4].astype(jnp.float32)) * 1e-9 + x,
      jnp.float32(0), gflat16)
chain("R8 bwd transpose+row-gather g.T[qem] bf16 (segred input)",
      lambda x, g: jnp.sum(g.T[sgid][::4096, ::4].astype(jnp.float32)) * 1e-9 + x,
      jnp.float32(0), gflat16)
print("done", flush=True)
