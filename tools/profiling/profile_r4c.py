"""Fine-grained pre-kernel/backward-glue stage costs at garden scale (r4).

Sizes the 'unaligned segments' redesign: what do align_segments, the pack gather, the
pack transpose and the backward unpack strided-stack each cost INSIDE the graph?
Also A/Bs pack_bf16 (now with the cdotg MXU matmul) at the full step.
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
from tpu_splat.ops.pallas.raster import (NFEAT, align_segments, build_sorted_instances)
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


def stage(depth):
    def f(m):
        p = project(m, *base, W, H, 3, tile_size=TS)
        p = jax.lax.optimization_barrier(p)
        inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
        acc = (jnp.sum(inst.tile_start).astype(jnp.float32) * 1e-9
               + jnp.sum(inst.emis_feat[::4096, ::8]) * 1e-9)
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


chain("A proj+build_sorted_instances", lambda x, m: stage(0)(m + x),
      jnp.float32(0), splat.means)
chain("B  + align_segments", lambda x, m: stage(1)(m + x), jnp.float32(0), splat.means)
chain("C  + pack gather gtab[gid]", lambda x, m: stage(2)(m + x),
      jnp.float32(0), splat.means)
chain("D  + pack transpose -> [R,16,CH]", lambda x, m: stage(3)(m + x),
      jnp.float32(0), splat.means)

# backward unpack strided-stack (isolated; r4 row that never ran)
rng = np.random.default_rng(0)
R = MAX_AL // CH
gp16 = jnp.asarray(rng.random((R, NFEAT, CH), np.float32)).astype(jnp.bfloat16)
chain("E unpack strided-stack [R,16,CH]bf16 -> [MAX_AL,10]",
      lambda x, g: jnp.sum(jnp.stack(
          [g[:, f, :].reshape(-1).astype(jnp.float32) for f in range(10)],
          axis=1)[::512]) * 1e-9 + x, jnp.float32(0), gp16)

# minor-axis (lane) gather: feature-major pack alternative
ptabT = jnp.asarray(rng.random((16, N), np.float32))
idx = jnp.asarray(rng.integers(0, N, MAX_INST, dtype=np.int32))
chain("F lane-gather ptabT[:, idx] [16,N]->[16,MAX_INST]",
      lambda x, t: jnp.sum(t[:, idx][::4, ::4096]) * 1e-9 + x, jnp.float32(0), ptabT)

# full-step pack_bf16 A/B (cdotg MXU rides the bf16 path)
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
    print(f"{'G FULL step pack_bf16=' + str(pack):58s} "
          f"{(time.perf_counter() - t0) / 12 * 1e3:9.2f} ms", flush=True)
print("done", flush=True)
