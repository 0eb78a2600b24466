"""Post-redesign (unaligned-segments) stage chain at garden scale.

Chain rows are cumulative jits of the REAL pipeline prefix (dependent-chain timing,
device_get sync; trust within-script deltas)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import build_sorted_instances
from tpu_splat.training.train_step import RasterPlan, StepConfig, init_train_state, train_step

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
GW, GH = -(-W // TS), -(-H // TS)
MAX_INST = 1 << 21
K_MAX = 2048

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


# ---- full step (both pack dtypes)
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

# ---- new-pipeline prefix chain
def stage(depth):
    def f(m):
        p = project(m, *base, W, H, 3, tile_size=TS)
        p = jax.lax.optimization_barrier(p)
        inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
        acc = (jnp.sum(inst.tile_start).astype(jnp.float32) * 1e-9
               + jnp.sum(inst.sorted_gid[::4096]).astype(jnp.float32) * 1e-9)
        if depth == 0:
            return acc
        _, qe = jax.lax.sort(
            (inst.sorted_emis, jnp.arange(MAX_INST, dtype=jnp.int32)),
            num_keys=1, is_stable=False)
        acc = acc + jnp.sum(qe[::4096]).astype(jnp.float32) * 1e-9
        if depth == 1:
            return acc
        gid_pad = jnp.concatenate([inst.sorted_gid, jnp.zeros((K_MAX + 128,), jnp.int32)])
        flat = jax.lax.optimization_barrier(jnp.transpose(inst.gtab[gid_pad]))
        return acc + jnp.sum(flat[::4, ::4096]) * 1e-9
    return f


chain("A proj+build_sorted_instances (expand kernel + 2-key sort)",
      lambda x, m: stage(0)(m + x), jnp.float32(0), splat.means)
chain("B  + qe inverse-perm sort", lambda x, m: stage(1)(m + x),
      jnp.float32(0), splat.means)
chain("C  + fused pack gather+transpose [16, M_pad]",
      lambda x, m: stage(2)(m + x), jnp.float32(0), splat.means)
print("done", flush=True)
