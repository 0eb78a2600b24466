"""Gather variants for the emission-order grad gather (the 109 ms hotspot)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import align_segments, build_sorted_instances
from tpu_splat.ops.pallas.blend import CHUNK, NFEAT

N = 1_000_000
W, H = 1296, 840
TS = 16
GW, GH = -(-W // TS), -(-H // TS)
n_tiles = GW * GH
MAX_INST = 1 << 22
splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"],
        cam["cy"])


def chain(name, fn, x0, *args, iters=8):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


@jax.jit
def prep(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    return p, build_sorted_instances(p, GW, GH, MAX_INST, TS)


proj, inst = jax.tree.map(jax.device_put, prep(splat.means))
max_chunks = 8
(row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows) = jax.tree.map(
    jax.device_put, align_segments(inst, n_tiles, max_chunks))
rng = np.random.default_rng(0)
ginst_pad0 = jax.device_put(jnp.asarray(rng.random((max_aligned + 1, 10), np.float32)))
qem_c = jax.device_put(jnp.minimum(qa_emis, max_aligned))

# 1) barrier'd gather (kill recompute-in-fusion)
chain("gather [4M,10], barrier operand",
      lambda x, gi, q: jnp.sum(jnp.square(
          jax.lax.optimization_barrier(gi + x)[q])),
      jnp.float32(0), ginst_pad0, qem_c)

# 2) barrier'd gather, 16-wide
g16 = jax.device_put(jnp.asarray(rng.random((max_aligned + 1, 16), np.float32)))
chain("gather [4M,16], barrier operand",
      lambda x, gi, q: jnp.sum(jnp.square(
          jax.lax.optimization_barrier(gi + x)[q])),
      jnp.float32(0), g16, qem_c)

# 3) lax.sort route: keys = emission idx of each aligned slot; payload = grads
#    (i.e., sort aligned-order rows back into emission order)
al2em = jax.device_put(
    jnp.full((max_aligned,), 1 << 30, jnp.int32)
    .at[qem_c].set(jnp.arange(MAX_INST, dtype=jnp.int32), mode="drop"))
ginst0 = jax.device_put(jnp.asarray(rng.random((max_aligned, 10), np.float32)))


def sort_route(gi):
    cols = [al2em] + [gi[:, i] for i in range(10)]
    out = jax.lax.sort(tuple(cols), num_keys=1, is_stable=False)
    return sum(jnp.sum(jnp.square(o[:MAX_INST])) for o in out[1:])


chain("lax.sort route (1 key + 10 payloads)",
      lambda x, gi: sort_route(jax.lax.optimization_barrier(gi + x)),
      jnp.float32(0), ginst0)

# 4) gather a single [4M] column x10 (baseline for comparison)
chain("10x single-column gathers",
      lambda x, gi, q: sum(jnp.sum(jnp.square(
          jax.lax.optimization_barrier(gi + x)[:, i][q])) for i in range(10)),
      jnp.float32(0), ginst_pad0, qem_c)

# 5) gather rows as [4M] from a flattened [MAX_AL*10] with strided index math
chain("flat gather [4M*10] via repeat idx",
      lambda x, gi, q: jnp.sum(jnp.square(
          jax.lax.optimization_barrier((gi + x).reshape(-1))[
              (q[:, None] * 10 + jnp.arange(10)[None, :]).reshape(-1)])),
      jnp.float32(0), ginst_pad0, qem_c)
