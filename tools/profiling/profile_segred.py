"""Decompose the 161 ms unpack+segmented_grad_reduce stage."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import (
    align_segments, build_sorted_instances, segmented_grad_reduce)
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
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


@jax.jit
def prep(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    return p, build_sorted_instances(p, GW, GH, MAX_INST, TS)


proj, inst = jax.tree.map(jax.device_put, prep(splat.means))
max_chunks = 8
(row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows) = jax.tree.map(
    jax.device_put, align_segments(inst, n_tiles, max_chunks))
gp0 = jax.device_put(jnp.asarray(
    np.random.default_rng(0).random((n_rows, NFEAT, CHUNK), np.float32)))

# a) unpack: strided slices + stack -> [MAX_AL, 10]
chain("a) unpack [R,16,128]->[MAX_AL,10]",
      lambda x, gp: jnp.sum(jnp.square(jnp.stack(
          [(gp + x)[:, f, :].reshape(-1) for f in range(10)], axis=1))),
      jnp.float32(0), gp0)

ginst0 = jax.device_put(jnp.stack([gp0[:, f, :].reshape(-1) for f in range(10)], axis=1))
ginst_pad0 = jnp.concatenate([ginst0, jnp.zeros((1, 10), jnp.float32)], axis=0)
ginst_pad0 = jax.device_put(ginst_pad0)

# b) gather to emission order
chain("b) gather ginst_pad[qem] [4M,10]",
      lambda x, gi, q: jnp.sum(jnp.square((gi + x)[jnp.minimum(q, max_aligned)])),
      jnp.float32(0), ginst_pad0, qa_emis)

# c) scan + segment-end gathers (full segmented_grad_reduce minus nothing)
chain("c) full segmented_grad_reduce",
      lambda x, gi: jnp.sum(jnp.square(segmented_grad_reduce(
          gi + x, qa_emis, inst.emis_rank, inst.emis_start, inst.emis_end,
          inst.inv_order))),
      jnp.float32(0), ginst0)

# d) slot-major alternative: reshape-free gather from [MAX_AL,16] then reduce
gp_slot = jax.device_put(jnp.asarray(
    np.random.default_rng(0).random((n_rows * CHUNK, NFEAT), np.float32)))


def segred16(gsl, qem):
    pad = jnp.concatenate([gsl, jnp.zeros((1, NFEAT), jnp.float32)], axis=0)
    ge = pad[jnp.minimum(qem, max_aligned)]  # [MAX_INST, 16]
    return segmented_grad_reduce(ge[:, :10], qem, inst.emis_rank, inst.emis_start,
                                 inst.emis_end, inst.inv_order)


chain("d) slot-major gather+reduce [4M,16]",
      lambda x, gsl: jnp.sum(jnp.square(segred16(gsl + x, qa_emis))),
      jnp.float32(0), gp_slot)
