"""Micro-profile the tile-assignment sub-stages."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.projection import will_contribute

N = 1_000_000
W, H = 1296, 840
TS = 16
GW, GH = -(-W // TS), -(-H // TS)
MAX_INST = 1 << 22

splat, cam = build_workload(N, W, H)
args = (splat.means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
        splat.sh0, splat.shN, splat.alive,
        cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])

proj = jax.jit(lambda *a: project(*a, W, H, 3, tile_size=TS))(*args)
proj = jax.tree.map(lambda x: jax.device_put(x), proj)


def chain(name, fn, x0, iters=6):
    @jax.jit
    def step(x):
        return x + 0 * fn(x)
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


depth = proj.depth
vis = proj.visible

# 1. argsort of N by depth
chain("argsort 1M", lambda d: jnp.argsort(jnp.where(vis, d, jnp.inf)).astype(jnp.float32).sum() * jnp.ones_like(d), depth)

# 2. emission (repeat + gathers + will_contribute), no sort
def emission(d):
    depth_key = jnp.where(vis, d, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)
    counts = proj.n_tiles[order].astype(jnp.int32)
    tmin = proj.tile_min[order]
    tmax = proj.tile_max[order]
    offs_incl = jnp.cumsum(counts)
    offs_excl = offs_incl - counts
    pos = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=MAX_INST)
    inst_id = jnp.arange(MAX_INST, dtype=jnp.int32)
    k = inst_id - offs_excl[pos]
    in_range = (inst_id < offs_incl[-1]) & (k >= 0) & (k < counts[pos])
    rect_w = jnp.maximum(tmax[pos, 0] - tmin[pos, 0], 1)
    tile_x = tmin[pos, 0] + k % rect_w
    tile_y = tmin[pos, 1] + k // rect_w
    gid = order[pos]
    contrib = will_contribute(proj.mean2d[gid], proj.conic[gid], tile_x, tile_y,
                              proj.power_threshold[gid], TS)
    valid = in_range & contrib
    tile_id = jnp.where(valid, tile_y * GW + tile_x, GW * GH)
    return (tile_id.sum() + gid.sum()).astype(jnp.float32) * jnp.ones_like(d)

chain("emission (no sort)", emission, depth)

# 3. sort of 4M pairs
key32 = jnp.asarray(np.random.default_rng(0).integers(0, GW * GH + 1, MAX_INST, np.int32))
val32 = jnp.arange(MAX_INST, dtype=jnp.int32)
def sort4m(x):
    k2 = key32 + 0 * x[0].astype(jnp.int32)
    sk, sv = jax.lax.sort((k2, val32), num_keys=1, is_stable=True)
    return (sk.sum() + sv.sum()).astype(jnp.float32) * jnp.ones_like(x)
chain("stable sort 4M pairs", sort4m, depth)

def sort4m_unstable(x):
    k2 = key32 + 0 * x[0].astype(jnp.int32)
    sk, sv = jax.lax.sort((k2, val32), num_keys=1, is_stable=False)
    return (sk.sum() + sv.sum()).astype(jnp.float32) * jnp.ones_like(x)
chain("unstable sort 4M pairs", sort4m_unstable, depth)

# single fused 32-bit key sort (tile<<19 | rank?) - sort single array only
def sort4m_single(x):
    k2 = key32 + 0 * x[0].astype(jnp.int32)
    sk = jax.lax.sort(k2, is_stable=False)
    return sk.sum().astype(jnp.float32) * jnp.ones_like(x)
chain("unstable sort 4M single", sort4m_single, depth)

# batched sort: 512 x 8192
def sort_batched(x):
    k2 = (key32 + 0 * x[0].astype(jnp.int32)).reshape(512, 8192)
    sk = jax.lax.sort(k2, dimension=1, is_stable=False)
    return sk.sum().astype(jnp.float32) * jnp.ones_like(x)
chain("batched sort 512x8192", sort_batched, depth)

# searchsorted ranges
tile_sorted = jnp.sort(key32)
def ranges(x):
    t = jnp.arange(GW * GH, dtype=jnp.int32)
    s = jnp.searchsorted(tile_sorted + 0 * x[0].astype(jnp.int32), t)
    return s.sum().astype(jnp.float32) * jnp.ones_like(x)
chain("searchsorted ranges", ranges, depth)

# segment-sum histogram of 4M into 4293 bins
def hist(x):
    k2 = key32 + 0 * x[0].astype(jnp.int32)
    h = jnp.zeros((GW * GH + 1,), jnp.int32).at[k2].add(1)
    return h.sum().astype(jnp.float32) * jnp.ones_like(x)
chain("scatter-add histogram 4M", hist, depth)
