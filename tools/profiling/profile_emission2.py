"""Bisect the real emission pipeline from tiles.py."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project, will_contribute

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
proj = jax.tree.map(jax.device_put, proj)


def chain(name, fn, iters=5):
    @jax.jit
    def step(x):
        return x + (0 * fn(proj.depth + x)).astype(jnp.float32) * jnp.ones_like(x)
    x = step(proj.depth)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def stage(d, upto):
    depth_key = jnp.where(proj.visible, d, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)
    counts = proj.n_tiles[order].astype(jnp.int32)
    tmin = proj.tile_min[order]
    tmax = proj.tile_max[order]
    offs_incl = jnp.cumsum(counts)
    offs_excl = offs_incl - counts
    total = offs_incl[-1]
    if upto == 0:
        return counts.sum() + total
    pos = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=MAX_INST)
    if upto == 1:
        return pos.sum()
    inst_id = jnp.arange(MAX_INST, dtype=jnp.int32)
    k = inst_id - offs_excl[pos]
    in_range = (inst_id < total) & (k >= 0) & (k < counts[pos])
    rect_w = jnp.maximum(tmax[pos, 0] - tmin[pos, 0], 1)
    tile_x = tmin[pos, 0] + k % rect_w
    tile_y = tmin[pos, 1] + k // rect_w
    if upto == 2:
        return tile_x.sum() + tile_y.sum() + in_range.sum()
    gid = order[pos]
    if upto == 3:
        return gid.sum() + tile_x.sum()
    contrib = will_contribute(proj.mean2d[gid], proj.conic[gid], tile_x, tile_y,
                              proj.power_threshold[gid], TS)
    if upto == 4:
        return contrib.sum() + tile_x.sum()
    valid = in_range & contrib
    tile_id = jnp.where(valid, tile_y * GW + tile_x, GW * GH)
    return tile_id.sum()


for u in range(6):
    chain(f"emission upto {u}", lambda d, u=u: stage(d, u))
