"""Does fusing the emission producer into lax.sort explode its cost?"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.tiles import build_tile_assignment

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
        return x + (0 * fn(x)).astype(jnp.float32) * jnp.ones_like(x)
    x = step(proj.depth)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def f_assign(d):
    p2 = proj._replace(depth=d)
    a = build_tile_assignment(p2, GW, GH, MAX_INST, TS)
    return a.gaussian_idx.sum() + a.tile_start.sum() + a.tile_count.sum() + a.total_instances

chain("build_tile_assignment (as-is)", f_assign)


def _emit(d):
    p2 = proj._replace(depth=d)
    depth_key = jnp.where(p2.visible, p2.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)
    counts = p2.n_tiles[order].astype(jnp.int32)
    tmin = p2.tile_min[order]
    tmax = p2.tile_max[order]
    offs_incl = jnp.cumsum(counts)
    offs_excl = offs_incl - counts
    total = offs_incl[-1]
    pos = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=MAX_INST)
    inst_id = jnp.arange(MAX_INST, dtype=jnp.int32)
    k = inst_id - offs_excl[pos]
    in_range = (inst_id < total) & (k >= 0) & (k < counts[pos])
    rect_w = jnp.maximum(tmax[pos, 0] - tmin[pos, 0], 1)
    tile_x = tmin[pos, 0] + k % rect_w
    tile_y = tmin[pos, 1] + k // rect_w
    gid = order[pos]
    from tpu_splat.ops.projection import will_contribute
    contrib = will_contribute(p2.mean2d[gid], p2.conic[gid], tile_x, tile_y,
                              p2.power_threshold[gid], TS)
    valid = in_range & contrib
    tile_id = jnp.where(valid, tile_y * GW + tile_x, GW * GH)
    return tile_id, gid, total


def f_barrier(d):
    tile_id, gid, total = _emit(d)
    tile_id, gid = jax.lax.optimization_barrier((tile_id, gid))
    sorted_tile_id, sorted_gid = jax.lax.sort((tile_id, gid), num_keys=1, is_stable=True)
    tiles = jnp.arange(GW * GH, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile_id, tiles, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile_id, tiles + 1, side="left").astype(jnp.int32)
    return sorted_gid.sum() + tile_start.sum() + tile_end.sum() + total

chain("emission -barrier- sort+ranges", f_barrier)


def f_sort_only(d):
    tile_id, gid, total = _emit(d)
    tile_id, gid = jax.lax.optimization_barrier((tile_id, gid))
    sorted_tile_id, sorted_gid = jax.lax.sort((tile_id, gid), num_keys=1, is_stable=True)
    return sorted_gid.sum() + total

chain("emission -barrier- sort only", f_sort_only)


def f_ranges_only(d):
    tile_id, gid, total = _emit(d)
    tile_id = jax.lax.optimization_barrier(jnp.sort(tile_id))
    tiles = jnp.arange(GW * GH, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_id, tiles, side="left").astype(jnp.int32)
    return tile_start.sum() + total

chain("emission -barrier- ranges only", f_ranges_only)
