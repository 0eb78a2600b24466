"""Bisect the fused project+tiles jit with device-side chaining (no host syncs)."""
import time
import jax, jax.numpy as jnp, numpy as np
from bench import build_workload
from tpu_splat.ops.projection import project, will_contribute

N = 1_000_000; W, H = 1296, 840; TS = 16
GW, GH = -(-W // TS), -(-H // TS); MAX_INST = 1 << 22
splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])


def chain(name, fn, iters=5):
    @jax.jit
    def step(m):
        return m + 0 * fn(m).astype(jnp.float32) * jnp.ones_like(m)
    m = step(splat.means); jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters): m = step(m)
    jax.block_until_ready(m)
    print(f"{name:38s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def upto(m, stage):
    proj = project(m, *base, W, H, 3, tile_size=TS)
    proj = jax.lax.optimization_barrier(proj)
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)
    if stage == 0:
        return order.sum()
    counts = proj.n_tiles[order].astype(jnp.int32)
    tmin = proj.tile_min[order]
    tmax = proj.tile_max[order]
    if stage == 1:
        return counts.sum() + tmin.sum() + tmax.sum()
    offs_incl = jnp.cumsum(counts)
    offs_excl = offs_incl - counts
    counts, tmin, tmax, offs_excl, offs_incl = jax.lax.optimization_barrier(
        (counts, tmin, tmax, offs_excl, offs_incl))
    total = offs_incl[-1]
    pos = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=MAX_INST)
    pos = jax.lax.optimization_barrier(pos)
    if stage == 2:
        return pos.sum() + total
    inst_id = jnp.arange(MAX_INST, dtype=jnp.int32)
    k = inst_id - offs_excl[pos]
    in_range = (inst_id < total) & (k >= 0) & (k < counts[pos])
    rect_w = jnp.maximum(tmax[pos, 0] - tmin[pos, 0], 1)
    tile_x = tmin[pos, 0] + k % rect_w
    tile_y = tmin[pos, 1] + k // rect_w
    if stage == 3:
        return tile_x.sum() + tile_y.sum() + in_range.sum()
    gid = order[pos]
    tile_x, tile_y, gid, in_range = jax.lax.optimization_barrier((tile_x, tile_y, gid, in_range))
    contrib = will_contribute(proj.mean2d[gid], proj.conic[gid], tile_x, tile_y,
                              proj.power_threshold[gid], TS)
    valid = in_range & contrib
    tile_id = jnp.where(valid, tile_y * GW + tile_x, GW * GH)
    if stage == 4:
        return tile_id.sum() + gid.sum()
    sorted_tile_id, sorted_gid = jax.lax.sort((tile_id, gid), num_keys=1, is_stable=True)
    if stage == 5:
        return sorted_tile_id.sum() + sorted_gid.sum()
    tiles = jnp.arange(GW * GH, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile_id, tiles, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile_id, tiles + 1, side="left").astype(jnp.int32)
    return tile_start.sum() + tile_end.sum() + sorted_gid.sum()


for s in range(7):
    chain(f"project+tiles upto {s}", lambda m, s=s: upto(m, s))
