"""Tile-intersection pipeline: depth ordering, instance emission, tile sort, ranges.

TPU-native replacement for the reference's CUB machinery (fastgs/rasterization/src/forward.cu:
depth radix sort -> exclusive scan -> warp-cooperative `create_instances_cu` -> tile radix
sort -> `extract_instance_ranges_cu`). Here:

  * depth ordering: one stable argsort over N gaussians;
  * emission: `jnp.repeat(..., total_repeat_length=MAX_INST)` expands each gaussian to its
    conservative tile-rect instances IN DEPTH ORDER, so a later *stable* sort by tile id alone
    yields per-tile depth-sorted lists (no packed 64-bit keys needed);
  * the exact StopThePop per-tile contribution test (kernel_utils.cuh:108-143) is applied per
    *emitted* instance (not in a counting prepass like the reference's
    `compute_exact_n_touched_tiles`): failing instances get a sentinel tile id and sort to the
    tail, shrinking per-tile lists. Conservative counting only affects the static MAX_INST
    budget, never correctness.

All shapes are static: MAX_INST is a host-chosen budget (pow2-bucketed, grown on demand by the
trainer). Overflow is reported via `total_instances` so the host can redo the step with a
bigger plan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Projected, will_contribute


class TileAssignment(NamedTuple):
    gaussian_idx: jnp.ndarray  # [MAX_INST] int32 — original gaussian index per instance, tile-sorted
    tile_start: jnp.ndarray  # [n_tiles] int32
    tile_count: jnp.ndarray  # [n_tiles] int32
    total_instances: jnp.ndarray  # [] int32 (may exceed MAX_INST => overflow)
    max_tile_count: jnp.ndarray  # [] int32
    n_visible: jnp.ndarray  # [] int32


def build_tile_assignment(
    proj: Projected,
    grid_w: int,
    grid_h: int,
    max_instances: int,
    tile_size: int = 16,
) -> TileAssignment:
    n = proj.depth.shape[0]
    n_tiles = grid_w * grid_h

    # Materialize the projection: XLA otherwise fuses the per-gaussian projection chain
    # into each ~4M-element instance gather below (recompute-in-fusion; measured ~80x cost).
    proj = jax.lax.optimization_barrier(proj)

    # 1. depth ordering of gaussians (invisible sort to the end)
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)  # [N]

    counts = proj.n_tiles[order].astype(jnp.int32)  # [N] 0 for culled
    tmin = proj.tile_min[order]
    tmax = proj.tile_max[order]

    offs_incl = jnp.cumsum(counts)
    offs_excl = offs_incl - counts
    total = offs_incl[-1]

    # 2. emission: instance -> position within depth-ordered gaussian list
    pos = jnp.repeat(
        jnp.arange(n, dtype=jnp.int32), counts, total_repeat_length=max_instances
    )  # [MAX_INST]
    inst_id = jnp.arange(max_instances, dtype=jnp.int32)
    k = inst_id - offs_excl[pos]
    in_range = (inst_id < total) & (k >= 0) & (k < counts[pos])

    rect_w = jnp.maximum(tmax[pos, 0] - tmin[pos, 0], 1)
    tile_x = tmin[pos, 0] + k % rect_w
    tile_y = tmin[pos, 1] + k // rect_w

    # 3. exact per-tile contribution test (replaces the reference's exact-count prepass)
    gid = order[pos]
    contrib = will_contribute(
        proj.mean2d[gid],
        proj.conic[gid],
        tile_x,
        tile_y,
        proj.power_threshold[gid],
        tile_size,
    )
    valid = in_range & contrib

    tile_id = jnp.where(valid, tile_y * grid_w + tile_x, n_tiles)  # sentinel tail

    # 4. stable sort by tile id: emission order is depth order, so stability gives
    #    per-tile front-to-back order (same invariant as the reference's two radix sorts)
    sorted_tile_id, sorted_gid = jax.lax.sort(
        (tile_id, gid), num_keys=1, is_stable=True
    )

    # 5. per-tile ranges
    tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile_id, tiles, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile_id, tiles + 1, side="left").astype(jnp.int32)
    tile_count = tile_end - tile_start

    return TileAssignment(
        gaussian_idx=sorted_gid,
        tile_start=tile_start,
        tile_count=tile_count,
        total_instances=total,
        max_tile_count=jnp.max(tile_count),
        n_visible=jnp.sum(proj.visible.astype(jnp.int32)),
    )
