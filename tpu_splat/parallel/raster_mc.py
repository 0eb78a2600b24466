"""Multi-chip rasterizer: explicit shard_map scheduling of the Pallas blend.

Layout (BASELINE.md north star; all NEW functionality vs the single-GPU reference,
src/training/trainer.cpp:253):

  * gaussians are sharded over the mesh "gauss" axis — projection/SH run on the local
    shard only;
  * each camera's PROJECTED gaussians are all-gathered over "gauss" (a [N, ~16] f32
    feature table, ~64 MB at 1M — one ICI hop), and each chip rasterizes a WINDOW of
    tile rows of the image with the same Pallas kernels used single-chip (the window's
    global row offset rides a scalar-prefetch operand);
  * cameras (the batch axis) are sharded over "data";
  * the backward transposes automatically: shard_map differentiates through the
    all_gather into a psum_scatter of the projection gradients back to the owning shard,
    and the batch-mean of the loss averages gradients over "data" — all collectives ride
    ICI, inserted by the shard_map transpose rules, not hand-written NCCL.

On CPU meshes (tests, dryrun) the Pallas kernels run in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8: pallas calls don't report vma, so disable the varying-axes check
    from jax import shard_map as _smap

    def shard_map(f, **kw):
        return _smap(f, check_vma=False, **kw)
except ImportError:  # pragma: no cover - older jax
    import functools as _ft

    from jax.experimental.shard_map import shard_map as _smap_old

    def shard_map(f, **kw):
        return _smap_old(f, check_rep=False, **kw)

from ..ops.pallas.raster import blend_tiles_pallas, build_sorted_instances
from ..ops.projection import project
from ..ops.rasterize import assemble_image


def _window_proj(proj, y0, gh_local: int):
    """Restrict a full projection to tile rows [y0, y0 + gh_local): local tile coords,
    rect areas recomputed, off-window gaussians culled."""
    tmin_y = jnp.clip(proj.tile_min[:, 1] - y0, 0, gh_local)
    tmax_y = jnp.clip(proj.tile_max[:, 1] - y0, 0, gh_local)
    n_tiles = (proj.tile_max[:, 0] - proj.tile_min[:, 0]) * (tmax_y - tmin_y)
    visible = proj.visible & (n_tiles > 0)
    n_tiles = jnp.where(visible, n_tiles, 0)
    return proj._replace(
        tile_min=jnp.stack([proj.tile_min[:, 0], tmin_y], axis=1),
        tile_max=jnp.stack([proj.tile_max[:, 0], tmax_y], axis=1),
        n_tiles=n_tiles,
        visible=visible,
    )


def render_batch_mc(
    mesh: Mesh,
    params: dict,  # gaussian-sharded parameter dict (means, ..., opacity_raw)
    alive: jax.Array,  # [C] bool, gaussian-sharded
    mean2d_offset: jax.Array,  # [C, 2] gaussian-sharded (densification grad tap)
    w2cs: jax.Array,  # [B, 4, 4] data-sharded
    cam_positions: jax.Array,  # [B, 3]
    intr: jax.Array,  # [B, 4] fx fy cx cy
    sh_deg,
    bg_color: jax.Array,  # [3] replicated
    *,
    width: int,
    height: int,
    plan: Any,  # RasterPlan; max_instances/k_max are PER-CHIP budgets here
    batch: int,
):
    """Renders B cameras over the mesh. Returns (images [B,3,H,W] (cropped, sharded
    data x rows), alpha [B,H,W], total_instances [chips,B_loc], max_tile [chips,B_loc],
    n_visible [chips,B_loc])."""
    d = mesh.shape["data"]
    g = mesh.shape["gauss"]
    ts = plan.tile_size
    chunk = plan.chunk if plan.chunk in (128, 256) else 128
    gw = -(-width // ts)
    gh = -(-height // ts)
    gh_pad = -(-gh // g) * g
    gh_loc = gh_pad // g
    assert batch % d == 0, f"batch {batch} not divisible by mesh data={d}"
    b_loc = batch // d
    interpret = jax.devices()[0].platform == "cpu"

    gauss = P("gauss")
    data = P("data")

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            {k: gauss for k in params}, gauss, gauss, data, data, data, P(), P(),
        ),
        out_specs=(
            P("data", None, "gauss", None),  # tile-row-sharded images
            P("data", "gauss", None),  # alpha
            P(("data", "gauss")), P(("data", "gauss")), P(("data", "gauss")),
        ),
    )
    def fn(prm, alv, m2doff, w2c_l, cpos_l, intr_l, shd, bg):
        gi = jax.lax.axis_index("gauss")
        y0 = gi * gh_loc
        imgs, alphas, tots, mxts, nvis = [], [], [], [], []
        for b in range(b_loc):
            proj = project(
                prm["means"], prm["scaling_raw"], prm["rotation_raw"],
                prm["opacity_raw"], prm["sh0"], prm["shN"], alv,
                w2c_l[b], cpos_l[b],
                intr_l[b, 0], intr_l[b, 1], intr_l[b, 2], intr_l[b, 3],
                width, height, shd, tile_size=ts,
            )
            proj = proj._replace(mean2d=proj.mean2d + m2doff)
            proj = jax.lax.optimization_barrier(proj)
            # one ICI all-gather of the projected feature table; the transpose of this
            # gather is the psum_scatter that returns gradients to the owning shard
            projf = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "gauss", axis=0, tiled=True), proj
            )
            wproj = _window_proj(projf, y0, gh_loc)
            inst = build_sorted_instances(
                wproj, gw, gh_loc, plan.max_instances, ts, tile_y0=y0
            )
            tc, ta, _ = blend_tiles_pallas(
                inst, wproj.mean2d, wproj.conic, wproj.opacity,
                jnp.maximum(wproj.color, 0.0), wproj.depth,
                grid_w=gw, grid_h=gh_loc, tile_size=ts, k_max=plan.k_max,
                chunk=chunk, interpret=interpret, tile_y0=y0,
            )
            img, alpha = assemble_image(tc, ta, gw, gh_loc, ts, gw * ts, gh_loc * ts)
            img = img + (1.0 - alpha)[None] * bg.reshape(3, 1, 1)
            imgs.append(img)
            alphas.append(alpha)
            tots.append(inst.total_instances)
            mxts.append(inst.max_tile_count)
            nvis.append(inst.n_visible)
        return (
            jnp.stack(imgs),  # [B_loc, 3, gh_loc*ts, gw*ts]
            jnp.stack(alphas),
            jnp.stack(tots)[None],  # [1, B_loc] -> [d*g, B_loc] outside
            jnp.stack(mxts)[None],
            jnp.stack(nvis)[None],
        )

    imgs, alphas, tots, mxts, nvis = fn(
        params, alive, mean2d_offset, w2cs, cam_positions, intr, sh_deg, bg_color
    )
    return (
        imgs[:, :, :height, :width],
        alphas[:, :height, :width],
        tots, mxts, nvis,
    )
