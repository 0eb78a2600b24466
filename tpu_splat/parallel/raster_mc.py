"""Multi-chip rasterizer: explicit shard_map scheduling of the Pallas blend.

Layout (BASELINE.md north star; all NEW functionality vs the single-GPU reference,
src/training/trainer.cpp:253):

  * gaussians are sharded over the mesh "gauss" axis — projection/SH run on the local
    shard only;
  * the local shard is COMPACTED to frustum-visible gaussians (fixed `gather_budget`
    slots, overflow reported so the host can grow the budget and redo — same protocol
    as the instance budget) BEFORE the collective, so the ICI transfer scales with
    visible count, not capacity;
  * each camera's projected gaussians are all-gathered over "gauss" (a
    [g * budget, ~16] f32 feature table — one ICI hop), and each chip rasterizes a
    WINDOW of tile rows of the image with the same Pallas kernels used single-chip
    (the window's global row offset rides a scalar-prefetch operand);
  * cameras (the batch axis) are sharded over "data";
  * the backward transposes automatically: shard_map differentiates through the
    all_gather into a psum_scatter of the projection gradients back to the owning shard
    (and through the compaction gather into a row scatter), and the batch-mean of the
    loss averages gradients over "data" — all collectives ride ICI, inserted by the
    shard_map transpose rules, not hand-written NCCL.

The GUT branch (distorted pinhole / fisheye cameras, ops/gut.py) runs the same schedule
with the UT projection + world-ray features (isclrot / gro / opacity / color) in place of
the EWA features; per-camera distortion coefficients are traced [B, 12] arrays.

On CPU meshes (tests, dryrun) the Pallas fast-path kernels run in interpret mode and the
GUT branch falls back to the XLA chunk-scan blend (the GUT kernels are TPU-only).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

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
from ..ops.projection import Projected, project
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


def compact_visible(proj, feats, budget: int):
    """Compact a local-shard projection (+ parallel feature pytree) to its visible rows.

    Returns (cproj, cfeats, n_visible_local). Rows beyond `budget` are DROPPED — the
    caller must surface n_visible_local so the host can grow the budget and redo
    (trainer._check_pending), exactly like the instance budget.

    All leaves are packed into ONE [n, W] f32 matrix before the row gather: TPU gathers
    are issue-bound per ROW regardless of width (~8 ms/M rows,
    tools/profiling/profile_gather_locality.py), so a per-leaf tree.map pays ~10-14
    gathers — and as many scatter-adds in the VJP — where one wide gather (one
    scatter-add transpose) does the same work. Int/bool leaves ride as exact f32
    (tile coords < 2^24) behind a stop_gradient.

    Callers must skip compaction when budget >= n (render_batch_mc does): it saves
    nothing and pays the full gather+scatter. Dead slots (beyond n_visible) gather
    DISTINCT source rows (slot i -> row i, masked invalid): a shared dummy source
    would make the VJP a [budget - n_vis]-way colliding scatter-add on one row, which
    XLA serializes — measured as the entire 68% 1-chip mesh overhead before this."""
    vis = proj.visible
    n = vis.shape[0]
    assert budget < n, "compact_visible called with budget >= n: caller must skip"
    pos = jnp.cumsum(vis.astype(jnp.int32)) - 1
    n_vis = pos[-1] + 1
    arange = jnp.arange(n, dtype=jnp.int32)
    tgt = jnp.where(vis, pos, budget)
    take = jnp.arange(budget, dtype=jnp.int32).at[tgt].set(arange, mode="drop")
    slot_ok = jnp.arange(budget, dtype=jnp.int32) < n_vis

    f32 = proj.mean2d.dtype
    diff_cols = [proj.mean2d, proj.conic, proj.opacity[:, None], proj.color,
                 proj.depth[:, None]]
    nfeat = 0
    if feats != ():
        diff_cols += [feats.isclrot.reshape(n, 9), feats.gro,
                      feats.opacity[:, None], feats.color]
        nfeat = 16
    nd_cols = jnp.concatenate(
        [
            proj.tile_min.astype(f32), proj.tile_max.astype(f32),
            proj.n_tiles.astype(f32)[:, None], proj.power_threshold[:, None],
            vis.astype(f32)[:, None],
        ],
        axis=1,
    )
    packed = jnp.concatenate(diff_cols + [jax.lax.stop_gradient(nd_cols)], axis=1)
    gg = packed[take]  # ONE row gather; VJP = ONE scatter-add back to owning rows
    off = 10 + nfeat
    nd = jax.lax.stop_gradient(gg[:, off : off + 7])
    visc = (nd[:, 6] > 0.5) & slot_ok
    cproj = Projected(
        mean2d=gg[:, 0:2],
        conic=gg[:, 2:5],
        opacity=gg[:, 5],
        color=gg[:, 6:9],
        depth=gg[:, 9],
        tile_min=nd[:, 0:2].astype(jnp.int32),
        tile_max=nd[:, 2:4].astype(jnp.int32),
        n_tiles=jnp.where(visc, nd[:, 4].astype(jnp.int32), 0),
        power_threshold=nd[:, 5],
        visible=visc,
    )
    if feats == ():
        return cproj, (), n_vis
    cfeats = _GutFeats(
        isclrot=gg[:, 10:19].reshape(budget, 3, 3),
        gro=gg[:, 19:22],
        opacity=gg[:, 22],
        color=gg[:, 23:26],
    )
    return cproj, cfeats, n_vis


class _GutFeats(NamedTuple):
    isclrot: jax.Array  # [C, 3, 3]
    gro: jax.Array  # [C, 3]
    opacity: jax.Array  # [C]
    color: jax.Array  # [C, 3]


def _window_pixel_points(grid_w: int, gh_local: int, tile_size: int, y0, dtype):
    """Pixel centers of the local tile-row window in GLOBAL image coordinates
    ([T_loc, P, 2]); `y0` is the traced global tile-row offset."""
    t = jnp.arange(grid_w * gh_local, dtype=jnp.int32)
    base_x = (t % grid_w) * tile_size
    base_y = (t // grid_w + y0) * tile_size
    off = jnp.arange(tile_size, dtype=jnp.int32)
    ox = jnp.tile(off, tile_size)
    oy = jnp.repeat(off, tile_size)
    px = base_x[:, None] + ox[None, :]
    py = base_y[:, None] + oy[None, :]
    return jnp.stack([px, py], axis=-1).astype(dtype) + 0.5


def render_batch_mc(
    mesh: Mesh,
    params: dict,  # gaussian-sharded parameter dict (means, ..., opacity_raw)
    alive: jax.Array,  # [C] bool, gaussian-sharded
    mean2d_offset: jax.Array,  # [B, C, 2] (data, gauss)-sharded per-camera grad tap
    w2cs: jax.Array,  # [B, 4, 4] data-sharded
    cam_positions: jax.Array,  # [B, 3]
    intr: jax.Array,  # [B, 4] fx fy cx cy
    sh_deg,
    bg_color: jax.Array,  # [3] replicated
    *,
    width: int,
    height: int,
    plan: Any,  # RasterPlan; max_instances/k_max/gather_budget are PER-CHIP budgets
    batch: int,
    dist: jax.Array | None = None,  # [B, 12] per-camera distortion (GUT branch)
    cam_params=None,  # static CameraParams (model/shutter) — not None selects GUT
    max_angle: float | None = None,
):
    """Renders B cameras over the mesh. Returns (images [B,3,H,W] (cropped, sharded
    data x rows), alpha [B,H,W], total_instances [chips,B_loc], max_tile [chips,B_loc],
    n_visible [chips,B_loc], n_shard_visible [chips,B_loc], visible [B,C] bool —
    the per-camera full-image visibility used by ADC densification, identical in
    semantics to the single-path RasterAux.visible)."""
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
    budget = getattr(plan, "gather_budget", None)
    gut = cam_params is not None
    if gut:
        from ..ops.cameras import bind_coeffs, pixel_rays
        from ..ops.gut import ut_project
        from ..ops.quat import quat_to_rotmat
        from ..ops.sh import sh_to_color

        if cam_params.shutter != "global" or cam_params.model == "ortho":
            raise NotImplementedError(
                "batched GUT supports global-shutter non-ortho models; rolling shutter "
                "and ORTHO use the single-camera path"
            )

    gauss = P("gauss")
    data = P("data")
    if dist is None:
        dist = jnp.zeros((batch, 12), jnp.float32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            {k: gauss for k in params}, gauss, P("data", "gauss"), data, data, data,
            data, P(), P(),
        ),
        out_specs=(
            P("data", None, "gauss", None),  # tile-row-sharded images
            P("data", "gauss", None),  # alpha
            P(("data", "gauss")), P(("data", "gauss")), P(("data", "gauss")),
            P(("data", "gauss")),
            P("data", "gauss"),  # per-camera visibility [B_loc, C_loc]
        ),
    )
    def fn(prm, alv, m2doff, w2c_l, cpos_l, intr_l, dist_l, shd, bg):
        gi = jax.lax.axis_index("gauss")
        y0 = gi * gh_loc
        imgs, alphas, tots, mxts, nvis, nshard, viss = [], [], [], [], [], [], []
        for b in range(b_loc):
            fx, fy, cx, cy = intr_l[b, 0], intr_l[b, 1], intr_l[b, 2], intr_l[b, 3]
            if gut:
                cp = bind_coeffs(cam_params, dist_l[b])
                sg = jax.lax.stop_gradient
                proj, comp = ut_project(
                    sg(prm["means"]), sg(prm["scaling_raw"]), sg(prm["rotation_raw"]),
                    sg(prm["opacity_raw"]), alv, w2c_l[b], fx, fy, cx, cy, cp,
                    width, height, ts, max_angle,
                )
                proj, comp = jax.lax.optimization_barrier((proj, comp))
                rot = quat_to_rotmat(prm["rotation_raw"])
                inv_scale = jnp.exp(-prm["scaling_raw"])
                isclrot = inv_scale[:, :, None] * jnp.swapaxes(rot, -1, -2)
                gro = jnp.einsum(
                    "nij,nj->ni", isclrot, cpos_l[b][None, :] - prm["means"]
                )
                opacity = jax.nn.sigmoid(prm["opacity_raw"][:, 0]) * sg(
                    jnp.where(proj.visible, 1.0, 0.0)
                ) * sg(comp)
                dirs = prm["means"] - cpos_l[b][None, :]
                color = jnp.maximum(
                    sh_to_color(prm["sh0"], prm["shN"], dirs, shd), 0.0
                )
                feats = _GutFeats(isclrot=isclrot, gro=gro, opacity=opacity, color=color)
            else:
                proj = project(
                    prm["means"], prm["scaling_raw"], prm["rotation_raw"],
                    prm["opacity_raw"], prm["sh0"], prm["shN"], alv,
                    w2c_l[b], cpos_l[b], fx, fy, cx, cy,
                    width, height, shd, tile_size=ts,
                )
                proj = proj._replace(mean2d=proj.mean2d + m2doff[b])
                proj = jax.lax.optimization_barrier(proj)
                feats = ()

            # full-image visibility of the local shard rows — the densification
            # signal (matches single-path RasterAux.visible, rasterize.py:233)
            vis_full = jax.lax.stop_gradient(proj.visible)
            if budget is not None and budget < proj.visible.shape[0]:
                proj, feats, n_vis_loc = compact_visible(proj, feats, budget)
            else:
                # budget >= shard capacity: compaction saves nothing (the gather
                # would touch MORE rows than the uncompacted table) — skip it.
                # Everything-visible scenes hit this; real captures with partial
                # per-camera visibility take the compacted branch.
                n_vis_loc = jnp.sum(proj.visible.astype(jnp.int32))
            # one ICI all-gather of the (compacted) projected feature table; the
            # transpose of this gather is the psum_scatter that returns gradients to
            # the owning shard
            ag = lambda x: jax.lax.all_gather(x, "gauss", axis=0, tiled=True)
            projf = jax.tree.map(ag, proj)
            featf = jax.tree.map(ag, feats)
            wproj = _window_proj(projf, y0, gh_loc)
            inst = build_sorted_instances(
                wproj, gw, gh_loc, plan.max_instances, ts, tile_y0=y0
            )
            if gut:
                pix = _window_pixel_points(gw, gh_loc, ts, y0, wproj.mean2d.dtype)
                cam_rays = pixel_rays(pix, fx, fy, cx, cy, cp, max_angle)
                rays_d = jax.lax.stop_gradient(cam_rays @ w2c_l[b][:3, :3])
                img, alpha = _gut_window_blend(
                    inst, featf, wproj, rays_d, gw, gh_loc, ts, plan.k_max,
                    interpret, width,
                )
            else:
                tc, ta, _ = blend_tiles_pallas(
                    inst, wproj.mean2d, wproj.conic, wproj.opacity,
                    jnp.maximum(wproj.color, 0.0), wproj.depth,
                    grid_w=gw, grid_h=gh_loc, tile_size=ts, k_max=plan.k_max,
                    chunk=chunk, interpret=interpret, tile_y0=y0,
                    feat_bf16=getattr(plan, "pack_bf16", False),
                )
                img, alpha = assemble_image(tc, ta, gw, gh_loc, ts, gw * ts, gh_loc * ts)
            img = img + (1.0 - alpha)[None] * bg.reshape(3, 1, 1)
            imgs.append(img)
            alphas.append(alpha)
            tots.append(inst.total_instances)
            mxts.append(inst.max_tile_count)
            nvis.append(inst.n_visible)
            nshard.append(n_vis_loc)
            viss.append(vis_full)
        return (
            jnp.stack(imgs),  # [B_loc, 3, gh_loc*ts, gw*ts]
            jnp.stack(alphas),
            jnp.stack(tots)[None],  # [1, B_loc] -> [d*g, B_loc] outside
            jnp.stack(mxts)[None],
            jnp.stack(nvis)[None],
            jnp.stack(nshard)[None],
            jnp.stack(viss),  # [B_loc, C_loc]
        )

    imgs, alphas, tots, mxts, nvis, nshard, visible = fn(
        params, alive, mean2d_offset, w2cs, cam_positions, intr, dist, sh_deg, bg_color
    )
    return (
        imgs[:, :, :height, :width],
        alphas[:, :height, :width],
        tots, mxts, nvis, nshard, visible,
    )


def _gut_window_blend(inst, featf: _GutFeats, wproj, rays_d, gw: int, gh_loc: int,
                      ts: int, k_max: int, interpret: bool, width: int):
    """GUT blend of one tile-row window: Pallas kernels on TPU, XLA chunk scan on CPU."""
    if not interpret:
        from ..ops.pallas.gut_kernels import gut_blend_tiles_pallas

        rays4 = jnp.concatenate([rays_d, jnp.zeros_like(rays_d[:, :, :1])], axis=-1)
        tc, ta, _ = gut_blend_tiles_pallas(
            inst, featf.isclrot, featf.gro, featf.opacity, featf.color, wproj.depth,
            rays4, grid_w=gw, grid_h=gh_loc, tile_size=ts, k_max=k_max,
        )
    else:
        from ..ops.gut import _gut_blend, _GutBlendInputs
        from ..ops.tiles import TileAssignment

        assign = TileAssignment(
            gaussian_idx=inst.sorted_gid,
            tile_start=inst.tile_start,
            tile_count=inst.tile_count,
            total_instances=inst.total_instances,
            max_tile_count=inst.max_tile_count,
            n_visible=inst.n_visible,
        )
        gin = _GutBlendInputs(
            isclrot=featf.isclrot, gro=featf.gro, opacity=featf.opacity,
            color=featf.color, depth=wproj.depth,
        )
        out, ta = _gut_blend(
            assign, gin, rays_d, gw, gh_loc, ts, k_max, chunk=8, want_depth=False
        )
        tc = out[:, :, :3]
    return assemble_image(tc, ta, gw, gh_loc, ts, gw * ts, gh_loc * ts)
