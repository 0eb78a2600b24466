"""GUT path: Unscented-Transform projection + world-space per-pixel ray rasterizer.

Reference: the `--gut` pipeline (3DGUT, arXiv 2412.12507) —
  * UT projection `ProjectionUT3DGSFused.cu:17-289` + sigma points
    `Cameras.cuh:1035-1150`: 7 sigma points from the closed-form covariance sqrt
    (sqrt(Sigma) columns = s_i * R[:, i]), pushed through the (possibly distorted) camera
    model; image mean/cov recovered by UT weights (alpha=0.1, beta=2, kappa=0).
  * projection tail `ProjectionUT3DGSFused.cu:136-202` (SURVEY.md §8.5): eps2d=0.3 blur
    with compensation = sqrt(det_before/det_after), opacity *= compensation, alpha cull,
    opacity-aware extent min(3.33, sqrt(2 ln(opac*255))), anisotropic radii, depth = cam z.
  * world-space rasterizer `RasterizeToPixelsFromWorld3DGSFwd.cu:207-241` (SURVEY.md §8.6):
    per gaussian M = S^-1 R^T; per pixel ray (o, d): gro = M (o - mu),
    grd = normalize(M d), power = -0.5 |grd x gro|^2 (max response along the ray),
    alpha = min(0.999, opac exp(power)); background composited in-kernel as pix + T*bg
    (:271-275).

TPU design: the UT projection is plain vectorized XLA under stop_gradient (non-diff in the
reference too — gradients reach the 3D parameters through the world-space blend instead).
The blend has two backends like the fast path: Pallas kernels on TPU
(ops/pallas/gut_kernels.py — the hot path, ~10x the XLA scan) and a `jax.checkpoint`ed
XLA chunk scan on CPU (also the numerical reference for the kernel parity check,
tools/gut_parity_check.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .blend import composite_chunk
from .cameras import (
    CameraParams,
    fisheye_max_angle,
    pixel_rays,
    pixel_world_rays_shutter,
    project_points,
    project_points_shutter,
    quat_rotate,
)
from .projection import MAX_FRAGMENT_ALPHA, MIN_ALPHA, Projected
from .quat import quat_to_rotmat, quat_to_rotmat_cols
from .rasterize import RasterAux, RenderOutput, assemble_image
from .sh import sh_to_color
from .tiles import build_tile_assignment

UT_ALPHA = 0.1
UT_BETA = 2.0
UT_KAPPA = 0.0
EPS2D = 0.3
MAX_EXTENT = 3.33  # ProjectionUT3DGSFused.cu:160


def ut_project(
    means, scaling_raw, rotation_raw, opacity_raw, alive,
    w2c, fx, fy, cx, cy, cam_params: CameraParams,
    width: int, height: int, tile_size: int, max_angle: float | None,
    shutter_pose=None,  # (q_start, t_start, q_end, t_end) when shutter != global
):
    """UT projection of all gaussians -> Projected-compatible struct + compensation."""
    f32 = means.dtype
    d = 3
    lam = UT_ALPHA * UT_ALPHA * (d + UT_KAPPA) - d
    wm0 = lam / (d + lam)
    wc0 = wm0 + (1.0 - UT_ALPHA * UT_ALPHA + UT_BETA)
    wi = 1.0 / (2.0 * (d + lam))
    sqrt_dl = jnp.sqrt(jnp.asarray(d + lam, f32))

    rot = quat_to_rotmat(rotation_raw)  # [N,3,3]
    scale = jnp.exp(scaling_raw)  # [N,3]
    # sigma points [N, 7, 3]: mu, mu +- sqrt(d+lam) * s_i * R[:, i]
    deltas = sqrt_dl * scale[:, None, :] * jnp.swapaxes(rot, -1, -2)  # [N,3(i),3] rows = s_i R[:,i]
    pts = jnp.concatenate(
        [means[:, None], means[:, None] + deltas, means[:, None] - deltas], axis=1
    )  # [N,7,3]

    r3 = w2c[:3, :3]
    t3 = w2c[:3, 3]
    cam_pts = pts @ r3.T + t3  # [N,7,3]
    if cam_params.shutter == "global" or shutter_pose is None:
        img_pts, pt_valid = project_points(
            cam_pts, fx, fy, cx, cy, cam_params, width, height, max_angle=max_angle
        )  # [N,7,2], [N,7]
    else:
        # iterative shutter-aware projection (Cameras.cuh:346-414)
        q_s, t_s, q_e, t_e = shutter_pose
        img_pts, pt_valid = project_points_shutter(
            pts, q_s, t_s, q_e, t_e, fx, fy, cx, cy, cam_params, width, height,
            cam_params.shutter, max_angle=max_angle,
        )

    weights_m = jnp.asarray([wm0] + [wi] * 6, f32)
    weights_c = jnp.asarray([wc0] + [wi] * 6, f32)
    mean2d = jnp.einsum("s,nsk->nk", weights_m, img_pts)
    dev = img_pts - mean2d[:, None]
    cov2d = jnp.einsum("s,nsi,nsj->nij", weights_c, dev, dev)  # [N,2,2]
    # require_all_sigma_points_valid = false default: any valid point suffices
    valid = alive & jnp.any(pt_valid, axis=1)

    depth = cam_pts[:, 0, 2]  # camera z of the mean
    valid &= depth > 0.01

    # ---- projection tail (SURVEY.md §8.5)
    det_before = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    cov_a = cov2d[:, 0, 0] + EPS2D
    cov_b = cov2d[:, 0, 1]
    cov_c = cov2d[:, 1, 1] + EPS2D
    det_after = cov_a * cov_c - cov_b * cov_b
    valid &= det_after > 0
    safe_det = jnp.where(det_after > 1e-12, det_after, 1.0)
    compensation = jnp.sqrt(jnp.maximum(det_before, 0.0) / safe_det)
    conic = jnp.stack([cov_c / safe_det, -cov_b / safe_det, cov_a / safe_det], axis=-1)

    opacity = jax.nn.sigmoid(opacity_raw[:, 0]) * compensation
    valid &= opacity >= MIN_ALPHA

    extend = jnp.minimum(
        MAX_EXTENT, jnp.sqrt(jnp.maximum(2.0 * jnp.log(opacity * 255.0), 0.0))
    )
    rx = jnp.ceil(extend * jnp.sqrt(jnp.maximum(cov_a, 0.0)))
    ry = jnp.ceil(extend * jnp.sqrt(jnp.maximum(cov_c, 0.0)))
    valid &= (rx > 0) & (ry > 0)

    gw = -(-width // tile_size)
    gh = -(-height // tile_size)
    ts = jnp.asarray(float(tile_size), f32)
    x_min = jnp.clip(jnp.floor((mean2d[:, 0] - rx) / ts).astype(jnp.int32), 0, gw)
    x_max = jnp.clip(jnp.ceil((mean2d[:, 0] + rx) / ts).astype(jnp.int32), 0, gw)
    y_min = jnp.clip(jnp.floor((mean2d[:, 1] - ry) / ts).astype(jnp.int32), 0, gh)
    y_max = jnp.clip(jnp.ceil((mean2d[:, 1] + ry) / ts).astype(jnp.int32), 0, gh)
    n_tiles = (x_max - x_min) * (y_max - y_min)
    valid &= n_tiles > 0
    n_tiles = jnp.where(valid, n_tiles, 0)

    proj = Projected(
        mean2d=mean2d,
        conic=conic,
        opacity=opacity,
        color=jnp.zeros((means.shape[0], 3), f32),  # colors come from the SH node
        depth=depth,
        tile_min=jnp.stack([x_min, y_min], axis=-1),
        tile_max=jnp.stack([x_max, y_max], axis=-1),
        n_tiles=n_tiles,
        # gsplat's tile intersection is radius-rect based (IntersectTile.cu), no
        # per-tile contribution test: +inf threshold makes will_contribute pass
        power_threshold=jnp.full((means.shape[0],), jnp.inf, f32),
        visible=valid,
    )
    return proj, compensation


class _GutBlendInputs(NamedTuple):
    isclrot: jnp.ndarray  # [N, 3, 3] S^-1 R^T
    gro: jnp.ndarray  # [N, 3] M (ray_o - mu)
    opacity: jnp.ndarray  # [N]
    color: jnp.ndarray  # [N, 3] clamped
    depth: jnp.ndarray  # [N]


def _gut_blend(
    assign, gin: _GutBlendInputs, rays_d, grid_w: int, grid_h: int, tile_size: int,
    k_max: int, chunk: int, want_depth: bool, delta_o=None,
):
    """Chunked world-ray blend (RasterizeToPixelsFromWorld3DGSFwd.cu:207-241 semantics)."""
    n_tiles = grid_w * grid_h
    p = tile_size * tile_size
    f32 = gin.gro.dtype
    n_chunks = max(1, -(-k_max // chunk))
    max_inst = assign.gaussian_idx.shape[0]
    kc = 4 if want_depth else 3
    colmat = gin.color
    if want_depth:
        colmat = jnp.concatenate([colmat, gin.depth[:, None]], axis=1)

    def body(carry, ci):
        accum, t_run, dead = carry
        local = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
        inst_valid = local[None, :] < jnp.minimum(assign.tile_count, k_max)[:, None]
        pos = jnp.clip(assign.tile_start[:, None] + local[None, :], 0, max_inst - 1)
        g = assign.gaussian_idx[pos]  # [T,C]

        m = gin.isclrot[g]  # [T,C,3,3]
        gro = gin.gro[g]  # [T,C,3]
        o = gin.opacity[g]  # [T,C]
        col = colmat[g]  # [T,C,kc]

        grd = jnp.einsum(
            "tcij,tpj->tcpi", m, rays_d, precision=jax.lax.Precision.HIGHEST
        )  # [T,C,P,3]
        grd = grd / jnp.maximum(jnp.linalg.norm(grd, axis=-1, keepdims=True), 1e-12)
        gro_pp = gro[:, :, None, :]
        if delta_o is not None:
            # rolling shutter: ray origins vary per pixel; gro(p) = gro + M delta_o(p)
            gro_pp = gro_pp + jnp.einsum(
                "tcij,tpj->tcpi", m, delta_o, precision=jax.lax.Precision.HIGHEST
            )
        cr = jnp.cross(grd, gro_pp)  # [T,C,P,3]
        power = -0.5 * jnp.sum(cr * cr, axis=-1)  # [T,C,P]
        alpha = jnp.minimum(o[:, :, None] * jnp.exp(power), MAX_FRAGMENT_ALPHA)
        valid = (alpha >= MIN_ALPHA) & inst_valid[:, :, None]
        a = jnp.where(valid, alpha, 0.0)

        w, t_new, dead_new = composite_chunk(a, valid, t_run, dead, axis=1)
        accum = accum + jnp.einsum("tcp,tck->tpk", w, col, preferred_element_type=f32)
        return (accum, t_new, dead_new), None

    init = (
        jnp.zeros((n_tiles, p, kc), f32),
        jnp.ones((n_tiles, p), f32),
        jnp.zeros((n_tiles, p), bool),
    )
    (accum, t_run, _), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return accum, 1.0 - t_run


def _tile_pixel_points(grid_w: int, grid_h: int, tile_size: int, dtype):
    t = jnp.arange(grid_w * grid_h, dtype=jnp.int32)
    base_x = (t % grid_w) * tile_size
    base_y = (t // grid_w) * tile_size
    off = jnp.arange(tile_size, dtype=jnp.int32)
    ox = jnp.tile(off, tile_size)
    oy = jnp.repeat(off, tile_size)
    px = base_x[:, None] + ox[None, :]
    py = base_y[:, None] + oy[None, :]
    return jnp.stack([px, py], axis=-1).astype(dtype) + 0.5  # [T,P,2]


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_instances", "k_max", "chunk", "tile_size",
        "cam_params", "render_mode", "max_angle", "backend", "kernel_vmm",
    ),
)
def rasterize_gut(
    means, scaling_raw, rotation_raw, opacity_raw, sh0, shN, alive,
    w2c, cam_position, fx, fy, cx, cy,
    active_sh_degree,
    bg_color,
    *,
    width: int,
    height: int,
    max_instances: int,
    k_max: int,
    chunk: int = 8,
    tile_size: int = 16,
    cam_params: CameraParams = CameraParams(),
    render_mode: str = "RGB",
    max_angle: float | None = None,
    backend: str = "auto",  # "pallas" (TPU kernel) | "xla" (scan blend) | "auto"
    shutter_pose=None,  # (q_start [4], t_start [3], q_end [4], t_end [3]) arrays
    dist=None,  # [12] traced distortion coeffs (radial6|tan2|tp4); overrides cam_params
    kernel_vmm: bool = False,  # v = M d on the MXU inside the Pallas kernels (A/B flag)
) -> RenderOutput:
    """Differentiable GUT render of one camera (distorted pinhole / fisheye).

    Projection (UT) is non-differentiable, matching the reference
    (ProjectionUT3DGSFused is a plain kernel, not an autograd Function); gradients flow to
    the 3D parameters through the world-space ray response and SH colors.

    `dist` makes the distortion coefficients per-sample device values: only the camera
    MODEL selects a compile variant, so heterogeneous multi-camera rigs render each view
    with its own coefficients without recompiling (include/core/camera.hpp:16-125).
    """
    from .cameras import bind_coeffs
    from .rasterize import default_backend

    if backend == "auto":
        backend = default_backend()
    cam_params = bind_coeffs(cam_params, dist)
    if cam_params.model == "fisheye" and max_angle is None:
        max_angle = fisheye_max_angle(cam_params)
    grid_w = -(-width // tile_size)
    grid_h = -(-height // tile_size)

    rolling = cam_params.shutter != "global" and shutter_pose is not None
    ortho = cam_params.model == "ortho"
    proj, compensation = ut_project(
        jax.lax.stop_gradient(means), jax.lax.stop_gradient(scaling_raw),
        jax.lax.stop_gradient(rotation_raw), jax.lax.stop_gradient(opacity_raw),
        alive, w2c, fx, fy, cx, cy, cam_params, width, height, tile_size, max_angle,
        shutter_pose=None if shutter_pose is None else tuple(
            jax.lax.stop_gradient(x) for x in shutter_pose
        ),
    )
    proj, compensation = jax.lax.optimization_barrier((proj, compensation))

    # differentiable per-gaussian quantities, in FLAT COLUMN form: building
    # isclrot = S^-1 R^T via broadcast-multiplied [N,3,3] transposes gives autodiff a
    # relayout-heavy VJP (same pathology as the fast path's einsum covariance chain,
    # tools/profiling/profile_parambwd.py) — flat columns keep the backward fused,
    # with one final stack for the kernel's [N,3,3] input
    rc = quat_to_rotmat_cols(rotation_raw)
    inv_scale = jnp.exp(-scaling_raw)  # [N,3]
    # isclrot[k, j] = inv_s_k * R_jk (row k of S^-1 R^T)
    isr = [[inv_scale[:, k] * rc[j][k] for j in range(3)] for k in range(3)]
    isclrot = jnp.stack(
        [jnp.stack(row, axis=-1) for row in isr], axis=-2
    )  # [N,3,3] S^-1 R^T
    ray_o = cam_position
    d_o = ray_o[None, :] - means  # [N,3]
    gro = jnp.stack(
        [isr[k][0] * d_o[:, 0] + isr[k][1] * d_o[:, 1] + isr[k][2] * d_o[:, 2]
         for k in range(3)],
        axis=-1,
    )
    opacity = jax.nn.sigmoid(opacity_raw[:, 0]) * jax.lax.stop_gradient(
        jnp.where(proj.visible, 1.0, 0.0)
    )
    # AA compensation multiplies opacity (rasterizer.cpp:305-311); non-diff factor
    opacity = opacity * jax.lax.stop_gradient(compensation)

    dirs = means - cam_position[None, :]
    color = jnp.maximum(sh_to_color(sh0, shN, dirs, active_sh_degree), 0.0)

    # per-pixel world rays through the camera model (non-diff)
    pix = _tile_pixel_points(grid_w, grid_h, tile_size, means.dtype)  # [T,P,2]
    delta_o = None
    if rolling:
        q_s, t_s, q_e, t_e = (jax.lax.stop_gradient(x) for x in shutter_pose)
        ray_o_pp, rays_d = pixel_world_rays_shutter(
            pix, q_s, t_s, q_e, t_e, fx, fy, cx, cy, cam_params, width, height,
            cam_params.shutter, max_angle,
        )
        rays_d = jax.lax.stop_gradient(rays_d)
        delta_o = jax.lax.stop_gradient(ray_o_pp - cam_position[None, None, :])
    else:
        cam_rays = pixel_rays(pix, fx, fy, cx, cy, cam_params, max_angle)  # [T,P,3]
        rays_d = jax.lax.stop_gradient(cam_rays @ w2c[:3, :3])  # world directions
        if ortho:
            # parallel rays: per-pixel world-space origin offsets ride the same
            # delta_o path the rolling shutter uses
            from .cameras import ortho_ray_origins

            delta_o = jax.lax.stop_gradient(
                ortho_ray_origins(pix, fx, fy, cx, cy) @ w2c[:3, :3]
            )

    want_depth = render_mode != "RGB"
    if backend == "pallas":
        from .pallas.gut_kernels import gut_blend_tiles_pallas
        from .pallas.raster import build_sorted_instances

        inst = build_sorted_instances(proj, grid_w, grid_h, max_instances, tile_size)
        pad1 = jnp.zeros_like(rays_d[:, :, :1])
        if delta_o is None:
            rays_in = jnp.concatenate([rays_d, pad1], axis=-1)  # [T, P, 4]
        else:
            # rolling shutter / ORTHO: per-pixel origin offsets ride cols 4-6 and the
            # kernel computes gro(p) = gro + M delta_o(p) (Cameras.cuh:346-414)
            rays_in = jnp.concatenate([rays_d, pad1, delta_o, pad1], axis=-1)  # [T,P,8]
        tile_colors, tile_alpha, tile_depth = gut_blend_tiles_pallas(
            inst, isclrot, gro, opacity, color, proj.depth, rays_in,
            grid_w=grid_w, grid_h=grid_h, tile_size=tile_size, k_max=k_max,
            interpret=jax.devices()[0].platform == "cpu", vmm=kernel_vmm,
        )
        tile_out = jnp.concatenate([tile_colors, tile_depth[:, :, None]], axis=-1)
        counters = (inst.total_instances, inst.max_tile_count, inst.n_visible)
    else:
        assign = build_tile_assignment(proj, grid_w, grid_h, max_instances, tile_size)
        gin = _GutBlendInputs(
            isclrot=isclrot, gro=gro, opacity=opacity, color=color, depth=proj.depth
        )
        tile_out, tile_alpha = _gut_blend(
            assign, gin, rays_d, grid_w, grid_h, tile_size, k_max, chunk, want_depth,
            delta_o=delta_o,
        )
        counters = (assign.total_instances, assign.max_tile_count, assign.n_visible)
    image, alpha = assemble_image(
        tile_out[:, :, :3], tile_alpha, grid_w, grid_h, tile_size, width, height
    )
    depth = None
    if want_depth and tile_out.shape[-1] > 3:
        dimg, _ = assemble_image(
            tile_out[:, :, 3:4], tile_alpha, grid_w, grid_h, tile_size, width, height
        )
        depth = dimg[0]
        if render_mode in ("ED", "RGB_ED"):
            depth = depth / jnp.maximum(alpha, 1e-10)
    if bg_color is not None:
        image = image + (1.0 - alpha)[None] * jnp.asarray(bg_color).reshape(3, 1, 1)

    aux = RasterAux(
        total_instances=counters[0],
        max_tile_count=counters[1],
        n_visible=counters[2],
        visible=jax.lax.stop_gradient(proj.visible),
    )
    return RenderOutput(image=image, alpha=alpha, aux=aux, depth=depth)
