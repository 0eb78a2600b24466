"""Tiled differentiable rasterizer — the TPU-native `fast_rasterize` path.

Composition (mirrors fastgs/rasterization/src/forward.cu:15-199 stage for stage, but as pure
XLA over static shapes):

  project (projection.py) -> build_tile_assignment (tiles.py) -> chunked blend scan (below)

The blend walks per-tile depth-sorted instance lists in chunks of `chunk` gaussians under
`lax.scan`; each chunk evaluates alpha at all tile pixels as dense vector math and accumulates
color with one batched [P,chunk]x[chunk,3] matmul (MXU). The scan body is `jax.checkpoint`ed,
so the backward pass replays each chunk from the scan carry — functionally identical to the
reference's per-32-primitive (color, transmittance) bucket checkpoints + transmittance-replay
backward (forward.cu:160-178, kernels_backward.cuh:240-449), but derived by autodiff instead
of a hand-written kernel, and with segment-sums instead of atomics (the gather transpose).

Static-shape plan: `max_instances` (instance budget) and `k_max` (per-tile list capacity,
= chunk * n_chunks) are host-chosen pow2 buckets; the trainer grows them when the returned
`aux` counters approach the budget and redoes the (rare) overflowing step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .blend import alpha_and_valid, composite_chunk, pixel_sigma
from .projection import Projected, project
from .tiles import TileAssignment, build_tile_assignment


class RasterAux(NamedTuple):
    total_instances: jnp.ndarray  # [] int32 — compare against max_instances for overflow
    max_tile_count: jnp.ndarray  # [] int32 — compare against k_max for truncation
    n_visible: jnp.ndarray  # [] int32
    visible: jnp.ndarray  # [N] bool — per-gaussian visibility (densification info counts)


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # [3, H, W]
    alpha: jnp.ndarray  # [H, W]
    aux: RasterAux
    depth: jnp.ndarray | None = None  # [H, W] accumulated (D) or expected (ED) depth


def _tile_pixel_centers(grid_w: int, grid_h: int, tile_size: int, dtype) -> jnp.ndarray:
    """Pixel-center coordinates per tile: [T, P, 2] with P = tile_size^2."""
    t = jnp.arange(grid_w * grid_h, dtype=jnp.int32)
    base_x = (t % grid_w) * tile_size
    base_y = (t // grid_w) * tile_size
    off = jnp.arange(tile_size, dtype=jnp.int32)
    ox = jnp.tile(off, tile_size)  # fast axis: x (row-major pixels within tile)
    oy = jnp.repeat(off, tile_size)
    px = base_x[:, None] + ox[None, :]
    py = base_y[:, None] + oy[None, :]
    return jnp.stack([px, py], axis=-1).astype(dtype) + 0.5


def blend_tiles(
    assign: TileAssignment,
    mean2d: jnp.ndarray,  # [N, 2]
    conic: jnp.ndarray,  # [N, 3]
    opacity: jnp.ndarray,  # [N]
    color: jnp.ndarray,  # [N, 3] (unclamped; clamped >= 0 here)
    grid_w: int,
    grid_h: int,
    tile_size: int,
    k_max: int,
    chunk: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tile_colors [T, P, 3], tile_alpha [T, P])."""
    n_tiles = grid_w * grid_h
    p = tile_size * tile_size
    f32 = mean2d.dtype
    n_chunks = max(1, -(-k_max // chunk))

    pix = _tile_pixel_centers(grid_w, grid_h, tile_size, f32)  # [T,P,2]
    color_clamped = jnp.maximum(color, 0.0)
    max_inst = assign.gaussian_idx.shape[0]

    def body(carry, ci):
        accum, t_run, dead = carry
        local = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)  # [C]
        inst_valid = local[None, :] < jnp.minimum(assign.tile_count, k_max)[:, None]
        pos = jnp.clip(assign.tile_start[:, None] + local[None, :], 0, max_inst - 1)
        g = assign.gaussian_idx[pos]  # [T,C]

        m = mean2d[g]  # [T,C,2]
        k = conic[g]  # [T,C,3]
        o = opacity[g]  # [T,C]
        col = color_clamped[g]  # [T,C,3]

        sigma = pixel_sigma(m[:, :, None, :], k[:, :, None, :], pix[:, None, :, :])  # [T,C,P]
        a, valid = alpha_and_valid(sigma, o[:, :, None], inst_valid[:, :, None])

        w, t_new, dead_new = composite_chunk(a, valid, t_run, dead, axis=1)  # w [T,C,P]
        accum = accum + jnp.einsum("tcp,tck->tpk", w, col, preferred_element_type=w.dtype)
        return (accum, t_new, dead_new), None

    init = (
        jnp.zeros((n_tiles, p, color.shape[-1]), f32),
        jnp.ones((n_tiles, p), f32),
        jnp.zeros((n_tiles, p), bool),
    )
    (accum, t_run, _), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return accum, 1.0 - t_run


def assemble_image(
    tile_colors: jnp.ndarray,  # [T, P, K]
    tile_alpha: jnp.ndarray,  # [T, P]
    grid_w: int,
    grid_h: int,
    tile_size: int,
    width: int,
    height: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[T, P, K] tiles -> (image [K, H, W], alpha [H, W]), cropping tile padding."""
    ts = tile_size
    k = tile_colors.shape[-1]
    img = tile_colors.reshape(grid_h, grid_w, ts, ts, k)
    img = img.transpose(4, 0, 2, 1, 3).reshape(k, grid_h * ts, grid_w * ts)
    alpha = tile_alpha.reshape(grid_h, grid_w, ts, ts)
    alpha = alpha.transpose(0, 2, 1, 3).reshape(grid_h * ts, grid_w * ts)
    return img[:, :height, :width], alpha[:height, :width]


def default_backend() -> str:
    """Pallas blend on real TPU hardware, XLA scan blend elsewhere (CPU tests)."""
    try:
        return "pallas" if jax.devices()[0].platform != "cpu" else "xla"
    except Exception:
        return "xla"


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_instances", "k_max", "chunk", "tile_size", "backend",
        "render_mode", "pack_bf16",
    ),
)
def rasterize(
    means, scaling_raw, rotation_raw, opacity_raw, sh0, shN, alive,
    w2c, cam_position, fx, fy, cx, cy,
    active_sh_degree,
    bg_color,  # [3] or None
    *,
    width: int,
    height: int,
    max_instances: int,
    k_max: int,
    chunk: int = 64,
    tile_size: int = 16,
    backend: str = "auto",  # "pallas" (TPU kernel) | "xla" (scan blend) | "auto"
    render_mode: str = "RGB",  # RGB | D | ED | RGB_D | RGB_ED (rasterizer.hpp:25-32)
    mean2d_offset=None,  # [N,2] zeros; pass to read dL/dmean2d for densification
    pack_bf16: bool = False,  # bf16 hi/lo feature pack on the pallas path (blend.py)
) -> RenderOutput:
    """End-to-end differentiable fast-path render of one camera.

    Background is composited OUTSIDE the blend as image + (1-alpha)*bg
    (fast_rasterizer.cpp:63), so bg does not receive gradients through the blend.
    Render modes follow the reference (rasterizer.hpp:25-32): D accumulates alpha-weighted
    camera-space depth, ED normalizes it by alpha (expected depth).
    """
    if backend == "auto":
        backend = default_backend()
    grid_w = -(-width // tile_size)
    grid_h = -(-height // tile_size)

    proj = project(
        means, scaling_raw, rotation_raw, opacity_raw, sh0, shN, alive,
        w2c, cam_position, fx, fy, cx, cy, width, height, active_sh_degree,
        tile_size=tile_size,
    )
    mean2d = proj.mean2d if mean2d_offset is None else proj.mean2d + mean2d_offset
    proj = proj._replace(mean2d=mean2d)
    # Materialize the projection before the tile stage: without this, XLA fuses the whole
    # per-gaussian projection chain into each of the ~4M instance gathers below
    # (recompute-in-fusion), turning a ~10 ms stage into ~400 ms on TPU.
    proj = jax.lax.optimization_barrier(proj)

    want_depth = render_mode != "RGB"
    tile_depth = None
    if backend == "pallas":
        from .pallas.raster import blend_tiles_pallas, build_sorted_instances

        inst = build_sorted_instances(proj, grid_w, grid_h, max_instances, tile_size)
        tile_colors, tile_alpha, tile_depth = blend_tiles_pallas(
            inst, proj.mean2d, proj.conic, proj.opacity,
            jnp.maximum(proj.color, 0.0), proj.depth,
            grid_w=grid_w, grid_h=grid_h, tile_size=tile_size, k_max=k_max,
            chunk=chunk if chunk in (128, 256) else 128,  # kernel lane-chunk width
            feat_bf16=pack_bf16,
            interpret=jax.devices()[0].platform == "cpu",  # CPU tests run the kernels
        )
        counters = (inst.total_instances, inst.max_tile_count, inst.n_visible)
    else:
        assign = build_tile_assignment(proj, grid_w, grid_h, max_instances, tile_size)
        colmat = proj.color
        if want_depth:
            # depth rides as a 4th blend channel (it is positive, unaffected by the
            # color clamp inside blend_tiles)
            colmat = jnp.concatenate([colmat, proj.depth[:, None]], axis=1)
        tile_out, tile_alpha = blend_tiles(
            assign, proj.mean2d, proj.conic, proj.opacity, colmat,
            grid_w, grid_h, tile_size, k_max, chunk,
        )
        tile_colors = tile_out[:, :, :3]
        if want_depth:
            tile_depth = tile_out[:, :, 3]
        counters = (assign.total_instances, assign.max_tile_count, assign.n_visible)
    image, alpha = assemble_image(
        tile_colors, tile_alpha, grid_w, grid_h, tile_size, width, height
    )
    depth = None
    if want_depth and tile_depth is not None:
        dimg, _ = assemble_image(
            tile_depth[:, :, None], tile_alpha, grid_w, grid_h, tile_size, width, height
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
