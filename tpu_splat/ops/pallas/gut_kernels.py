"""Pallas TPU kernels for the GUT world-space ray blend — forward + backward.

TPU-native replacement for the reference's 3DGUT rasterizer
(gsplat/RasterizeToPixelsFromWorld3DGSFwd.cu:20-442 and ...Bwd.cu:17-561). Per
(pixel, gaussian): v = M d (M = S^-1 R^T, d = pixel's world ray), n = v/|v|,
c = n x gro (gro = M (ray_o - mu)), power = -1/2 |c|^2 (max response along the ray),
alpha = min(0.999, opac exp(power)) — SURVEY.md §8.6.

Same compositing/checkpoint structure as blend.py (one lane cumprod per chunk, per-chunk
transmittance checkpoints, replay backward), with the ray-response chain rule replacing the
conic one: gradients flow to M (9), gro (3), opacity, rgb and depth. The reference's
backward recomputes per-pixel rays and warp-reduces with atomics (Bwd.cu:340-344); here
per-gaussian gradients are lane-reductions into disjoint chunk rows.

Feature rows (NFEAT_GUT = 32, two (16,128) f32 tiles per chunk):
  0-8: M row-major | 9-11: gro xyz | 12: opacity | 13-15: rgb | 16: depth.
Per-tile world rays arrive as a [T, P, 4] input block (xyz + pad), precomputed in XLA
through the camera model (cameras.py), matching the reference's per-pixel
image_point_to_camera_ray (Cameras.cuh:962-1000).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend import (
    CHUNK,
    MAX_FRAGMENT_ALPHA,
    MIN_ALPHA,
    TRANSMITTANCE_THRESHOLD,
    _lane_exclusive_cumsum_f32,
    _lane_iota_row,
    _mm,
    _strict_lower,
    _strict_upper,
)

NFEAT_GUT = 32
(F_M00, F_M01, F_M02, F_M10, F_M11, F_M12, F_M20, F_M21, F_M22,
 F_GX, F_GY, F_GZ, F_OP, F_R, F_G, F_B, F_D) = range(17)


def _ray_response(data, rdx, rdy, rdz, lane_valid, do=None, rd_hl=None):
    """alpha + masks + residuals for one chunk.

    data [32, 128]; rd* [P, 1]. `do` = per-pixel ray-origin offsets (dox, doy, doz)
    [P, 1] each (rolling shutter / ORTHO, Cameras.cuh:346-414): the effective
    gro(p) = gro + M delta_o(p) varies per pixel. Returns (a, valid, one_m, resid dict)
    with [P, C] arrays; resid g1/g2/g3 are the effective gro ([1, C] or [P, C]).

    `rd_hl` = hi/lo bf16 split of the [P, 3] ray-direction basis (built once per tile):
    when present, v = M d moves onto the MXU as ONE [P, 3] x [3, 3C] matmul series
    (hh + hl + lh, ~2^-17 relative) instead of ~15 VPU passes."""
    def row(i):
        return data[i : i + 1, :]

    if rd_hl is not None:
        # v_j = rd . M[j, :] as a [P, 3] x [3, C] matmul per output row; the M rows are
        # CONTIGUOUS [3, C] sublane slices of the feature block (a lane-concat of rows
        # at different sublane offsets is unimplemented in Mosaic — the single
        # [3, 3C]-RHS form crashes the compiler)
        rdh, rdl = rd_hl

        def vslice(lo):
            m = data[lo : lo + 3, :]  # [3, C] = (M[j,0], M[j,1], M[j,2]) over gaussians
            mh = m.astype(jnp.bfloat16)
            ml = (m - mh.astype(jnp.float32)).astype(jnp.bfloat16)
            return _mm(rdh, mh) + _mm(rdh, ml) + _mm(rdl, mh)  # [P, C] f32 accum

        v1 = vslice(F_M00)
        v2 = vslice(F_M10)
        v3 = vslice(F_M20)
    else:
        v1 = row(F_M00) * rdx + row(F_M01) * rdy + row(F_M02) * rdz  # [P, C]
        v2 = row(F_M10) * rdx + row(F_M11) * rdy + row(F_M12) * rdz
        v3 = row(F_M20) * rdx + row(F_M21) * rdy + row(F_M22) * rdz
    vv = v1 * v1 + v2 * v2 + v3 * v3
    inorm = jax.lax.rsqrt(jnp.maximum(vv, 1e-24))
    n1, n2, n3 = v1 * inorm, v2 * inorm, v3 * inorm
    gx, gy, gz = row(F_GX), row(F_GY), row(F_GZ)
    if do is not None:
        dox, doy, doz = do
        gx = gx + row(F_M00) * dox + row(F_M01) * doy + row(F_M02) * doz  # [P, C]
        gy = gy + row(F_M10) * dox + row(F_M11) * doy + row(F_M12) * doz
        gz = gz + row(F_M20) * dox + row(F_M21) * doy + row(F_M22) * doz
    c1 = n2 * gz - n3 * gy
    c2 = n3 * gx - n1 * gz
    c3 = n1 * gy - n2 * gx
    power = -0.5 * (c1 * c1 + c2 * c2 + c3 * c3)
    e = jnp.exp(power)
    alpha_raw = row(F_OP) * e
    alpha = jnp.minimum(alpha_raw, MAX_FRAGMENT_ALPHA)
    valid = (alpha >= MIN_ALPHA) & lane_valid
    a = jnp.where(valid, alpha, 0.0)
    resid = dict(n1=n1, n2=n2, n3=n3, inorm=inorm, c1=c1, c2=c2, c3=c3, e=e,
                 alpha_raw=alpha_raw, g1=gx, g2=gy, g3=gz)
    return a, valid, 1.0 - a, resid


# ------------------------------------------------------------------------------- forward


def _gut_fwd_kernel(
    row_start_ref, count_ref,
    packed_ref,  # [R, 32, 128] HBM
    rays_ref,  # [1, P, 4|8] VMEM (world ray dirs; cols 4-6 = origin offsets if present)
    out_ref,  # [1, P, 8] VMEM: rgb, T_final, depth-accum
    chk_ref,  # [1, P, MAXC] VMEM
    buf, chk_s, sems,
    *,
    tile_size: int,
    per_pixel_origin: bool = False,
    vmm: bool = False,
):
    t = pl.program_id(0)
    row0 = row_start_ref[t]
    count = count_ref[t]
    nch = (count + CHUNK - 1) // CHUNK
    p = tile_size * tile_size
    maxc = chk_ref.shape[2]
    chk_col = jax.lax.broadcasted_iota(jnp.int32, (p, maxc), 1)
    chk_s[:] = jnp.zeros((p, maxc), jnp.float32)
    lane = _lane_iota_row(CHUNK)
    u_strict = _strict_upper(CHUNK)
    rdx = rays_ref[0, :, 0:1]  # [P, 1]
    rdy = rays_ref[0, :, 1:2]
    rdz = rays_ref[0, :, 2:3]
    do = (rays_ref[0, :, 4:5], rays_ref[0, :, 5:6], rays_ref[0, :, 6:7]) \
        if per_pixel_origin else None
    rd_hl = None
    if vmm:
        rd = jnp.concatenate([rdx, rdy, rdz], axis=-1)  # [P, 3]
        rdh = rd.astype(jnp.bfloat16)
        rd_hl = (rdh, (rd - rdh.astype(jnp.float32)).astype(jnp.bfloat16))

    def get_dma(slot, j):
        return pltpu.make_async_copy(packed_ref.at[row0 + j], buf.at[slot], sems.at[slot])

    @pl.when(nch > 0)
    def _():
        get_dma(0, 0).start()

    def cond(c):
        j, r, g, b, dep, t_run, dead = c
        return (j < nch) & (jnp.min(dead) < 0.5)

    def body(c):
        j, r, g, b, dep, t_run, dead = c
        slot = jax.lax.rem(j, 2)
        get_dma(slot, j).wait()

        @pl.when(j + 1 < nch)
        def _():
            get_dma(1 - slot, j + 1).start()

        data = buf[slot]  # [32, 128]
        chk_s[:] = jnp.where(chk_col == j, jnp.where(dead > 0.5, 0.0, t_run), chk_s[:])

        lane_valid = lane < (count - j * CHUNK)
        a, valid, one_m, _ = _ray_response(data, rdx, rdy, rdz, lane_valid, do=do,
                                           rd_hl=rd_hl)
        # exclusive cumprod via exp(bf16-split MXU log-prefix); rest of
        # _composite_chunk inlined on top of cp_excl (see blend.py _fwd_kernel)
        cp_excl = jnp.exp(_lane_exclusive_cumsum_f32(jnp.log(one_m), u_strict))
        t_excl = t_run * cp_excl
        t_incl = t_excl * one_m
        below = t_incl < TRANSMITTANCE_THRESHOLD
        alive_px = dead < 0.5
        use = valid & ~below & alive_px
        w = jnp.where(use, a * t_excl, 0.0)
        t_candidate = jnp.min(jnp.where(below, t_run, t_incl), axis=-1, keepdims=True)
        t_new = jnp.where(alive_px, t_candidate, t_run)
        triggered = jnp.max(jnp.where(valid & below, 1.0, 0.0), axis=-1, keepdims=True)
        dead_new = jnp.maximum(dead, triggered)

        # rgb+depth accumulation as ONE MXU matmul instead of 4 lane reductions
        col4 = jnp.transpose(data[F_R : F_D + 1, :])  # [C, 4]
        acc = _mm(w, col4)
        return (j + 1, r + acc[:, 0:1], g + acc[:, 1:2], b + acc[:, 2:3],
                dep + acc[:, 3:4], t_new, dead_new)

    zero = jnp.zeros((p, 1), jnp.float32)
    j, r, g, b, dep, t_run, dead = jax.lax.while_loop(
        cond, body, (jnp.int32(0), zero, zero, zero, zero, zero + 1.0, zero)
    )

    @pl.when(j < nch)
    def _():
        get_dma(jax.lax.rem(j, 2), j).wait()

    chk_ref[0] = chk_s[:]
    out_ref[0] = jnp.concatenate(
        [r, g, b, t_run, dep, jnp.zeros((p, 3), jnp.float32)], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("n_tiles", "tile_size", "max_chunks",
                                             "interpret", "vmm"))
def gut_blend_forward(packed, rays, row_start, tile_count, *, n_tiles, tile_size,
                      max_chunks, interpret: bool = False, vmm: bool = False):
    p = tile_size * tile_size
    rw = rays.shape[-1]  # 4 (shared origin) or 8 (per-pixel origin offsets in 4-6)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, p, rw), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, p, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, max_chunks), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NFEAT_GUT, CHUNK), jnp.float32),
            pltpu.VMEM((p, max_chunks), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gut_fwd_kernel, tile_size=tile_size,
                          per_pixel_origin=rw == 8, vmm=vmm),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, p, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, max_chunks), jnp.float32),
        ),
        # [P, C] intermediates exceed the 16 MiB default scoped-vmem budget at tile 32
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(row_start, tile_count, packed, rays)


# ------------------------------------------------------------------------------ backward


def _gut_bwd_kernel(
    row_start_ref, count_ref,
    packed_ref,  # [R, 32, 128] HBM
    rays_ref,  # [1, P, 4] VMEM
    chk_ref,  # [1, P, MAXC] VMEM
    out_ref,  # [1, P, 8] VMEM
    gout_ref,  # [1, P, 8] VMEM
    gzero_ref,  # [R, 32, 128] HBM (aliased zero-init output)
    gpacked_ref,  # [R, 32, 128] HBM output
    buf, gbuf, sems, gsems,
    *,
    tile_size: int,
    per_pixel_origin: bool = False,
    vmm: bool = False,
):
    del gzero_ref
    t = pl.program_id(0)
    row0 = row_start_ref[t]
    count = count_ref[t]
    nch = (count + CHUNK - 1) // CHUNK
    # replay only up to the last live chunk (see blend.py _bwd_kernel): dead-tail
    # chunks have zero checkpoints and zero grads via the aliased zero-init
    maxc_i = chk_ref.shape[2]
    live_cols = jnp.max(chk_ref[0], axis=0, keepdims=True)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, maxc_i), 1)
    last_live = jnp.max(jnp.where(live_cols > 0.0, col_ids, -1))
    nch = jnp.minimum(nch, last_live + 1)
    p = tile_size * tile_size
    lane = _lane_iota_row(CHUNK)
    chk_col = jax.lax.broadcasted_iota(jnp.int32, (p, chk_ref.shape[2]), 1)
    u_strict = _strict_upper(CHUNK)
    s_lower = _strict_lower(CHUNK)
    rdx = rays_ref[0, :, 0:1]
    rdy = rays_ref[0, :, 1:2]
    rdz = rays_ref[0, :, 2:3]
    do = (rays_ref[0, :, 4:5], rays_ref[0, :, 5:6], rays_ref[0, :, 6:7]) \
        if per_pixel_origin else None
    rd_hl = None
    if vmm:
        rd = jnp.concatenate([rdx, rdy, rdz], axis=-1)  # [P, 3]
        rdh = rd.astype(jnp.bfloat16)
        rd_hl = (rdh, (rd - rdh.astype(jnp.float32)).astype(jnp.bfloat16))

    gr = gout_ref[0, :, 0:1]
    gg = gout_ref[0, :, 1:2]
    gb = gout_ref[0, :, 2:3]
    gt = gout_ref[0, :, 3:4]
    gd = gout_ref[0, :, 4:5]
    t_final = out_ref[0, :, 3:4]
    s0 = t_final * gt

    def in_dma(slot, j):
        return pltpu.make_async_copy(packed_ref.at[row0 + j], buf.at[slot], sems.at[slot])

    def out_dma(slot, j):
        return pltpu.make_async_copy(gbuf.at[slot], gpacked_ref.at[row0 + j], gsems.at[slot])

    @pl.when(nch > 0)
    def _():
        in_dma(jax.lax.rem(nch - 1, 2), nch - 1).start()

    def body(i, s_carry):
        j = nch - 1 - i
        slot = jax.lax.rem(j, 2)
        in_dma(slot, j).wait()

        @pl.when(j - 1 >= 0)
        def _():
            in_dma(1 - slot, j - 1).start()

        data = buf[slot]
        t_in = jnp.sum(jnp.where(chk_col == j, chk_ref[0], 0.0), axis=-1, keepdims=True)

        lane_valid = lane < (count - j * CHUNK)
        a, valid, one_m, rs = _ray_response(data, rdx, rdy, rdz, lane_valid, do=do,
                                            rd_hl=rd_hl)
        # exclusive lane cumprod via exp(bf16-split MXU log-prefix) — see blend.py
        cp_excl = jnp.exp(_lane_exclusive_cumsum_f32(jnp.log(one_m), u_strict))
        t_excl = t_in * cp_excl
        t_incl = t_excl * one_m
        use = valid & (t_incl >= TRANSMITTANCE_THRESHOLD)
        usef = jnp.where(use, 1.0, 0.0)
        w = usef * a * t_excl

        def row(idx):
            return data[idx : idx + 1, :]

        cr, cg, cb_, cd = row(F_R), row(F_G), row(F_B), row(F_D)
        cdotg = cr * gr + cg * gg + cb_ * gb + cd * gd
        u = w * cdotg
        # strictly-later-lane suffix sum as one MXU matmul (total rides for free)
        sfx = _mm(u, s_lower)
        total_u = sfx[:, 0:1] + u[:, 0:1]
        suffix = sfx + s_carry
        dL_da = usef * (t_excl * cdotg - suffix / one_m)

        notcl = jnp.where(rs["alpha_raw"] < MAX_FRAGMENT_ALPHA, 1.0, 0.0)
        dL_dpow = dL_da * rs["alpha_raw"] * notcl
        g_op = jnp.sum(dL_da * rs["e"] * notcl, axis=0, keepdims=True)  # [1, C]

        dc1 = dL_dpow * (-rs["c1"])
        dc2 = dL_dpow * (-rs["c2"])
        dc3 = dL_dpow * (-rs["c3"])
        # effective gro (includes the per-pixel M delta_o term when present)
        gx, gy, gz = rs["g1"], rs["g2"], rs["g3"]
        n1, n2, n3 = rs["n1"], rs["n2"], rs["n3"]
        # dL/dn = gro x dL/dc ; dL/dgro = dL/dc x n
        dn1 = gy * dc3 - gz * dc2
        dn2 = gz * dc1 - gx * dc3
        dn3 = gx * dc2 - gy * dc1
        dg1 = dc2 * n3 - dc3 * n2
        dg2 = dc3 * n1 - dc1 * n3
        dg3 = dc1 * n2 - dc2 * n1
        # n = v / |v|: dv = inorm * (dn - n (n . dn))
        ndn = n1 * dn1 + n2 * dn2 + n3 * dn3
        inorm = rs["inorm"]
        dv1 = inorm * (dn1 - n1 * ndn)
        dv2 = inorm * (dn2 - n2 * ndn)
        dv3 = inorm * (dn3 - n3 * ndn)

        def red(x):
            return jnp.sum(x, axis=0, keepdims=True)  # [1, C]

        if per_pixel_origin:
            # gro(p) = gro + M delta_o(p): M picks up the dg (x) delta_o outer
            # product on top of the dv (x) rd one, summed inside the same reduction
            dox, doy, doz = do
            m_terms = [
                dv1 * rdx + dg1 * dox, dv1 * rdy + dg1 * doy, dv1 * rdz + dg1 * doz,
                dv2 * rdx + dg2 * dox, dv2 * rdy + dg2 * doy, dv2 * rdz + dg2 * doz,
                dv3 * rdx + dg3 * dox, dv3 * rdy + dg3 * doy, dv3 * rdz + dg3 * doz,
            ]
        else:
            m_terms = [
                dv1 * rdx, dv1 * rdy, dv1 * rdz,
                dv2 * rdx, dv2 * rdy, dv2 * rdz,
                dv3 * rdx, dv3 * rdy, dv3 * rdz,
            ]
        grads = jnp.concatenate(
            [red(x) for x in m_terms]
            + [
                red(dg1), red(dg2), red(dg3),
                g_op,
                red(w * gr), red(w * gg), red(w * gb), red(w * gd),
                jnp.zeros((NFEAT_GUT - 17, CHUNK), jnp.float32),
            ],
            axis=0,
        )  # [32, 128]

        @pl.when(i >= 2)
        def _():
            out_dma(slot, j).wait()

        gbuf[slot] = grads
        out_dma(slot, j).start()
        return s_carry + total_u

    _ = jax.lax.fori_loop(0, nch, body, s0)

    @pl.when(nch >= 1)
    def _():
        out_dma(0, 0).wait()

    @pl.when(nch >= 2)
    def _():
        out_dma(1, 0).wait()


@functools.partial(jax.jit, static_argnames=("n_tiles", "tile_size", "max_chunks",
                                             "interpret", "vmm"))
def gut_blend_backward(packed, rays, row_start, tile_count, chk, out, gout, *,
                       n_tiles, tile_size, max_chunks, interpret: bool = False,
                       vmm: bool = False):
    p = tile_size * tile_size
    rw = rays.shape[-1]
    gzero = jnp.zeros(packed.shape, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, p, rw), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, max_chunks), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, NFEAT_GUT, CHUNK), jnp.float32),
            pltpu.VMEM((2, NFEAT_GUT, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gut_bwd_kernel, tile_size=tile_size,
                          per_pixel_origin=rw == 8, vmm=vmm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        input_output_aliases={7: 0},  # gzero (indices include scalar-prefetch operands)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(row_start, tile_count, packed, rays, chk, out, gout, gzero)


# ------------------------------------------------------------------ custom-VJP wrapper


def gut_blend_tiles_pallas(
    inst,  # raster.SortedInstances (from build_sorted_instances over the UT projection)
    isclrot: jnp.ndarray,  # [N, 3, 3] S^-1 R^T
    gro: jnp.ndarray,  # [N, 3] M (ray_o - mu)
    opacity: jnp.ndarray,  # [N] sigmoid * compensation
    color: jnp.ndarray,  # [N, 3] clamped >= 0
    depth: jnp.ndarray,  # [N]
    rays: jnp.ndarray,  # [T, P, 4] ray dirs (xyz+pad); [T, P, 8] adds per-pixel origin
    #                     offsets in cols 4-6 (rolling shutter / ORTHO)
    *,
    grid_w: int,
    grid_h: int,
    tile_size: int,
    k_max: int,
    interpret: bool = False,
    vmm: bool = False,  # v = M d on the MXU (hi/lo bf16 [P,3]x[3,3C]); A/B'd on hardware
):
    """Pallas GUT blend. Returns (tile_colors [T,P,3], tile_alpha [T,P], tile_depth)."""
    from .raster import align_segments, segmented_grad_reduce

    n_tiles = grid_w * grid_h
    n = gro.shape[0]
    k_max_al = ((k_max + CHUNK - 1) // CHUNK) * CHUNK
    max_chunks = min(k_max_al // CHUNK, 128)
    p = tile_size * tile_size

    (row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows) = align_segments(
        inst, n_tiles, max_chunks
    )
    statics = dict(n_tiles=n_tiles, tile_size=tile_size, max_chunks=max_chunks,
                   interpret=interpret, vmm=vmm)

    def _pack(m, g, op, col, dep, gid):
        feats = jnp.concatenate(
            [m.reshape(n, 9), g, op[:, None], col, dep[:, None]], axis=1
        )  # [N, 17]
        gathered = jax.lax.optimization_barrier(feats[gid])  # [MAX_AL, 17]
        packed = jnp.pad(gathered, ((0, 0), (0, NFEAT_GUT - 17)))
        return packed.reshape(n_rows, CHUNK, NFEAT_GUT).transpose(0, 2, 1)

    @jax.custom_vjp
    def core(m, g, op, col, dep, ry, gid, rstart, count, qem, rank, seg_s, seg_e):
        packed = _pack(m, g, op, col, dep, gid)
        out, _ = gut_blend_forward(packed, ry, rstart, count, **statics)
        return out[:, :, :5]

    def core_fwd(m, g, op, col, dep, ry, gid, rstart, count, qem, rank, seg_s, seg_e):
        packed = _pack(m, g, op, col, dep, gid)
        out, chk = gut_blend_forward(packed, ry, rstart, count, **statics)
        return out[:, :, :5], (packed, chk, out, ry, gid, rstart, count, qem, rank,
                               seg_s, seg_e)

    def core_bwd(res, g5):
        packed, chk, out, ry, gid, rstart, count, qem, rank, seg_s, seg_e = res
        gout = jnp.concatenate([g5, jnp.zeros((n_tiles, p, 3), jnp.float32)], axis=-1)
        gpacked = gut_blend_backward(packed, ry, rstart, count, chk, out, gout, **statics)
        ginst = jnp.stack(
            [gpacked[:, f, :].reshape(-1) for f in range(17)], axis=1
        )  # [MAX_AL, 17]
        acc = segmented_grad_reduce(ginst, qem, rank, seg_s, seg_e,
                                    gather_dtype=jnp.float32)
        g_m = acc[:, 0:9].reshape(n, 3, 3)
        g_gro = acc[:, 9:12]
        g_op = acc[:, 12]
        g_col = acc[:, 13:16]
        g_dep = acc[:, 16]

        def f0(y):
            import numpy as np

            return np.zeros(y.shape, dtype=jax.dtypes.float0)

        return (g_m, g_gro, g_op, g_col, g_dep, f0(ry), f0(gid), f0(rstart), f0(count),
                f0(qem), f0(rank), f0(seg_s), f0(seg_e))

    core.defvjp(core_fwd, core_bwd)

    out5 = core(isclrot, gro, opacity, color, depth,
                jax.lax.stop_gradient(rays), aligned_gid, row_start, count_capped,
                qa_emis, inst.emis_rank, inst.emis_start, inst.emis_end)
    return out5[:, :, 0:3], 1.0 - out5[:, :, 3], out5[:, :, 4]
