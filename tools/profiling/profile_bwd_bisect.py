"""Bisect the bwd-kernel cost at ts=32 / chunk=256: DMA loop vs scans vs grads."""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import align_segments, build_sorted_instances
from tpu_splat.ops.pallas import blend as B

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
GW, GH = -(-W // TS), -(-H // TS)
n_tiles = GW * GH
P = TS * TS
MAX_INST = 1 << 21
K_MAX = 2048
splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"],
        cam["cy"])


def chain(name, fn, x0, *args, iters=8):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


@jax.jit
def prep(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    return p, build_sorted_instances(p, GW, GH, MAX_INST, TS)


proj, inst = jax.tree.map(jax.device_put, prep(splat.means))
max_chunks = K_MAX // CH
(row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows) = jax.tree.map(
    jax.device_put, align_segments(inst, n_tiles, max_chunks, CH))
feats = jnp.stack([proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0], proj.conic[:, 1],
                   proj.conic[:, 2], proj.opacity, proj.color[:, 0], proj.color[:, 1],
                   proj.color[:, 2], proj.depth], axis=1)
packed0 = jax.device_put(jnp.pad(feats[aligned_gid], ((0, 0), (0, B.NFEAT - 10))).reshape(
    n_rows, CH, B.NFEAT).transpose(0, 2, 1))
statics = dict(n_tiles=n_tiles, grid_w=GW, tile_size=TS, max_chunks=max_chunks, chunk=CH)
out0, chk0 = jax.tree.map(jax.device_put, B.blend_forward(
    packed0, row_start, count_capped, **statics))
gout0 = jax.device_put(jnp.ones((n_tiles, P, 8), jnp.float32) * 1e-3)


def make_bwd(level):
    """level 0: DMA loop only; 1: +alpha+cumprod; 2: +cdotg/suffix; 3: full."""

    def kernel(row_start_ref, count_ref, packed_ref, chk_ref, out_ref, gout_ref,
               gzero_ref, gpacked_ref, buf, gbuf, sems, gsems, *, grid_w, tile_size,
               chunk):
        del gzero_ref
        t = pl.program_id(0)
        row0 = row_start_ref[t]
        count = count_ref[t]
        nch = (count + chunk - 1) // chunk
        p = tile_size * tile_size
        px, py = B._pixel_coords(t, grid_w, tile_size, p)
        lane = B._lane_iota_row(chunk)
        chk_col = jax.lax.broadcasted_iota(jnp.int32, (p, chk_ref.shape[2]), 1)
        gr = gout_ref[0, :, 0:1]
        gg = gout_ref[0, :, 1:2]
        gb = gout_ref[0, :, 2:3]
        gt = gout_ref[0, :, 3:4]
        gd = gout_ref[0, :, 4:5]
        t_final = out_ref[0, :, 3:4]
        s0 = t_final * gt

        def in_dma(slot, j):
            return pltpu.make_async_copy(packed_ref.at[row0 + j], buf.at[slot],
                                         sems.at[slot])

        def out_dma(slot, j):
            return pltpu.make_async_copy(gbuf.at[slot], gpacked_ref.at[row0 + j],
                                         gsems.at[slot])

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
            if level == 0:
                grads = data
                s_new = s_carry
            else:
                t_in = jnp.sum(jnp.where(chk_col == j, chk_ref[0], 0.0), axis=-1,
                               keepdims=True)
                lane_valid = lane < (count - j * chunk)
                a, valid, one_m = B._chunk_alphas(data, px, py, lane_valid)
                cp_incl = B._lane_cumprod(one_m)
                t_excl = t_in * B._exclusive_from_inclusive_prod(cp_incl)
                t_incl = t_in * cp_incl
                use = valid & (t_incl >= B.TRANSMITTANCE_THRESHOLD)
                usef = jnp.where(use, 1.0, 0.0)
                w = usef * a * t_excl
                if level == 1:
                    grads = jnp.concatenate(
                        [w[:1, :] * 0 + jnp.sum(w, axis=0, keepdims=True),
                         jnp.zeros((B.NFEAT - 1, chunk), jnp.float32)], axis=0)
                    s_new = s_carry
                else:
                    cr = data[B.F_R:B.F_R + 1, :]
                    cg = data[B.F_G:B.F_G + 1, :]
                    cb_ = data[B.F_B:B.F_B + 1, :]
                    cd = data[B.F_D:B.F_D + 1, :]
                    cdotg = cr * gr + cg * gg + cb_ * gb + cd * gd
                    u = w * cdotg
                    cum_u = B._lane_cumsum(u)
                    total_u = cum_u[:, chunk - 1:chunk]
                    suffix = (total_u - cum_u) + s_carry
                    dL_da = usef * (t_excl * cdotg - suffix / one_m)
                    if level == 2:
                        grads = jnp.concatenate(
                            [jnp.sum(dL_da, axis=0, keepdims=True),
                             jnp.zeros((B.NFEAT - 1, chunk), jnp.float32)], axis=0)
                    else:
                        op = data[B.F_OP:B.F_OP + 1, :]
                        mx = data[B.F_MX:B.F_MX + 1, :]
                        my = data[B.F_MY:B.F_MY + 1, :]
                        ca = data[B.F_CA:B.F_CA + 1, :]
                        cb2 = data[B.F_CB:B.F_CB + 1, :]
                        cc = data[B.F_CC:B.F_CC + 1, :]
                        dx = mx - px
                        dy = my - py
                        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb2 * dx * dy
                        gauss = jnp.exp(-jnp.maximum(sigma, 0.0))
                        not_clamped = jnp.where(op * gauss < B.MAX_FRAGMENT_ALPHA, 1.0, 0.0)
                        dL_dsigma = dL_da * (-a) * not_clamped
                        ones_p = jnp.ones((1, p), jnp.float32)
                        stacked = jnp.concatenate(
                            [dL_dsigma * (ca * dx + cb2 * dy),
                             dL_dsigma * (cc * dy + cb2 * dx),
                             dL_dsigma * 0.5 * dx * dx,
                             dL_dsigma * dx * dy,
                             dL_dsigma * 0.5 * dy * dy,
                             dL_da * gauss * not_clamped,
                             w * gr, w * gg, w * gb, w * gd], axis=1)
                        red10 = jax.lax.dot_general(
                            ones_p, stacked, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        grads = jnp.concatenate(
                            [red10[:, i2 * chunk:(i2 + 1) * chunk] for i2 in range(10)]
                            + [jnp.zeros((B.NFEAT - 10, chunk), jnp.float32)], axis=0)
                    s_new = s_carry + total_u if level >= 2 else s_carry

            @pl.when(i >= 2)
            def _():
                out_dma(slot, j).wait()

            gbuf[slot] = grads
            out_dma(slot, j).start()
            return s_new

        _ = jax.lax.fori_loop(0, nch, body, s0)

        @pl.when(nch >= 1)
        def _():
            out_dma(jax.lax.rem(jnp.int32(0), 2), 0).wait()

        @pl.when(nch >= 2)
        def _():
            out_dma(jax.lax.rem(jnp.int32(1), 2), 0).wait()

    @functools.partial(jax.jit, static_argnames=())
    def run(packed, rs, cc, chk, out, gout):
        gzero = jnp.zeros(packed.shape, jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, P, max_chunks), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, B.NFEAT, CH), jnp.float32),
                pltpu.VMEM((2, B.NFEAT, CH), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(kernel, grid_w=GW, tile_size=TS, chunk=CH),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
            input_output_aliases={6: 0},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024),
        )(rs, cc, packed, chk, out, gout, gzero)

    return run


for lvl, nm in [(0, "L0 DMA loop only"), (1, "L1 +alpha+cumprod"),
                (2, "L2 +cdotg+suffix"), (3, "L3 full")]:
    run = make_bwd(lvl)
    chain(f"bwd {nm}", lambda x, pk, rs, cc, ck, o, go, r=run: jnp.sum(
        r(pk + x, rs, cc, ck, o, go)), jnp.float32(0),
        packed0, row_start, count_capped, chk0, out0, gout0)
