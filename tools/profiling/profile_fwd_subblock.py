"""Pixel-sub-blocking experiment: does splitting the [P=1024, C=256] chunk compute into
PB-row sub-blocks (fewer live vregs) speed up the fwd kernel?"""
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
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


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


def make_fwd(pb):
    nblk = P // pb

    def kernel(row_start_ref, count_ref, y0_ref, packed_ref, out_ref, chk_ref,
               buf, chk_s, sems, *, grid_w, tile_size, chunk):
        t = pl.program_id(0)
        row0 = row_start_ref[t]
        count = count_ref[t]
        nch = (count + chunk - 1) // chunk
        p = tile_size * tile_size
        px, py = B._pixel_coords(t, grid_w, tile_size, p, y0_ref[0])
        maxc = chk_ref.shape[2]
        chk_col = jax.lax.broadcasted_iota(jnp.int32, (p, maxc), 1)
        chk_s[:] = jnp.zeros((p, maxc), jnp.float32)
        lane = B._lane_iota_row(chunk)

        def get_dma(slot, j):
            return pltpu.make_async_copy(packed_ref.at[row0 + j], buf.at[slot],
                                         sems.at[slot])

        @pl.when(nch > 0)
        def _():
            get_dma(0, 0).start()

        def cond(c):
            j, acc4, t_run, dead = c
            return (j < nch) & (jnp.min(dead) < 0.5)

        def body(c):
            j, acc4, t_run, dead = c
            slot = jax.lax.rem(j, 2)
            get_dma(slot, j).wait()

            @pl.when(j + 1 < nch)
            def _():
                get_dma(1 - slot, j + 1).start()

            data = buf[slot]
            chk_s[:] = jnp.where(chk_col == j, jnp.where(dead > 0.5, 0.0, t_run),
                                 chk_s[:])
            lane_valid = lane < (count - j * chunk)
            accs, tns, dds = [], [], []
            for bi in range(nblk):
                sl = slice(bi * pb, (bi + 1) * pb)
                a, valid, one_m = B._chunk_alphas(data, px[sl], py[sl], lane_valid)
                w, t_new_b, dead_b = B._composite_chunk(
                    a, valid, one_m, t_run[sl], dead[sl])
                col4 = jnp.transpose(data[B.F_R:B.F_D + 1, :])
                accs.append(acc4[sl] + B._mm(w, col4))
                tns.append(t_new_b)
                dds.append(dead_b)
            return (j + 1, jnp.concatenate(accs, 0), jnp.concatenate(tns, 0),
                    jnp.concatenate(dds, 0))

        zero = jnp.zeros((p, 1), jnp.float32)
        j, acc4, t_run, dead = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((p, 4), jnp.float32), zero + 1.0, zero)
        )

        @pl.when(j < nch)
        def _():
            get_dma(jax.lax.rem(j, 2), j).wait()

        chk_ref[0] = chk_s[:]
        out_ref[0] = jnp.concatenate(
            [acc4[:, 0:3], t_run, acc4[:, 3:4], jnp.zeros((p, 3), jnp.float32)], axis=-1)

    @jax.jit
    def run(packed, rs, cc):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=(
                pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, max_chunks), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, B.NFEAT, CH), jnp.float32),
                pltpu.VMEM((P, max_chunks), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(kernel, grid_w=GW, tile_size=TS, chunk=CH),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, P, 8), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, P, max_chunks), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(rs, cc, jnp.zeros((1,), jnp.int32), packed)

    return run


for pb in (512,):
    run = make_fwd(pb)
    chain(f"fwd pb={pb}", lambda x, pk, rs, cc, r=run: jnp.sum(
        r(pk + x, rs, cc)[0]), jnp.float32(0), packed0, row_start, count_capped)
