"""Bisect the backward kernel."""
import sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_splat.ops.pallas.blend import (
    CHUNK, NFEAT, _chunk_alphas, _lane_cumprod, _lane_cumsum, _lane_cummax,
    _lane_iota_row, _pixel_coords, TRANSMITTANCE_THRESHOLD, MAX_FRAGMENT_ALPHA,
)

T, GW, TS, P, MAXC, R = 4, 2, 16, 256, 4, 16
LEVEL = int(sys.argv[1])

rng = np.random.default_rng(0)
packed = jnp.asarray(rng.normal(0, 1, (R, NFEAT, CHUNK)).astype(np.float32))
row_start = jnp.asarray(np.arange(T, dtype=np.int32) * 2)
count = jnp.asarray(np.full(T, 200, np.int32))
chk = jnp.asarray(rng.uniform(0, 1, (T, P, MAXC)).astype(np.float32))
out = jnp.asarray(rng.uniform(0, 1, (T, P, 8)).astype(np.float32))
gout = jnp.asarray(rng.normal(0, 1, (T, P, 8)).astype(np.float32))
gzero = jnp.zeros((R, NFEAT, CHUNK), jnp.float32)


def kernel(row_start_ref, count_ref, packed_ref, chk_ref, out_ref, gout_ref,
           gzero_ref, gpacked_ref, buf, gbuf, sems, gsems):
    del gzero_ref
    t = pl.program_id(0)
    row0 = row_start_ref[t]
    cnt = count_ref[t]
    nch = (cnt + CHUNK - 1) // CHUNK
    px, py = _pixel_coords(t, GW, TS, P)
    lane = _lane_iota_row()
    chk_col = jax.lax.broadcasted_iota(jnp.int32, (P, MAXC), 1)

    gr = gout_ref[0, :, 0:1]
    gt_ = gout_ref[0, :, 3:4]
    t_final = out_ref[0, :, 3:4]
    s0 = t_final * gt_

    def in_dma(slot, j):
        return pltpu.make_async_copy(packed_ref.at[row0 + j], buf.at[slot], sems.at[slot])

    def out_dma(slot, j):
        return pltpu.make_async_copy(gbuf.at[slot], gpacked_ref.at[row0 + j], gsems.at[slot])

    @pl.when(nch > 0)
    def _():
        in_dma(0, nch - 1).start()

    if LEVEL == -2:
        # no loop at all: single in DMA, single out DMA
        in_dma(0, 0).wait()
        gbuf[0] = buf[0] * 2.0
        out_dma(0, 0).start()
        out_dma(0, 0).wait()
        return

    if LEVEL == -1:
        # reverse loop, in-DMA only; single out DMA at the end
        def body0(i, acc):
            j = nch - 1 - i
            slot = jax.lax.rem(j, 2)
            in_dma(slot, j).wait()

            @pl.when(j - 1 >= 0)
            def _():
                in_dma(1 - slot, j - 1).start()

            return acc + jnp.sum(buf[slot])

        acc = jax.lax.fori_loop(0, nch, body0, jnp.float32(0))
        gbuf[0] = jnp.full((NFEAT, CHUNK), acc, jnp.float32)
        out_dma(0, 0).start()
        out_dma(0, 0).wait()
        return

    def body(i, s_carry):
        j = nch - 1 - i
        slot = jax.lax.rem(j, 2)
        in_dma(slot, j).wait()

        @pl.when(j - 1 >= 0)
        def _():
            in_dma(1 - slot, j - 1).start()

        data = buf[slot]
        if LEVEL >= 1:
            t_in = jnp.sum(jnp.where(chk_col == j, chk_ref[0], 0.0), axis=-1, keepdims=True)
        else:
            t_in = s_carry * 0 + 1.0

        if LEVEL >= 2:
            lane_valid = lane < (cnt - j * CHUNK)
            a, valid, one_m = _chunk_alphas(data, px, py, lane_valid)
            cp_incl = _lane_cumprod(one_m)
            t_excl = t_in * cp_incl / one_m
            u = a * t_excl * gr
            cum_u = _lane_cumsum(u)
            total_u = cum_u[:, CHUNK - 1:CHUNK]
            suffix = (total_u - cum_u) + s_carry
            grads_row = jnp.sum(suffix * a, axis=0, keepdims=True)  # [1, 128]
        else:
            total_u = s_carry * 0 + jnp.sum(data[0]) * 1e-6
            grads_row = jnp.sum(data[0:1, :] * 2.0, axis=0, keepdims=True)

        grads = jnp.concatenate([grads_row] * 9 + [jnp.zeros((NFEAT - 9, CHUNK), jnp.float32)], axis=0)

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


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2,
    grid=(T,),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((1, P, MAXC), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ],
    out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
    scratch_shapes=[
        pltpu.VMEM((2, NFEAT, CHUNK), jnp.float32),
        pltpu.VMEM((2, NFEAT, CHUNK), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ],
)
gp = pl.pallas_call(
    kernel, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((R, NFEAT, CHUNK), jnp.float32),
    input_output_aliases={6: 0},
    compiler_params=pltpu.CompilerParams(has_side_effects=True),
)(row_start, count, packed, chk, out, gout, gzero)
print(f"LEVEL {LEVEL} OK:", np.abs(np.asarray(gp)).mean())
