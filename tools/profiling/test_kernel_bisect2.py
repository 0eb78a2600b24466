"""Second-stage bisect: combinations approaching the real forward kernel."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_splat.ops.pallas.blend import (
    CHUNK, NFEAT, _chunk_alphas, _composite_chunk, _lane_iota_row, _pixel_coords,
)

T, GW, TS, P, MAXC, R = 4, 2, 16, 256, 4, 16

rng = np.random.default_rng(0)
packed = jnp.asarray(rng.normal(0, 1, (R, NFEAT, CHUNK)).astype(np.float32))
row_start = jnp.asarray(np.arange(T, dtype=np.int32) * 2)
count = jnp.asarray(np.full(T, 200, np.int32))

LEVEL = int(sys.argv[1])


def kernel(row_start_ref, count_ref, packed_ref, out_ref, chk_ref, buf, chk_s, sems):
    t = pl.program_id(0)
    row0 = row_start_ref[t]
    cnt = count_ref[t]
    nch = (cnt + CHUNK - 1) // CHUNK
    px, py = _pixel_coords(t, GW, TS, P)
    chk_col = jax.lax.broadcasted_iota(jnp.int32, (P, MAXC), 1)
    chk_s[:] = jnp.zeros((P, MAXC), jnp.float32)
    lane = _lane_iota_row()

    def get_dma(slot, j):
        return pltpu.make_async_copy(packed_ref.at[row0 + j], buf.at[slot], sems.at[slot])

    @pl.when(nch > 0)
    def _():
        get_dma(0, 0).start()

    def cond(c):
        j, r, g, b, t_run, dead = c
        return (j < nch) & (jnp.min(dead) < 0.5)

    def body(c):
        j, r, g, b, t_run, dead = c
        slot = jax.lax.rem(j, 2)
        get_dma(slot, j).wait()

        @pl.when(j + 1 < nch)
        def _():
            get_dma(1 - slot, j + 1).start()

        data = buf[slot]
        if LEVEL >= 1:  # chk select update
            chk_s[:] = jnp.where(chk_col == j, jnp.where(dead > 0.5, 0.0, t_run), chk_s[:])

        if LEVEL >= 2:  # alphas
            lane_valid = lane < (cnt - j * CHUNK)
            a, valid, one_m = _chunk_alphas(data, px, py, lane_valid)
        else:
            a = data[0:1, :] * jnp.ones((P, 1), jnp.float32) * 0.001
            valid = a > -1.0
            one_m = 1.0 - a

        if LEVEL >= 3:  # full composite
            w, t_new, dead_new = _composite_chunk(a, valid, one_m, t_run, dead)
        else:
            w = a
            t_new = t_run * 0.99
            dead_new = dead

        cr = data[6:7, :]
        r = r + jnp.sum(w * cr, axis=-1, keepdims=True)
        return j + 1, r, g, b, t_new, dead_new

    zero = jnp.zeros((P, 1), jnp.float32)
    j, r, g, b, t_run, dead = jax.lax.while_loop(
        cond, body, (jnp.int32(0), zero, zero, zero, zero + 1.0, zero)
    )

    @pl.when(j < nch)
    def _():
        get_dma(jax.lax.rem(j, 2), j).wait()

    chk_ref[0] = chk_s[:]
    out_ref[0] = jnp.concatenate([r, g, b, t_run, jnp.zeros((P, 4), jnp.float32)], axis=-1)


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2,
    grid=(T,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=(
        pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, MAXC), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    ),
    scratch_shapes=[
        pltpu.VMEM((2, NFEAT, CHUNK), jnp.float32),
        pltpu.VMEM((P, MAXC), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ],
)
out, chk = pl.pallas_call(
    kernel, grid_spec=grid_spec,
    out_shape=(
        jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
        jax.ShapeDtypeStruct((T, P, MAXC), jnp.float32),
    ),
)(row_start, count, packed)
print(f"LEVEL {LEVEL} OK:", np.asarray(out).mean(), np.asarray(chk).mean())
