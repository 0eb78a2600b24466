"""Find which kernel construct faults the TPU."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, GW, TS, P, MAXC, R, CHUNK, NFEAT = 4, 2, 16, 256, 4, 16, 128, 16

rng = np.random.default_rng(0)
packed = jnp.asarray(rng.normal(0, 1, (R, NFEAT, CHUNK)).astype(np.float32))
row_start = jnp.asarray(np.arange(T, dtype=np.int32) * 2)
count = jnp.asarray(np.full(T, 200, np.int32))

LEVEL = int(sys.argv[1])


def kernel(row_start_ref, count_ref, packed_ref, out_ref, buf, chk_s, sems):
    t = pl.program_id(0)
    row0 = row_start_ref[t]
    cnt = count_ref[t]
    nch = (cnt + CHUNK - 1) // CHUNK

    def get_dma(slot, j):
        return pltpu.make_async_copy(packed_ref.at[row0 + j], buf.at[slot], sems.at[slot])

    if LEVEL == 0:  # no DMA, constant write
        out_ref[0] = jnp.full((P, 8), 1.0, jnp.float32)
        return

    if LEVEL == 1:  # single DMA, sum
        get_dma(0, 0).start()
        get_dma(0, 0).wait()
        s = jnp.sum(buf[0])
        out_ref[0] = jnp.full((P, 8), s, jnp.float32)
        return

    if LEVEL == 2:  # fori loop with double-buffered DMA
        get_dma(0, 0).start()

        def body(j, acc):
            slot = jax.lax.rem(j, 2)
            get_dma(slot, j).wait()

            @pl.when(j + 1 < nch)
            def _():
                get_dma(1 - slot, j + 1).start()

            return acc + jnp.sum(buf[slot])

        s = jax.lax.fori_loop(0, nch, body, jnp.float32(0))
        out_ref[0] = jnp.full((P, 8), s, jnp.float32)
        return

    if LEVEL == 3:  # while loop with array carries + early exit + drain
        def cond(c):
            j, acc = c
            return (j < nch) & (jnp.min(acc) < 1e9)

        def body(c):
            j, acc = c
            slot = jax.lax.rem(j, 2)
            get_dma(slot, j).wait()

            @pl.when(j + 1 < nch)
            def _():
                get_dma(1 - slot, j + 1).start()

            return j + 1, acc + jnp.sum(buf[slot])

        @pl.when(nch > 0)
        def _():
            get_dma(0, 0).start()

        j, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((P, 1), jnp.float32)))

        @pl.when(j < nch)
        def _():
            get_dma(jax.lax.rem(j, 2), j).wait()

        out_ref[0] = jnp.concatenate([acc, jnp.zeros((P, 7), jnp.float32)], axis=-1)
        return

    if LEVEL == 4:  # rolls (lane scan)
        get_dma(0, 0).start()
        get_dma(0, 0).wait()
        x = buf[0][0:1, :] * jnp.ones((P, 1), jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (P, CHUNK), 1)
        s = 1
        while s < CHUNK:
            x = x * jnp.where(col >= s, pltpu.roll(x, s, axis=1), 1.0)
            s *= 2
        out_ref[0] = jnp.concatenate(
            [jnp.sum(x, axis=1, keepdims=True), jnp.zeros((P, 7), jnp.float32)], axis=-1)
        return

    if LEVEL == 5:  # chk scratch select update
        chk_col = jax.lax.broadcasted_iota(jnp.int32, (P, MAXC), 1)
        chk_s[:] = jnp.zeros((P, MAXC), jnp.float32)

        def body(j, _):
            chk_s[:] = jnp.where(chk_col == j, 3.14, chk_s[:])
            return 0

        jax.lax.fori_loop(0, nch, body, 0)
        out_ref[0] = jnp.concatenate(
            [jnp.sum(chk_s[:], axis=1, keepdims=True), jnp.zeros((P, 7), jnp.float32)],
            axis=-1)
        return


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2,
    grid=(T,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[
        pltpu.VMEM((2, NFEAT, CHUNK), jnp.float32),
        pltpu.VMEM((P, MAXC), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ],
)
out = pl.pallas_call(
    kernel, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
)(row_start, count, packed)
print(f"LEVEL {LEVEL} OK:", np.asarray(out).mean())
