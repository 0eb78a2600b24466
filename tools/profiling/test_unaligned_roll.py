"""Probe the round-down + dynamic-roll scheme for unaligned segments (Mosaic rejects
HBM memref_slice at unproven lane offsets — test_unaligned_dma.py now FAILS on this
toolchain; the r4 'OK' came from an older stack).

READ:  DMA [16, W+128] from floor128(s) (pl.multiple_of proof), pltpu.roll by the
       DYNAMIC residue: roll amounts must be POSITIVE ((W+128) - off; a negative
       dynamic shift mis-lowers on this toolchain), use lanes [0, W).
WRITE: buffer the tile's gradient rows in VMEM, roll to the residue offset, ADD-merge
       the head 128-lane tile with the previous tile's already-written values (read
       once per tile), write the whole 128-aligned window. Later tiles overwrite the
       zero-masked tail in sequential grid order.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 1 << 14
W = 256  # segment window (chunk)


def kernel(start_ref, count_ref, flat_ref, gzero_ref, out_ref, buf, obuf, hbuf,
           sem, osem, hsem):
    del gzero_ref
    t = pl.program_id(0)
    s = start_ref[t]
    c = count_ref[t]
    base = pl.multiple_of((s // 128) * 128, 128)
    off = s - base
    # ---- read: aligned window + dynamic roll
    cp = pltpu.make_async_copy(flat_ref.at[:, pl.ds(base, W + 128)], buf, sem)
    cp.start()
    cp.wait()
    win = pltpu.roll(buf[:], (W + 128) - off, axis=1)[:, :W]  # lanes s .. s+W-1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    vals = jnp.where(lane < c, win + 1000.0 * (t + 1), 0.0)
    # ---- write: roll into the aligned window, head-merge with previous contents
    owin = pltpu.roll(
        jnp.concatenate([vals, jnp.zeros((16, 128), jnp.float32)], axis=1), off, axis=1
    )
    rd = pltpu.make_async_copy(out_ref.at[:, pl.ds(base, 128)], hbuf, hsem)
    rd.start()
    rd.wait()
    head = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1) < off,
                     hbuf[:], 0.0)
    obuf[:] = owin + jnp.concatenate(
        [head, jnp.zeros((16, W), jnp.float32)], axis=1
    )
    wr = pltpu.make_async_copy(obuf, out_ref.at[:, pl.ds(base, W + 128)], osem)
    wr.start()
    wr.wait()


@jax.jit
def run(flat, starts, counts):
    gzero = jnp.zeros((16, M), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(starts.shape[0],),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.VMEM((16, W + 128), jnp.float32),
                        pltpu.VMEM((16, W + 128), jnp.float32),
                        pltpu.VMEM((16, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, M), jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, flat, gzero)


flat = jnp.asarray(np.random.default_rng(0).random((16, M), np.float32))
# contiguous unaligned segments (like real tile segments)
counts = np.asarray([37, 200, 256, 119, 250], np.int32)
starts = np.concatenate([[100], 100 + np.cumsum(counts[:-1])]).astype(np.int32)
out = np.asarray(run(flat, jnp.asarray(starts), jnp.asarray(counts)))
ref = np.zeros((16, M), np.float32)
for t, (s, c) in enumerate(zip(starts, counts)):
    ref[:, s:s + c] = np.asarray(flat)[:, s:s + c] + 1000.0 * (t + 1)
err = np.abs(out - ref).max()
print("read-roll + head-merge write: max err", err, flush=True)
assert err == 0.0, err
print("UNALIGNED VIA ROLL OK", flush=True)
