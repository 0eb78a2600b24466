"""Feasibility probes for the 'unaligned segments' redesign (feature-major flavor).

test_unaligned_dma.py proved READS of [16, chunk] column slices at arbitrary lane
offsets from a [16, M] HBM array. The redesign also needs:
1. WRITES of [16, chunk] blocks at arbitrary lane offsets (the backward's gradient
   output), with input_output_aliasing zero-init.
2. Overlapping tail writes across sequential grid steps resolving in grid order
   (later tile rewrites the rows an earlier tile's tail chunk clobbered).
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
CH = 128


def kernel(start_ref, flat_ref, gzero_ref, out_ref, buf, obuf, sem, osem):
    del gzero_ref
    t = pl.program_id(0)
    s = start_ref[t]
    cp = pltpu.make_async_copy(flat_ref.at[:, pl.ds(s, CH)], buf, sem)
    cp.start()
    cp.wait()
    # value encodes the WRITER's grid step so overlap resolution is observable
    obuf[:] = buf[:] + 1000.0 * (t + 1)
    wr = pltpu.make_async_copy(obuf, out_ref.at[:, pl.ds(s, CH)], osem)
    wr.start()
    wr.wait()


@jax.jit
def run(flat, starts):
    gzero = jnp.zeros((16, M), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(starts.shape[0],),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.VMEM((16, CH), jnp.float32),
                        pltpu.VMEM((16, CH), jnp.float32),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, M), jnp.float32),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, flat, gzero)


flat = jnp.asarray(np.random.default_rng(0).random((16, M), np.float32))
# overlapping windows: step 1 overlaps step 0's tail, step 2 inside step 1, etc.
starts = np.asarray([37, 100, 150, 8191, 11111], np.int32)
out = np.asarray(run(flat, jnp.asarray(starts)))
ref = np.zeros((16, M), np.float32)
for t, s in enumerate(starts):
    ref[:, s:s + CH] = np.asarray(flat)[:, s:s + CH] + 1000.0 * (t + 1)
err = np.abs(out - ref).max()
print("unaligned column WRITE + overlap-in-grid-order + aliasing: max err", err,
      flush=True)
assert err == 0.0, err
print("UNALIGNED COLUMN WRITE OK", flush=True)
