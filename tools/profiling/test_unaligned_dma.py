"""Can a Pallas TPU kernel DMA [16, chunk] column slices at ARBITRARY lane offsets
from a flat [16, N] HBM array? (If yes, per-tile chunk alignment is unnecessary.)"""
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
CH = 128


def kernel(start_ref, flat_ref, out_ref, buf, sem):
    t = pl.program_id(0)
    s = start_ref[t]
    cp = pltpu.make_async_copy(flat_ref.at[:, pl.ds(s, CH)], buf, sem)
    cp.start()
    cp.wait()
    out_ref[0] = buf[:]


@jax.jit
def run(flat, starts):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 16, CH), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, CH), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, 16, CH), jnp.float32),
    )(starts, flat)


flat = jnp.asarray(np.random.default_rng(0).random((16, N), np.float32))
starts = jnp.asarray([0, 37, 1001, 2301], jnp.int32)
out = run(flat, starts)
ref = np.stack([np.asarray(flat)[:, int(s):int(s) + CH] for s in starts])
err = np.abs(np.asarray(out) - ref).max()
print("max err:", err)
assert err == 0.0
print("UNALIGNED COLUMN DMA OK")
