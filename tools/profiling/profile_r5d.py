"""Bisect the bwd-epilogue regression: per-grid-step cost of each suspect op at the
real scale (1020 tiles, gacc [16, 2176] f32, obuf bf16)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1020
L = 2048
M = 1 << 21


def make(variant):
    def kernel(start_ref, flat_ref, gzero_ref, out_ref, gbuf, gsems, gacc, obuf,
               hbuf, hsem, wsem):
        del gzero_ref
        t = pl.program_id(0)
        s = start_ref[t]
        base = pl.multiple_of((s // 128) * 128, 128)
        off = s - base
        if variant >= 1:
            gacc[:] = jnp.zeros_like(gacc)
        if variant >= 5:
            # the chunk loop's accumulator copies: 8 chunks, 2-slot pipeline
            def acc_dma(slot, j):
                return pltpu.make_async_copy(
                    gbuf.at[slot],
                    gacc.at[:, pl.ds(pl.multiple_of(j * 256, 128), 256)],
                    gsems.at[slot])

            def body(i, c):
                j = 7 - i
                slot = jax.lax.rem(j, 2)

                @pl.when(i >= 2)
                def _():
                    acc_dma(slot, j + 2).wait()

                gbuf[slot] = jnp.full((16, 256), 1.0 * j, jnp.float32)
                acc_dma(slot, j).start()
                return c

            jax.lax.fori_loop(0, 8, body, 0)
            acc_dma(1, 1).wait()
            acc_dma(0, 0).wait()
        if variant >= 2:
            rolled = pltpu.roll(gacc[:], off, axis=1)
        else:
            rolled = gacc[:]
        if variant >= 3:
            rd = pltpu.make_async_copy(out_ref.at[:, pl.ds(base, 128)], hbuf, hsem)
            rd.start()
            rd.wait()
        lane128 = jax.lax.broadcasted_iota(jnp.int32, hbuf.shape, 1)
        head = jnp.where(lane128 < off, hbuf[:].astype(jnp.float32), 0.0)
        obuf[:] = (rolled + jnp.concatenate(
            [head, jnp.zeros((16, L), jnp.float32)], axis=1)).astype(obuf.dtype)
        if variant >= 4:
            wr = pltpu.make_async_copy(obuf, out_ref.at[:, pl.ds(base, L + 128)], wsem)
            wr.start()
            wr.wait()

    @jax.jit
    def run(starts, flat):
        gzero = jnp.zeros((16, M + L + 128), jnp.bfloat16)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.VMEM((2, 16, 256), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.VMEM((16, L + 128), jnp.float32),
                            pltpu.VMEM((16, L + 128), jnp.bfloat16),
                            pltpu.VMEM((16, 128), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((16, M + L + 128), jnp.bfloat16),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024),
        )(starts, flat, gzero)

    return run


rng = np.random.default_rng(0)
starts = jnp.asarray(np.sort(rng.integers(0, M - L, T)).astype(np.int32))
flat = jnp.zeros((16, 128), jnp.float32)
for v, name in [(0, "base (obuf pass + concat only)"),
                (1, "+ gacc zero-fill"),
                (2, "+ dynamic roll [16, 2176]"),
                (3, "+ head read (start+wait)"),
                (4, "+ window write (start+wait)"),
                (5, "+ 8x chunk acc_dma (VMEM->VMEM, dyn offset)")]:
    run = make(v)
    r = run(starts, flat)
    _ = jax.device_get(r.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(4):
        r = run(starts, flat)
    _ = jax.device_get(r.ravel()[0])
    print(f"variant {v} {name:38s} {(time.perf_counter() - t0) / 4 * 1e3:9.2f} ms",
          flush=True)
print("done", flush=True)
