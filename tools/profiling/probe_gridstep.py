"""Measure fixed per-grid-step dispatch overhead: near-empty kernel at varying grid
sizes, and the same total work split across fewer steps (multi-tile blocks)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def empty_kernel(out_ref):
    out_ref[:] = jnp.full_like(out_ref, pl.program_id(0))


def run_empty(grid, p=1024):
    f = pl.pallas_call(
        empty_kernel,
        grid=(grid,),
        out_specs=pl.BlockSpec((1, p, 8), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, p, 8), jnp.float32),
    )
    g = jax.jit(f)
    x = g()
    _ = jax.device_get(x.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(8):
        x = g()
    _ = jax.device_get(x.ravel()[0])
    return (time.perf_counter() - t0) / 8 * 1e3


def body_kernel(out_ref, *, tpb):
    # tpb tiles of [P, 8] output per step; same total output, fewer steps
    out_ref[:] = jnp.full_like(out_ref, pl.program_id(0))


def run_block(grid, tpb, p=1024):
    f = pl.pallas_call(
        functools.partial(body_kernel, tpb=tpb),
        grid=(grid // tpb,),
        out_specs=pl.BlockSpec((tpb, p, 8), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, p, 8), jnp.float32),
    )
    g = jax.jit(f)
    x = g()
    _ = jax.device_get(x.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(8):
        x = g()
    _ = jax.device_get(x.ravel()[0])
    return (time.perf_counter() - t0) / 8 * 1e3


for grid in (256, 1024, 2048, 4096):
    print(f"empty grid={grid:5d}            {run_empty(grid):8.2f} ms", flush=True)
for tpb in (1, 2, 4, 8):
    print(f"block grid=1024 tpb={tpb}        {run_block(1024, tpb):8.2f} ms", flush=True)
print("done", flush=True)
