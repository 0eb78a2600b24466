"""Stage-level timing of the rasterizer pipeline on the real chip.

Uses dependent chains (output feeds next input) because on the axon tunnel platform
block_until_ready alone does not reliably serialize.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.tiles import build_tile_assignment
from tpu_splat.ops.rasterize import blend_tiles

N = 1_000_000
W, H = 1296, 840
TS = 16
GW, GH = -(-W // TS), -(-H // TS)
MAX_INST = 1 << 22
K_MAX = 1 << 10
CHUNK = 128

splat, cam = build_workload(N, W, H)
base_args = (
    splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
    splat.sh0, splat.shN, splat.alive,
    cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
)


def chain_bench(name, fn, iters=8):
    """fn(means) -> scalar; chain: means <- means + 0*out."""
    means = splat.means

    @jax.jit
    def step(m):
        return m + 0.0 * fn(m)

    means = step(means)
    jax.block_until_ready(means)
    t0 = time.perf_counter()
    m = means
    for _ in range(iters):
        m = step(m)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)


def f_project(m):
    p = project(m, *base_args, W, H, 3, tile_size=TS)
    return jnp.sum(p.mean2d, axis=-1, keepdims=True) * jnp.zeros((1, 3))[0] + jnp.zeros((N, 3))


def f_project_s(m):
    p = project(m, *base_args, W, H, 3, tile_size=TS)
    return (jnp.sum(p.mean2d) + jnp.sum(p.color)) * jnp.ones((N, 3))


def f_tiles(m):
    p = project(m, *base_args, W, H, 3, tile_size=TS)
    a = build_tile_assignment(p, GW, GH, MAX_INST, TS)
    return (jnp.sum(a.gaussian_idx) + a.total_instances).astype(jnp.float32) * jnp.ones((N, 3))


def f_forward(m):
    p = project(m, *base_args, W, H, 3, tile_size=TS)
    a = build_tile_assignment(p, GW, GH, MAX_INST, TS)
    cols, alpha = blend_tiles(a, p.mean2d, p.conic, p.opacity, p.color, GW, GH, TS, K_MAX, CHUNK)
    return (jnp.sum(cols) + jnp.sum(alpha)) * jnp.ones((N, 3))


def f_fwd_bwd(m):
    def loss(mm):
        p = project(mm, *base_args, W, H, 3, tile_size=TS)
        a = build_tile_assignment(p, GW, GH, MAX_INST, TS)
        cols, alpha = blend_tiles(a, p.mean2d, p.conic, p.opacity, p.color, GW, GH, TS, K_MAX, CHUNK)
        return jnp.sum(cols) + jnp.sum(alpha)
    return jax.grad(loss)(m)


chain_bench("project", f_project_s)
chain_bench("project+tiles", f_tiles)
chain_bench("full forward", f_forward)
chain_bench("forward+backward", f_fwd_bwd, iters=4)
