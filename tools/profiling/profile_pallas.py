"""Pallas pipeline timing at garden scale."""
import time
import jax, jax.numpy as jnp, numpy as np
from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import build_sorted_instances, blend_tiles_pallas

N = 1_000_000; W, H = 1296, 840; TS = 16
GW, GH = -(-W // TS), -(-H // TS); MAX_INST = 1 << 22
splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])


def chain(name, fn, iters=5):
    @jax.jit
    def step(m):
        return m + 0.0 * fn(m).astype(jnp.float32) * jnp.ones_like(m)
    m = step(splat.means); jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters): m = step(m)
    jax.block_until_ready(m)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def f_inst(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
    return inst.sorted_gid.astype(jnp.float32).sum() + inst.tile_start.astype(jnp.float32).sum()

def f_fwd(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
    cols, alpha = blend_tiles_pallas(inst, p.mean2d, p.conic, p.opacity,
                                     jnp.maximum(p.color, 0.0),
                                     grid_w=GW, grid_h=GH, tile_size=TS, k_max=1024)
    return jnp.sum(cols) + jnp.sum(alpha)

def f_fwdbwd(m):
    def loss(mm):
        p = project(mm, *base, W, H, 3, tile_size=TS)
        inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
        cols, alpha = blend_tiles_pallas(inst, p.mean2d, p.conic, p.opacity,
                                         jnp.maximum(p.color, 0.0),
                                         grid_w=GW, grid_h=GH, tile_size=TS, k_max=1024)
        return jnp.sum(cols) + jnp.sum(alpha)
    return jax.grad(loss)(m).sum()

chain("project+sorted_instances", f_inst)
chain("pallas full forward", f_fwd)
chain("pallas forward+backward", f_fwdbwd, iters=3)
