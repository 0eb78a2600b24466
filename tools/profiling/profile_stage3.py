"""Which single op in emission stage 3 explodes when fused after stage 2?"""
import time
import jax, jax.numpy as jnp, numpy as np
from bench import build_workload
from tpu_splat.ops.projection import project

N = 1_000_000; W, H = 1296, 840; TS = 16
GW, GH = -(-W // TS), -(-H // TS); MAX_INST = 1 << 22
splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])


def chain(name, fn, iters=5):
    @jax.jit
    def step(m):
        return m + 0 * fn(m).astype(jnp.float32) * jnp.ones_like(m)
    m = step(splat.means); jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters): m = step(m)
    jax.block_until_ready(m)
    print(f"{name:38s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def pre(m):
    proj = project(m, *base, W, H, 3, tile_size=TS)
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)
    counts = proj.n_tiles[order].astype(jnp.int32)
    tmin = proj.tile_min[order]
    tmax = proj.tile_max[order]
    offs_incl = jnp.cumsum(counts)
    offs_excl = offs_incl - counts
    total = offs_incl[-1]
    pos = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=MAX_INST)
    return proj, order, counts, tmin, tmax, offs_excl, total, pos


chain("A: pos only (stage2)", lambda m: pre(m)[7].sum())
chain("B: + offs_excl[pos]", lambda m: (lambda t: t[5][t[7]].sum())(pre(m)))
chain("C: + counts[pos]", lambda m: (lambda t: t[2][t[7]].sum())(pre(m)))
chain("D: + tmin[pos,0]", lambda m: (lambda t: t[3][t[7], 0].sum())(pre(m)))
chain("E: + tmin[pos] 2cols", lambda m: (lambda t: t[3][t[7]].sum())(pre(m)))
chain("F: + order[pos]", lambda m: (lambda t: t[1][t[7]].sum())(pre(m)))
chain("G: B+C+D", lambda m: (lambda t: (t[5][t[7]] + t[2][t[7]] + t[3][t[7], 0]).sum())(pre(m)))

def h(m):
    t = pre(m)
    pos = t[7]
    k = jnp.arange(MAX_INST, dtype=jnp.int32) - t[5][pos]
    rect_w = jnp.maximum(t[4][pos, 0] - t[3][pos, 0], 1)
    return (k % rect_w).sum() + (k // rect_w).sum()
chain("H: full stage3 divmod", h)
