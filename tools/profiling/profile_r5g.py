"""Isolated stage timings for the r5 backward chain at garden scale: fwd kernel,
bwd kernel, transpose+gather, segred — each looped K times INSIDE one jit (lax.scan
with an optimization_barrier'd carry dependency), so the ~13 ms/dispatch tunnel floor
amortizes away. The carry injection adds one full pass over the primary operand per
iteration (~1-2 ms at [16, 2.1M]) — subtract the 'carry pass only' row."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import (build_sorted_instances, segred_from_emission)
from tpu_splat.ops.pallas.blend import blend_forward, blend_backward

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
GW, GH = -(-W // TS), -(-H // TS)
MAX_INST = 1 << 21
K_MAX = 2048
MAXC = K_MAX // CH
NT = GW * GH
P = TS * TS
K_LOOP = 10

splat, cam = build_workload(N, W, H)

@jax.jit
def prep(means):
    p = project(means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
                splat.sh0, splat.shN, splat.alive, cam["w2c"], cam["cam_position"],
                cam["fx"], cam["fy"], cam["cx"], cam["cy"], W, H, 3, tile_size=TS)
    inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
    count = jnp.minimum(inst.tile_count, K_MAX)
    gid_pad = jnp.concatenate([inst.sorted_gid, jnp.zeros((K_MAX + 128,), jnp.int32)])
    flat = jnp.transpose(inst.gtab[gid_pad])
    _, qe = jax.lax.sort((inst.sorted_emis, jnp.arange(MAX_INST, dtype=jnp.int32)),
                         num_keys=1, is_stable=False)
    return flat, inst.tile_start, count, qe, inst.emis_rank, inst.emis_start, inst.emis_end

flat, tstart, count, qe, rank, seg_s, seg_e = jax.block_until_ready(prep(splat.means))

statics = dict(n_tiles=NT, grid_w=GW, tile_size=TS, max_chunks=MAXC, chunk=CH)
fwd1 = lambda fl, s, c: blend_forward(fl, s, c, **statics)
out, chk = jax.block_until_ready(jax.jit(fwd1)(flat, tstart, count))
gout = jnp.ones((NT, P, 8), jnp.float32)
bwd1 = lambda fl, s, c, ck, o, g: blend_backward(
    fl, s, c, ck, o, g, grad_dtype=jnp.bfloat16, **statics)
gflat = jax.block_until_ready(jax.jit(bwd1)(flat, tstart, count, chk, out, gout))


def looped(build):
    """build(primary_with_carry) -> scalar probe; primary is injected per-iter."""
    def run(primary, *rest):
        def body(carry, _):
            prim = jax.lax.optimization_barrier(
                primary + carry.astype(primary.dtype) * 0)
            return build(prim, *rest), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K_LOOP)
        return c
    return jax.jit(run)


def timeit(name, fn, *args):
    x = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    x = fn(*args)
    _ = jax.device_get(x)
    ms = (time.perf_counter() - t0) * 1e3 / K_LOOP
    print(f"{name:52s} {ms:9.2f} ms", flush=True)


timeit("carry pass only (flat + c)", looped(lambda fl: jnp.sum(fl[:, ::4096])), flat)
timeit("fwd kernel (+carry pass)",
       looped(lambda fl, s, c: fwd1(fl, s, c)[0][0, 0, 0] * 1e-20, ),
       flat, tstart, count)
timeit("bwd kernel (+carry pass)",
       looped(lambda fl, s, c, ck, o, g:
              bwd1(fl, s, c, ck, o, g)[0, 0].astype(jnp.float32) * 1e-20),
       flat, tstart, count, chk, out, gout)


def gath(gf, q):
    rows = jax.lax.optimization_barrier(jnp.transpose(gf))
    ge = rows[q][:, :10].astype(jnp.float32)
    return jnp.sum(ge[::4096]) * 1e-20

timeit("transpose+gather (+carry pass, gflat bf16)", looped(gath), gflat, qe)


def segred(ge_, r, s, e):
    acc = segred_from_emission(ge_, r, s, e, bf16=True)
    return jnp.sum(acc[::4096]) * 1e-20

ge_arr = jax.block_until_ready(jax.jit(
    lambda gf, q: jax.lax.optimization_barrier(jnp.transpose(gf))[q][:, :10]
    .astype(jnp.float32))(gflat, qe))
timeit("segred block_mm (+carry pass over ge)", looped(segred),
       ge_arr, rank, seg_s, seg_e)
print("done", flush=True)
