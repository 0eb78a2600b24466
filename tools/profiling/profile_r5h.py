"""Isolated fwd/bwd kernel A/Bs at the r5 head (pack_bf16 layout): sigma_mm in the
forward, and single-bf16 (non-split) prefix/moment matmuls in both kernels.
In-jit scan loops (tunnel dispatch floor ~13 ms)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import build_sorted_instances
from tpu_splat.ops.pallas import blend as B

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
GW, GH = -(-W // TS), -(-H // TS)
MAX_INST = 1966080
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

    def split(x):
        hi = x.astype(jnp.bfloat16)
        return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    mxh, mxl = split(p.mean2d[:, 0])
    myh, myl = split(p.mean2d[:, 1])
    cah, cal = split(p.conic[:, 0])
    cbh, cbl = split(p.conic[:, 1])
    cch, ccl = split(p.conic[:, 2])
    b = jnp.bfloat16
    ptab = jnp.stack(
        [mxh, mxl, myh, myl, cah, cal, cbh, cbl, cch, ccl,
         p.opacity.astype(b), jnp.maximum(p.color[:, 0], 0).astype(b),
         jnp.maximum(p.color[:, 1], 0).astype(b),
         jnp.maximum(p.color[:, 2], 0).astype(b), p.depth.astype(b)], axis=1)
    ptab = jnp.pad(ptab, ((0, 0), (0, 1)))
    gid_pad = jnp.concatenate([inst.sorted_gid, jnp.zeros((K_MAX + 128,), jnp.int32)])
    flat = jnp.transpose(ptab[gid_pad])
    return flat, inst.tile_start, count


flat, tstart, count = jax.block_until_ready(prep(splat.means))
statics = dict(n_tiles=NT, grid_w=GW, tile_size=TS, max_chunks=MAXC, chunk=CH)

out, chk = jax.block_until_ready(jax.jit(
    lambda: B.blend_forward(flat, tstart, count, **statics))())
gout = jnp.ones((NT, P, 8), jnp.float32)


def looped(build):
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
    print(f"{name:56s} {(time.perf_counter() - t0) * 1e3 / K_LOOP:9.2f} ms", flush=True)


for kw, tag in [({}, "fwd base"),
                ({"sigma_mm": True}, "fwd sigma_mm"),
                ({"base2": True}, "fwd base2")]:
    timeit(f"{tag}", looped(lambda fl, s, c, _kw=kw: B.blend_forward(
        fl, s, c, **statics, **_kw)[0][0, 0, 0] * 1e-20), flat, tstart, count)

for kw, tag in [({}, "bwd base (sigma_mm+basis_red+approx_recip)"),
                ({"sigma_mm": False}, "bwd sigma_mm off"),
                ({"base2": True}, "bwd base2")]:
    timeit(f"{tag}", looped(lambda fl, s, c, ck, o, g, _kw=kw: B.blend_backward(
        fl, s, c, ck, o, g, grad_dtype=jnp.bfloat16, **statics, **_kw
    )[0, 0].astype(jnp.float32) * 1e-20), flat, tstart, count, chk, out, gout)
print("done", flush=True)

# lowp lanes (appended)
for kw, tag in [({"lowp": True}, "fwd lowp (single-bf16 prefix)")]:
    timeit(f"{tag}", looped(lambda fl, s, c, _kw=kw: B.blend_forward(
        fl, s, c, **statics, **_kw)[0][0, 0, 0] * 1e-20), flat, tstart, count)
for kw, tag in [({"lowp": True}, "bwd lowp (single-bf16 prefix+moments)")]:
    timeit(f"{tag}", looped(lambda fl, s, c, ck, o, g, _kw=kw: B.blend_backward(
        fl, s, c, ck, o, g, grad_dtype=jnp.bfloat16, **statics, **_kw
    )[0, 0].astype(jnp.float32) * 1e-20), flat, tstart, count, chk, out, gout)
print("done2", flush=True)

for kw, tag in [({"acc_store": True}, "bwd acc_store (vector stores)")]:
    timeit(f"{tag}", looped(lambda fl, s, c, ck, o, g, _kw=kw: B.blend_backward(
        fl, s, c, ck, o, g, grad_dtype=jnp.bfloat16, **statics, **_kw
    )[0, 0].astype(jnp.float32) * 1e-20), flat, tstart, count, chk, out, gout)
print("done3", flush=True)
