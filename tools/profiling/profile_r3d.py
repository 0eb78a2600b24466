"""Round-3d backward-kernel A/B on hardware: shared-gauss sigma chain (now default)
vs round-3c numbers, and the new sigma_mm backward lane (quadratic-form sigma on the
MXU, dropping the per-pixel dx/dy entirely under basis_red).

Honest timing: dependent chains with a device_get sync (block_until_ready does not
synchronize through the axon tunnel).
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import align_segments, build_sorted_instances
from tpu_splat.ops.pallas.blend import NFEAT, blend_backward, blend_forward


def pack_features(p, gid, n_rows=None, chunk=None):
    m2d, con, op, col, dep = p.mean2d, p.conic, p.opacity, p.color, p.depth
    col = jnp.maximum(col, 0.0)

    def split(x):
        hi = x.astype(jnp.bfloat16)
        return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    mxh, mxl = split(m2d[:, 0])
    myh, myl = split(m2d[:, 1])
    cah, cal = split(con[:, 0])
    cbh, cbl = split(con[:, 1])
    cch, ccl = split(con[:, 2])
    b = jnp.bfloat16
    feats = jnp.stack(
        [mxh, mxl, myh, myl, cah, cal, cbh, cbl, cch, ccl,
         op.astype(b), col[:, 0].astype(b), col[:, 1].astype(b),
         col[:, 2].astype(b), dep.astype(b)], axis=1)
    g = jax.lax.optimization_barrier(feats[gid])
    packed = jnp.pad(g, ((0, 0), (0, NFEAT - feats.shape[1])))
    return packed.reshape(n_rows, chunk, NFEAT).transpose(0, 2, 1)

N = 1_000_000
W, H = 1296, 840
TS = 32
GW, GH = -(-W // TS), -(-H // TS)
N_TILES = GW * GH
MAX_INST = 1 << 21
K_MAX = 2048
CH = 256
MAX_CHUNKS = ((K_MAX + CH - 1) // CH * CH) // CH

splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"],
        cam["cy"])

results = {}


def chain(name, fn, x0, *args, iters=8):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    results[name] = ms
    print(f"{name:58s} {ms:9.2f} ms", flush=True)
    return ms


@jax.jit
def prep(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    return p, build_sorted_instances(p, GW, GH, MAX_INST, TS)


proj, inst = jax.tree.map(jax.device_put, prep(splat.means))
print(f"total={int(inst.total_instances)} max_tile={int(inst.max_tile_count)}", flush=True)

aligned = jax.tree.map(jax.device_put,
                       jax.jit(lambda i: align_segments(i, N_TILES, MAX_CHUNKS, CH))(inst))
row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows = aligned
n_rows = int(n_rows)

statics = dict(n_tiles=N_TILES, grid_w=GW, tile_size=TS, max_chunks=MAX_CHUNKS, chunk=CH)

packed = jax.device_put(jax.jit(functools.partial(
    pack_features, n_rows=n_rows, chunk=CH))(proj, aligned_gid))
out, chk = jax.tree.map(jax.device_put, jax.jit(functools.partial(
    blend_forward, **statics))(packed, row_start, count_capped))
gout = jax.device_put(jnp.ones((N_TILES, TS * TS, 8), jnp.float32) * 0.1)

for extra in (dict(), dict(sigma_mm=True), dict(approx_recip=False),
              dict(sigma_mm=True, approx_recip=False)):
    tag = " ".join(f"{k}={v}" for k, v in extra.items()) or "default(shared-gauss)"
    chain(f"bwd [bf16] {tag}",
          lambda x, pk, rs, cc, ck, o, g, _e=extra: jnp.square(
              blend_backward(pk + x.astype(pk.dtype), rs, cc, ck, o, g,
                             grad_dtype=jnp.bfloat16, **_e, **statics)
              .astype(jnp.float32)).sum() * 1e-9,
          jnp.float32(0), packed, row_start, count_capped, chk, out, gout)

# numerics: sigma_mm backward vs default on hardware
@jax.jit
def smdiff(pk, rs, cc, ck, o, g):
    a = blend_backward(pk, rs, cc, ck, o, g, **statics)
    b = blend_backward(pk, rs, cc, ck, o, g, sigma_mm=True, **statics)
    return jnp.abs(a - b).max() / jnp.maximum(jnp.abs(a).max(), 1e-6)

print("sigma_mm bwd rel diff:", float(smdiff(packed, row_start, count_capped, chk, out,
                                             gout)), flush=True)
print({k: round(v, 2) for k, v in results.items()})
