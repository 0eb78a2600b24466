"""A/B the basis-reduction backward (moment-form skinny matmuls) on hardware."""
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


def chain(name, fn, x0, *args, iters=8):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:9.2f} ms", flush=True)
    return ms


@jax.jit
def prep(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    i = build_sorted_instances(p, GW, GH, MAX_INST, TS)
    a = align_segments(i, N_TILES, MAX_CHUNKS, CH)
    return p, i, a


proj, inst, aligned = jax.tree.map(jax.device_put, prep(splat.means))
row_start, count_capped, aligned_gid, qa_emis, _ma, _nr = aligned
n_rows = (MAX_INST + N_TILES * CH) // CH
print(f"total={int(inst.total_instances)} max_tile={int(inst.max_tile_count)}", flush=True)


@jax.jit
def mkpacked(p, gid):
    feats = jnp.stack([p.mean2d[:, 0], p.mean2d[:, 1], p.conic[:, 0], p.conic[:, 1],
                       p.conic[:, 2], p.opacity, jnp.maximum(p.color[:, 0], 0),
                       jnp.maximum(p.color[:, 1], 0), jnp.maximum(p.color[:, 2], 0),
                       p.depth], axis=1)
    g = feats[gid]
    return jnp.pad(g, ((0, 0), (0, NFEAT - 10))).reshape(n_rows, CH, NFEAT).transpose(0, 2, 1)


packed = jax.device_put(mkpacked(proj, aligned_gid))
statics = dict(n_tiles=N_TILES, grid_w=GW, tile_size=TS, max_chunks=MAX_CHUNKS, chunk=CH)
out, chk = jax.tree.map(jax.device_put, jax.jit(functools.partial(
    blend_forward, **statics))(packed, row_start, count_capped))
gout = jax.device_put(jnp.ones((N_TILES, TS * TS, 8), jnp.float32) * 0.1)

for extra in (dict(basis_red=False, red_sum=True), dict(basis_red=True),
              dict(basis_red=True, approx_recip=True)):
    tag = " ".join(f"{k}={v}" for k, v in extra.items())
    chain(f"bwd {tag}",
          lambda x, pk, rs, cc, ck, o, g, _e=extra: jnp.square(
              blend_backward(pk + x, rs, cc, ck, o, g, grad_dtype=jnp.bfloat16,
                             **_e, **statics).astype(jnp.float32)).sum() * 1e-9,
          jnp.float32(0), packed, row_start, count_capped, chk, out, gout)

# hardware numerics: basis_red vs exact stacked reduction
@jax.jit
def diff(pk, rs, cc, ck, o, g):
    a = blend_backward(pk, rs, cc, ck, o, g, basis_red=True, **statics)
    b = blend_backward(pk, rs, cc, ck, o, g, basis_red=False, **statics)
    return jnp.abs(a - b).max() / jnp.maximum(jnp.abs(b).max(), 1e-9)


print("basis_red rel diff:", float(diff(packed, row_start, count_capped, chk, out, gout)),
      flush=True)
