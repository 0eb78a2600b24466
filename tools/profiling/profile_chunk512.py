"""A/B chunk 256 vs 512 through align+pack+fwd+bwd (per-chunk loop overhead vs
larger-tile compute granularity). Same dependent-chain timing as profile_r3c."""
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
    return p, build_sorted_instances(p, GW, GH, MAX_INST, TS)


proj, inst = jax.tree.map(jax.device_put, prep(splat.means))
print(f"total={int(inst.total_instances)} max_tile={int(inst.max_tile_count)}", flush=True)

for ch in (256, 512):
    max_chunks = ((K_MAX + ch - 1) // ch * ch) // ch
    aligned = jax.tree.map(
        jax.device_put, jax.jit(lambda i, _c=ch, _m=max_chunks: align_segments(
            i, N_TILES, _m, _c))(inst))
    row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows = aligned
    n_rows = int(n_rows)

    def pack(p, gid, _nr=n_rows, _c=ch):
        feats = jnp.stack([p.mean2d[:, 0], p.mean2d[:, 1], p.conic[:, 0], p.conic[:, 1],
                           p.conic[:, 2], p.opacity, jnp.maximum(p.color[:, 0], 0),
                           jnp.maximum(p.color[:, 1], 0), jnp.maximum(p.color[:, 2], 0),
                           p.depth], axis=1)
        g = jax.lax.optimization_barrier(feats[gid])
        return jnp.pad(g, ((0, 0), (0, NFEAT - 10))).reshape(_nr, _c, NFEAT).transpose(0, 2, 1)

    packed = jax.device_put(jax.jit(pack)(proj, aligned_gid))
    statics = dict(n_tiles=N_TILES, grid_w=GW, tile_size=TS, max_chunks=max_chunks,
                   chunk=ch)
    chain(f"align+pack ch={ch}",
          lambda x, p, i, _c=ch, _m=max_chunks, _nr=n_rows: jnp.square(pack(
              p._replace(mean2d=p.mean2d + x),
              align_segments(i, N_TILES, _m, _c)[2], _nr, _c)[:, 0, ::64]).sum() * 1e-9,
          jnp.float32(0), proj, inst)
    chain(f"fwd ch={ch}",
          lambda x, pk, rs, cc, _s=statics: jnp.square(
              blend_forward(pk + x, rs, cc, **_s)[0][:, :, :4]).sum() * 1e-9,
          jnp.float32(0), packed, row_start, count_capped)
    out, chk = jax.tree.map(jax.device_put, jax.jit(functools.partial(
        blend_forward, **statics))(packed, row_start, count_capped))
    gout = jax.device_put(jnp.ones((N_TILES, TS * TS, 8), jnp.float32) * 0.1)
    chain(f"bwd ch={ch}",
          lambda x, pk, rs, cc, ck, o, g, _s=statics: jnp.square(
              blend_backward(pk + x, rs, cc, ck, o, g, grad_dtype=jnp.bfloat16,
                             **_s).astype(jnp.float32)).sum() * 1e-9,
          jnp.float32(0), packed, row_start, count_capped, chk, out, gout)
    # parity 256 vs 512 forward
    if ch == 512:
        o256, _ = jax.jit(functools.partial(
            blend_forward, n_tiles=N_TILES, grid_w=GW, tile_size=TS,
            max_chunks=8, chunk=256))(packed256, rs256, cc256)
        d = float(jnp.abs(out[:, :, :4] - o256[:, :, :4]).max())
        print("fwd 512-vs-256 max abs diff:", d, flush=True)
    else:
        packed256, rs256, cc256 = packed, row_start, count_capped
