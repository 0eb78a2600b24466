"""Stage breakdown at the ts=32 / chunk=256 operating point."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import (
    align_segments, build_sorted_instances, segmented_grad_reduce)
from tpu_splat.ops.pallas.blend import NFEAT, blend_backward, blend_forward

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
GW, GH = -(-W // TS), -(-H // TS)
n_tiles = GW * GH
P = TS * TS
MAX_INST = 1 << 21
K_MAX = 2048
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
    print(f"{name:44s} {ms:9.2f} ms", flush=True)


chain("projection fwd",
      lambda x, m: jnp.sum(project(m + x, *base, W, H, 3, tile_size=TS).mean2d),
      jnp.float32(0), splat.means)


@jax.jit
def prep(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    return p, build_sorted_instances(p, GW, GH, MAX_INST, TS)


proj, inst = jax.tree.map(jax.device_put, prep(splat.means))
chain("build_sorted_instances",
      lambda x, pr: jnp.sum(build_sorted_instances(
          pr._replace(depth=pr.depth + x), GW, GH, MAX_INST, TS).sorted_gid
          .astype(jnp.float32)),
      jnp.float32(0), proj)

max_chunks = K_MAX // CH
(row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows) = jax.tree.map(
    jax.device_put, align_segments(inst, n_tiles, max_chunks, CH))
feats = jnp.stack([proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0], proj.conic[:, 1],
                   proj.conic[:, 2], proj.opacity, proj.color[:, 0], proj.color[:, 1],
                   proj.color[:, 2], proj.depth], axis=1)
feats = jax.device_put(feats)
chain("align_segments",
      lambda x, i: jnp.sum(align_segments(
          i._replace(tile_count=i.tile_count + jnp.int32(x)), n_tiles, max_chunks, CH)[2]
          .astype(jnp.float32)),
      jnp.float32(0), inst)
chain("feature pack",
      lambda x, f, gid: jnp.sum(
          jnp.pad((f + x)[gid], ((0, 0), (0, NFEAT - 10)))
          .reshape(n_rows, CH, NFEAT).transpose(0, 2, 1)),
      jnp.float32(0), feats, aligned_gid)

packed0 = jax.device_put(jnp.pad(feats[aligned_gid], ((0, 0), (0, NFEAT - 10))).reshape(
    n_rows, CH, NFEAT).transpose(0, 2, 1))
statics = dict(n_tiles=n_tiles, grid_w=GW, tile_size=TS, max_chunks=max_chunks, chunk=CH)
out0, chk0 = jax.tree.map(jax.device_put, blend_forward(
    packed0, row_start, count_capped, **statics))
gout0 = jax.device_put(jnp.ones((n_tiles, P, 8), jnp.float32) * 1e-3)
chain("fwd kernel", lambda x, pk, rs, cc: jnp.sum(
    blend_forward(pk + x, rs, cc, **statics)[0]), jnp.float32(0),
    packed0, row_start, count_capped)
chain("bwd kernel", lambda x, pk, rs, cc, ck, o, go: jnp.sum(
    blend_backward(pk + x, rs, cc, ck, o, go, **statics)),
    jnp.float32(0), packed0, row_start, count_capped, chk0, out0, gout0)

gp0 = jax.device_put(blend_backward(packed0, row_start, count_capped, chk0, out0, gout0,
                                    **statics))


def segred(gp):
    ginst = jnp.stack([gp[:, f, :].reshape(-1) for f in range(10)], axis=1)
    return jnp.sum(jnp.square(segmented_grad_reduce(
        ginst, qa_emis, inst.emis_rank, inst.emis_start, inst.emis_end)))


chain("unpack+segmented_grad_reduce", lambda x, gp: segred(gp + x), jnp.float32(0), gp0)

print("\nsum of stages: %.1f ms" % sum(results.values()))
