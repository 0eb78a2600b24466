"""Split the 5.4 s fwd+bwd regression: time blend_forward, blend_backward, and the
XLA-side grad glue (transpose+gather+segred) separately with REAL pipeline inputs."""
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
from tpu_splat.ops.pallas.blend import blend_backward, blend_forward
from tpu_splat.ops.pallas.raster import build_sorted_instances, segred_from_emission

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
GW, GH = -(-W // TS), -(-H // TS)
N_TILES = GW * GH
MAX_INST = 1 << 21
K_MAX = 2048
K_AL = 2048
MAXC = K_AL // CH
P = TS * TS

splat, cam = build_workload(N, W, H)
proj = jax.jit(project, static_argnames=("width", "height", "active_sh_degree",
                                         "tile_size"))(
    splat.means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
    splat.sh0, splat.shN, splat.alive, cam["w2c"], cam["cam_position"],
    cam["fx"], cam["fy"], cam["cx"], cam["cy"], W, H, 3, tile_size=TS)
inst = jax.jit(build_sorted_instances, static_argnames=(
    "grid_w", "grid_h", "max_instances", "tile_size"))(
    proj, GW, GH, MAX_INST, TS)

count = jnp.minimum(inst.tile_count, K_AL)
seg_start = inst.tile_start
gid_pad = jnp.concatenate([inst.sorted_gid, jnp.zeros((K_AL + 128,), jnp.int32)])
flat = jax.jit(lambda g, i: jnp.transpose(g[i]))(inst.gtab, gid_pad)
_, qe = jax.jit(lambda e: jax.lax.sort(
    (e, jnp.arange(MAX_INST, dtype=jnp.int32)), num_keys=1, is_stable=False))(
    inst.sorted_emis)

statics = dict(n_tiles=N_TILES, grid_w=GW, tile_size=TS, max_chunks=MAXC, chunk=CH)
out, chk = blend_forward(flat, seg_start, count, **statics)
gout = jnp.ones((N_TILES, P, 8), jnp.float32) * 1e-3


def timeit(name, fn, *a, iters=6):
    r = fn(*a)
    _ = jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    _ = jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
    print(f"{name:52s} {(time.perf_counter() - t0) / iters * 1e3:9.2f} ms", flush=True)
    return r


timeit("blend_forward kernel", functools.partial(blend_forward, **statics),
       flat, seg_start, count)
gflat = timeit("blend_backward kernel (bf16 grads)",
               functools.partial(blend_backward, grad_dtype=jnp.bfloat16, **statics),
               flat, seg_start, count, chk, out, gout, iters=2)


@jax.jit
def glue(gf, q, rank, ss, se):
    # fused transpose-into-gather: measured 5364 ms (XLA emits a lane-dim gather)
    gt_ = jax.lax.optimization_barrier(jnp.transpose(gf))
    ge = gt_[q][:, :10].astype(jnp.float32)
    return segred_from_emission(ge, rank, ss, se, bf16=True)


timeit("XLA glue: transpose+gather+segred", glue, gflat, qe, inst.emis_rank,
       inst.emis_start, inst.emis_end)
print("done", flush=True)
