"""Isolate the unaligned-redesign backward regression: forward-only vs fwd+bwd of the
raster path at garden scale, plus blend_backward alone."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.rasterize import rasterize

N = 1_000_000
W, H = 1296, 840
TS = 32
MAX_INST = 1 << 21
K_MAX = 2048

splat, cam = build_workload(N, W, H)
kw = dict(width=W, height=H, max_instances=MAX_INST, k_max=K_MAX, chunk=256,
          tile_size=TS, backend="pallas")
args = (splat.means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
        splat.sh0, splat.shN, splat.alive, cam["w2c"], cam["cam_position"],
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], 3, jnp.zeros(3))


def timeit(name, fn, *a, iters=6):
    r = fn(*a)
    _ = jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    _ = jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
    print(f"{name:48s} {(time.perf_counter() - t0) / iters * 1e3:9.2f} ms", flush=True)


@jax.jit
def fwd_only(m):
    return rasterize(m, *args[1:], **kw).image.sum()


@jax.jit
def fwd_bwd(m):
    return jax.grad(lambda mm: rasterize(mm, *args[1:], **kw).image.sum())(m)


timeit("forward only", fwd_only, splat.means)
timeit("fwd + bwd", fwd_bwd, splat.means)
print("done", flush=True)
