"""segmented_grad_reduce A/B on hardware: padded [*,10] block scan (current) vs the
dense flat [nb, 128*10] scan (flat_scan=True) — the padded form streams 12.8x the
useful bytes per Hillis-Steele pass; the flat form pays two relayouts instead.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import (align_segments, build_sorted_instances,
                                         segmented_grad_reduce)

N = 1_000_000
W, H = 1296, 840
TS = 32
GW, GH = -(-W // TS), -(-H // TS)
N_TILES = GW * GH
MAX_INST = 1 << 21
CH = 256
MAX_CHUNKS = 8

splat, cam = build_workload(N, W, H)


@jax.jit
def prep(m):
    p = project(m, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0,
                splat.shN, splat.alive, cam["w2c"], cam["cam_position"], cam["fx"],
                cam["fy"], cam["cx"], cam["cy"], W, H, 3, tile_size=TS)
    inst = build_sorted_instances(p, GW, GH, MAX_INST, TS)
    return inst, align_segments(inst, N_TILES, MAX_CHUNKS, CH)


inst, aligned = jax.tree.map(jax.device_put, prep(splat.means))
row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows = aligned
max_aligned = int(max_aligned)

rng = np.random.default_rng(0)
ginst = jax.device_put(jnp.asarray(
    rng.normal(0, 1, (max_aligned, 10)).astype(np.float32)).astype(jnp.bfloat16))

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
    return ms


for im in ("pad_scan", "flat_scan", "block_mm"):
    chain(f"segred impl={im}",
          lambda x, g, q, r, ss, se, _im=im: jnp.square(segmented_grad_reduce(
              (g.astype(jnp.float32) + x).astype(jnp.bfloat16), q, r, ss, se,
              impl=_im)).sum() * 1e-9,
          jnp.float32(0), ginst, qa_emis, inst.emis_rank, inst.emis_start, inst.emis_end)

# numerics: identical decomposition, must match to f32 roundoff
@jax.jit
def diff(g, q, r, ss, se):
    a = segmented_grad_reduce(g, q, r, ss, se, impl="pad_scan")
    b = segmented_grad_reduce(g, q, r, ss, se, impl="block_mm")
    return jnp.abs(a - b).max() / jnp.maximum(jnp.abs(a).max(), 1e-6)

print("block_mm vs pad_scan rel diff:",
      float(diff(ginst, qa_emis, inst.emis_rank, inst.emis_start, inst.emis_end)),
      flush=True)
print({k: round(v, 2) for k, v in results.items()})
