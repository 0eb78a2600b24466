"""Does index locality speed up XLA row-gathers on TPU? If sorted/clustered indices
gather faster than random ones, Morton-reordering the gaussian table (so each tile's
instances have nearby gids) would cut the 3x ~17-19 ms gather glue.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
M = 2_097_152  # 2M gathers
rng = np.random.default_rng(0)

tab16 = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
tab16b = tab16.astype(jnp.bfloat16)

idx_rand = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
idx_sorted = jnp.sort(idx_rand)
# clustered: random base per 256-block, sequential-ish within (tile-locality model)
base = rng.integers(0, N - 512, M // 256)
off = rng.integers(0, 512, (M // 256, 256))
idx_clust = jnp.asarray(np.minimum(base[:, None] + off, N - 1).reshape(-1).astype(np.int32))


def chain(name, fn, *args, iters=10):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(jnp.float32(0), *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)


for tag, tab in (("f32", tab16), ("bf16", tab16b)):
    for iname, idx in (("random", idx_rand), ("sorted", idx_sorted),
                       ("clustered256", idx_clust)):
        chain(f"gather [{tag} x16] {iname}",
              lambda x, t, i: jnp.square(
                  t[i + jnp.zeros((), jnp.int32)].astype(jnp.float32)).sum() * 1e-9
              + x, tab, idx)

# and a narrow 1-lane gather for comparison
tab1 = tab16[:, 0]
chain("gather [f32 x1] random", lambda x, t, i: jnp.square(t[i]).sum() * 1e-9 + x,
      tab1, idx_rand)
chain("gather [f32 x1] sorted", lambda x, t, i: jnp.square(t[i]).sum() * 1e-9 + x,
      tab1, idx_sorted)
