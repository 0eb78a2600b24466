"""Find a fast per-gaussian gradient reduction (replaces the 377ms scatter-add)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
M = 1 << 22
rng = np.random.default_rng(0)
# realistic: ~2.8M valid instances, each gaussian contiguous run in emission order
counts = rng.integers(0, 8, N).astype(np.int32)
gid_sorted_np = np.repeat(np.arange(N, dtype=np.int32), counts)[:M]
pad = M - gid_sorted_np.size
if pad > 0:
    gid_sorted_np = np.concatenate([gid_sorted_np, np.zeros(pad, np.int32)])
gid_shuffled_np = gid_sorted_np.copy()
rng.shuffle(gid_shuffled_np)

gid_sorted = jnp.asarray(gid_sorted_np)
gid_shuffled = jnp.asarray(gid_shuffled_np)
vals = jnp.asarray(rng.random((M, 10), np.float32))
wout = jnp.asarray(rng.random((N, 10), np.float32))  # defeats sum(scatter)=sum(v) folding
wout1 = wout[:, 0]


def chain(name, fn, *args, iters=5):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(jnp.float32(0), *args); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    jax.block_until_ready(x)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


chain("scatter-add [4M,10] unsorted", lambda x, v, g, w: jnp.sum(jnp.square(
    jnp.zeros((N, 10), jnp.float32).at[g].add(v + x))), vals, gid_shuffled, wout)
chain("scatter-add [4M,10] sorted ids + flag", lambda x, v, g, w: jnp.sum(jnp.square(
    jnp.zeros((N, 10), jnp.float32).at[g].add(v + x, indices_are_sorted=True))),
    vals, gid_sorted, wout)
chain("scatter-add [4M] 1col unsorted", lambda x, v, g, w: jnp.sum(jnp.square(
    jnp.zeros((N,), jnp.float32).at[g].add(v[:, 0] + x))), vals, gid_shuffled, wout1)
chain("scatter-add [4M] 1col sorted+flag", lambda x, v, g, w: jnp.sum(jnp.square(
    jnp.zeros((N,), jnp.float32).at[g].add(v[:, 0] + x, indices_are_sorted=True))),
    vals, gid_sorted, wout1)
chain("segment_sum sorted (num_segments=N)", lambda x, v, g, w: jnp.sum(jnp.square(
    jax.ops.segment_sum(v + x, g, num_segments=N, indices_are_sorted=True))),
    vals, gid_sorted, wout)

# gather + transposed cumsum + boundary gathers (sorted contiguous segments)
offs_incl_np = np.cumsum(counts)
offs_excl = jnp.asarray((offs_incl_np - counts).clip(0, M - 1).astype(np.int32))
offs_incl = jnp.asarray(np.minimum(offs_incl_np, M).astype(np.int32))

def seg_via_cumsum(x, v, oe, oi, w):
    vt = (v + x).T  # [10, 4M]
    cs = jnp.cumsum(vt, axis=1)
    cs = jnp.pad(cs, ((0, 0), (1, 0)))  # prefix with 0
    return jnp.sum(jnp.square(cs[:, oi] - cs[:, oe]))

chain("gather+cumsum segmented", seg_via_cumsum, vals, offs_excl, offs_incl, wout)


# the transpose suspected as the real 377ms cost
R = 32896 // 1  # ~n_rows
gp = jnp.asarray(rng.random((32896, 16, 128), np.float32))
chain("transpose [R,16,128]->[MAX,16]", lambda x, g: jnp.sum(jnp.square(
    (g + x).transpose(0, 2, 1).reshape(-1, 16))), gp)
chain("slice 10 features [R,128] each", lambda x, g: sum(
    jnp.sum(jnp.square((g + x)[:, f, :])) for f in range(10)), gp)
