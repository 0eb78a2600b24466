"""Honest scatter-add / segmented-reduce costs: output feeds next iteration's values."""
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
counts = rng.integers(0, 8, N).astype(np.int32)
reps = np.repeat(np.arange(N, dtype=np.int32), counts)
gid_sorted_np = np.concatenate([reps, np.zeros(max(0, M - reps.size), np.int32)])[:M]
gid_shuf_np = gid_sorted_np.copy()
rng.shuffle(gid_shuf_np)
gid_sorted = jnp.asarray(gid_sorted_np)
gid_shuf = jnp.asarray(gid_shuf_np)
vals0 = jnp.asarray(rng.random((M, 10), np.float32))
offs_incl_np = np.minimum(np.cumsum(counts), M)
offs_incl = jnp.asarray(offs_incl_np.astype(np.int32))


def chain(name, fn, *args, iters=8):
    step = jax.jit(fn)
    v = step(vals0, *args)
    float(v[0, 0])  # device_get: the only true sync on the axon tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        v = step(v, *args)
    float(v[0, 0])
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def mk_scatter(sorted_flag):
    def f(v, g):
        acc = jnp.zeros((N, 10), jnp.float32).at[g].add(v, indices_are_sorted=sorted_flag)
        return v * (1.0 + 1e-12 * acc[g])
    return f


chain("row scatter-add unsorted + gatherback", mk_scatter(False), gid_shuf)
chain("row scatter-add sorted+flag + gatherback", mk_scatter(True), gid_sorted)


def seg_scan(v, g, oi):
    x = v
    s = 1
    while s < 4096:  # static bound on max segment length
        shifted = jnp.concatenate([jnp.zeros((s, 10), jnp.float32), x[:-s]], axis=0)
        same = jnp.concatenate([jnp.zeros((s,), bool), g[s:] == g[:-s]])
        x = x + jnp.where(same[:, None], shifted, 0.0)
        s *= 2
    acc = x[jnp.clip(oi - 1, 0, M - 1)] * (oi > 0)[..., None]  # [N,10] boundary gather
    return v * (1.0 + 1e-12 * acc[jnp.clip(g, 0, N - 1)])
chain("segmented Hillis-Steele + gatherback", seg_scan, gid_sorted, offs_incl)


def gather_back_only(v, g):
    acc = jnp.zeros((N, 10), jnp.float32) + v[:N]
    return v * (1.0 + 1e-12 * acc[g])
chain("gatherback baseline (no reduce)", gather_back_only, gid_shuf)
