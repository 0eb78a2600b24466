"""Isolate emission sub-costs and test the scatter+cummax replacement for jnp.repeat."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
MAX_INST = 1 << 22

rng = np.random.default_rng(0)
counts_np = rng.integers(0, 8, N).astype(np.int32)
counts0 = jnp.asarray(counts_np)
tminx = jnp.asarray(rng.integers(0, 80, N, np.int32))
tminy = jnp.asarray(rng.integers(0, 52, N, np.int32))
mean2d = jnp.asarray(rng.random((N, 2), np.float32))


def chain(name, fn, iters=6):
    x0 = jnp.zeros((), jnp.int32)

    @jax.jit
    def step(x):
        return x + 0 * fn(counts0 + x)
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def f_repeat(counts):
    pos = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=MAX_INST)
    return pos.sum()

def f_scatter_cummax(counts):
    offs_incl = jnp.cumsum(counts)
    offs_excl = offs_incl - counts
    starts = jnp.where(counts > 0, offs_excl, MAX_INST)
    pos = jnp.zeros((MAX_INST,), jnp.int32).at[starts].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    pos = jax.lax.cummax(pos)
    return pos.sum()

def f_gathers(counts):
    # 4M gathers from [N] arrays (the pos-indexed loads in emission)
    pos = jnp.asarray(rng.integers(0, N, MAX_INST, np.int32)) + 0 * counts[0]
    s = counts[pos].sum() + tminx[pos].sum() + tminy[pos].sum() + mean2d[pos].sum()
    return s.astype(jnp.int32)

def f_cumsum(counts):
    return jnp.cumsum(counts)[-1]

def f_cummax4m(counts):
    x = jnp.zeros((MAX_INST,), jnp.int32).at[0].set(counts[0])
    return jax.lax.cummax(x)[-1]


chain("repeat 1M->4M", f_repeat)
chain("scatter+cummax 1M->4M", f_scatter_cummax)
chain("4M gathers x5", f_gathers)
chain("cumsum 1M", f_cumsum)
chain("cummax 4M", f_cummax4m)


def f_intdiv(counts):
    k = jnp.asarray(rng.integers(0, 169, MAX_INST, np.int32)) + 0 * counts[0]
    w = jnp.asarray(rng.integers(1, 14, MAX_INST, np.int32))
    return (k % w).sum() + (k // w).sum()

def f_floatdiv(counts):
    k = jnp.asarray(rng.integers(0, 169, MAX_INST, np.int32)) + 0 * counts[0]
    w = jnp.asarray(rng.integers(1, 14, MAX_INST, np.int32))
    kf = k.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    q = jnp.floor(kf / wf).astype(jnp.int32)
    r = k - q * w
    return r.sum() + q.sum()

chain("int div/mod 4M variable", f_intdiv)
chain("float div emulation 4M", f_floatdiv)
