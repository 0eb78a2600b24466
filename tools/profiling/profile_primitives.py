"""Honest (DCE-proof) primitive costs: gather, scatter, cummax, sort, repeat.

Anti-DCE: the chained value perturbs the DATA (float), and results are summed as floats.
"""
import time
import jax, jax.numpy as jnp, numpy as np

N = 1_000_000
M = 1 << 22
rng = np.random.default_rng(0)
idx4m = jnp.asarray(rng.integers(0, N, M, np.int32))
data1m = jnp.asarray(rng.random(N, np.float32))
data1m8 = jnp.asarray(rng.random((N, 8), np.float32))
keys4m_f = jnp.asarray(rng.random(M, np.float32))
counts_np = rng.integers(0, 8, N).astype(np.int32)
counts1m = jnp.asarray(counts_np)
x0 = jnp.float32(0.0)


def chain(name, fn, iters=6):
    @jax.jit
    def step(x):
        return x + 0.0 * fn(x)
    x = step(x0); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters): x = step(x)
    jax.block_until_ready(x)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


chain("gather 4M <- [1M] f32", lambda x: (data1m + x)[idx4m].sum())
chain("row-gather 4M <- [1M,8] f32", lambda x: (data1m8 + x)[idx4m].sum())
chain("gather 4M, idx also traced", lambda x: (data1m + x)[jnp.clip(idx4m + x.astype(jnp.int32), 0, N - 1)].sum())
chain("scatter-add 1M -> [4M] f32", lambda x: jnp.zeros(M, jnp.float32).at[idx4m[:N]].add(data1m + x).sum())
chain("cummax 4M f32", lambda x: jax.lax.cummax(keys4m_f + x).sum())
chain("cumsum 4M f32", lambda x: jnp.cumsum(keys4m_f + x).sum())
chain("cumsum 1M i32 (as f32)", lambda x: jnp.cumsum(counts1m.astype(jnp.float32) + x).sum())
chain("sort 4M f32 single", lambda x: jnp.sort(keys4m_f + x).sum())


def sort_pairs(x):
    k = (keys4m_f + x)
    v = keys4m_f * 2.0
    sk, sv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    return sk.sum() + sv.sum()
chain("stable sort 4M (f32 key, f32 val)", sort_pairs)


def sort_pairs_int_key(x):
    k = jnp.clip((keys4m_f + x) * 4292.0, 0, 4292).astype(jnp.int32)
    v = keys4m_f * 2.0
    sk, sv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    return sk.astype(jnp.float32).sum() + sv.sum()
chain("stable sort 4M (i32 key, f32 val)", sort_pairs_int_key)


def repeat_f(x):
    pos = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts1m, total_repeat_length=M)
    return (pos.astype(jnp.float32) + x).sum() * 0 + (data1m + x)[pos[:N]].sum()
chain("repeat 1M->4M (+1 gather)", repeat_f)


def scatter_cummax_f(x):
    offs_incl = jnp.cumsum(counts1m)
    offs_excl = offs_incl - counts1m
    starts = jnp.where(counts1m > 0, offs_excl, M)
    pos = jnp.zeros((M,), jnp.int32).at[starts].max(jnp.arange(N, dtype=jnp.int32), mode="drop")
    pos = jax.lax.cummax(pos)
    return (data1m + x)[pos[:N]].sum()
chain("scatter+cummax 1M->4M (+1 gather)", scatter_cummax_f)

chain("searchsorted 4293q in 4M", lambda x: jnp.searchsorted(keys4m_f + x, jnp.linspace(0, 1, 4293)).astype(jnp.float32).sum())
chain("searchsorted 4Mq in 4293", lambda x: jnp.searchsorted(jnp.linspace(0, 1, 4293) + x, keys4m_f).astype(jnp.float32).sum())
