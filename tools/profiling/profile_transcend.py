"""Transcendental cost A/B inside a Pallas kernel: exp vs exp2, log vs log2, plus a
mul-only baseline — determines whether rewriting the blend kernels' three
transcendental sites (gauss exp, log(1-a), exp(prefix)) in base-2 form saves VPU passes.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, C, REP = 1024, 256, 64
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def make(op):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = jnp.zeros_like(x)
        for _ in range(REP):
            x = op(x) * 0.5 + 0.3
            acc = acc + x
        o_ref[:] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        )(x)

    return run


OPS = {
    "mul (baseline)": lambda x: x * 1.0001,
    "exp": lambda x: jnp.exp(-x * x),
    "exp2": lambda x: jnp.exp2(-(x * x) * LOG2E),
    "log": lambda x: jnp.log(jnp.abs(x) + 0.5),
    "log2": lambda x: jnp.log2(jnp.abs(x) + 0.5) * LN2,
    "log1p": lambda x: jnp.log1p(-jnp.minimum(jnp.abs(x), 0.9)),
    "tanh": lambda x: jnp.tanh(x),
    "recip": lambda x: pl.reciprocal(jnp.abs(x) + 0.5, approx=True),
}

x0 = jnp.linspace(0.01, 1.0, P * C).reshape(P, C).astype(jnp.float32)
res = {}
for name, op in OPS.items():
    run = make(op)
    y = run(x0)
    _ = float(y[0, 0])
    t0 = time.perf_counter()
    iters = 30
    y = x0
    for _ in range(iters):
        y = run(y * 1e-6)
    _ = float(y[0, 0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    res[name] = ms
    print(f"{name:16s} {ms:8.3f} ms  ({ms / REP * 1e3:6.1f} us/pass)", flush=True)

base = res["mul (baseline)"]
print({k: round(v / base, 2) for k, v in res.items()})
