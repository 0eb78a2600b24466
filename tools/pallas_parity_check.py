"""Quick on-TPU check: pallas blend fwd/bwd vs the XLA scan blend."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

from tpu_splat.ops.rasterize import rasterize

rng = np.random.default_rng(0)
N = 2000
W, H = 128, 96
f = 0.9 * W
z = rng.uniform(2, 10, N).astype(np.float32)
x = rng.uniform(-0.5, 0.5, N).astype(np.float32) * z
y = rng.uniform(-0.4, 0.4, N).astype(np.float32) * z
means = jnp.asarray(np.stack([x, y, z], 1))
sig = rng.uniform(1, 5, N).astype(np.float32) * z / f
scaling = jnp.asarray(np.log(np.stack([sig, sig * 0.7, sig], 1)))
q = rng.normal(0, 1, (N, 4)).astype(np.float32); q[:, 0] += 2
quat = jnp.asarray(q)
op = jnp.asarray(rng.normal(0.5, 1.5, (N, 1)).astype(np.float32))
sh0 = jnp.asarray(rng.normal(0, 0.6, (N, 1, 3)).astype(np.float32))
shN = jnp.asarray(rng.normal(0, 0.05, (N, 15, 3)).astype(np.float32))
alive = jnp.ones((N,), bool)
w2c = jnp.eye(4)
cpos = jnp.zeros(3)
bg = jnp.asarray([0.1, 0.2, 0.3])

_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 64  # 128/256 exercise kernel chunk widths
_ts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
kw = dict(width=W, height=H, max_instances=1 << 15, k_max=1024, chunk=_chunk, tile_size=_ts)

def run(backend):
    def loss_fn(m, s, r, o, c0, cN):
        out = rasterize(m, s, r, o, c0, cN, alive, w2c, cpos, f, f, W/2, H/2, 3, bg,
                        backend=backend, **kw)
        tgt = jnp.linspace(0, 1, W)[None, None, :]
        return jnp.sum((out.image - tgt) ** 2) * 1e-3, out
    (loss, out), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5), has_aux=True)(
        means, scaling, quat, op, sh0, shN)
    return loss, out, grads

l_x, out_x, g_x = run("xla")
print("xla    loss", float(l_x), "img mean", float(out_x.image.mean()), "alpha", float(out_x.alpha.mean()))
l_p, out_p, g_p = run("pallas")
print("pallas loss", float(l_p), "img mean", float(out_p.image.mean()), "alpha", float(out_p.alpha.mean()))

img_err = float(jnp.max(jnp.abs(out_x.image - out_p.image)))
alpha_err = float(jnp.max(jnp.abs(out_x.alpha - out_p.alpha)))
print("max |img diff|", img_err, " max |alpha diff|", alpha_err)
names = ["means", "scaling", "quat", "opacity", "sh0", "shN"]
ok = True
for nm, gx, gp in zip(names, g_x, g_p):
    scale = float(jnp.max(jnp.abs(gx))) + 1e-12
    err = float(jnp.max(jnp.abs(gx - gp))) / scale
    print(f"grad {nm:8s} relerr {err:.3e} (scale {scale:.3e})")
    ok &= err < 2e-2
assert img_err < 1e-2 and alpha_err < 1e-3, "forward mismatch"
assert ok, "gradient mismatch"
print("PALLAS MATCHES XLA")
