"""On-TPU: Pallas GUT blend vs XLA GUT blend — images + gradients."""
import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parents[1])); sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tests"))
import jax, jax.numpy as jnp, numpy as np
from tpu_splat.ops.gut import rasterize_gut
from tpu_splat.ops.cameras import CameraParams
from utils import make_scene, make_camera

W = H = 96
scene = make_scene(400, seed=5)
splat = {k: jnp.asarray(v) for k, v in scene.items()}
cam = make_camera(W, H)
params = CameraParams(radial=(0.05, -0.01, 0, 0, 0, 0), tangential=(0.001, 0.0))
args = (splat["means"], splat["scaling_raw"], splat["rotation_raw"], splat["opacity_raw"],
        splat["sh0"], splat["shN"], splat["alive"],
        jnp.asarray(cam["w2c"]), jnp.asarray(cam["cam_position"]),
        cam["fx"], cam["fy"], cam["cx"], cam["cy"], 3, jnp.asarray([0.1, 0.2, 0.3]))
kw = dict(width=W, height=H, max_instances=1 << 13, k_max=512, chunk=16,
          cam_params=params, render_mode="RGB_D")

def run(backend):
    def loss_fn(m, s, r, o, c0, cN):
        out = rasterize_gut(m, s, r, o, c0, cN, *args[6:], backend=backend, **kw)
        tgt = jnp.linspace(0, 1, W)[None, None, :]
        return jnp.sum((out.image - tgt) ** 2) * 1e-3 + jnp.sum(out.depth) * 1e-5, out
    (l, out), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5),
                                         has_aux=True)(*[splat[k] for k in
        ("means", "scaling_raw", "rotation_raw", "opacity_raw", "sh0", "shN")])
    return l, out, grads

l_x, out_x, g_x = run("xla")
print("xla    loss", float(l_x), "img", float(out_x.image.mean()), "alpha", float(out_x.alpha.mean()))
l_p, out_p, g_p = run("pallas")
print("pallas loss", float(l_p), "img", float(out_p.image.mean()), "alpha", float(out_p.alpha.mean()))
ie = float(jnp.max(jnp.abs(out_x.image - out_p.image)))
ae = float(jnp.max(jnp.abs(out_x.alpha - out_p.alpha)))
de = float(jnp.max(jnp.abs(out_x.depth - out_p.depth)))
print("max diffs: img", ie, "alpha", ae, "depth", de)
ok = True
for nm, gx, gp in zip(("means","scaling","quat","opacity","sh0","shN"), g_x, g_p):
    sc = float(jnp.max(jnp.abs(gx))) + 1e-12
    err = float(jnp.max(jnp.abs(gx - gp))) / sc
    print(f"grad {nm:8s} relerr {err:.3e} (scale {sc:.3e})")
    ok &= err < 2e-2
assert ie < 1e-2 and ae < 1e-3 and de < 0.05 and ok
print("GUT PALLAS MATCHES XLA")
