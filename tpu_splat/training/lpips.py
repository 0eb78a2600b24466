"""LPIPS perceptual metric in JAX (VGG16 backbone + linear heads).

Reference: the evaluator loads a TorchScript VGG-LPIPS from `weights/lpips_vgg.pt`
(src/training/metrics/metrics.hpp:54-67); that file is NOT shipped in the repo — the
reference downloads it out-of-band. Here the standard LPIPS-VGG architecture (Zhang et al.
2018) runs natively on TPU; weights load from an .npz converted once from the official
torch checkpoint (see `convert_torch_lpips` below). Without a weights file the metric is
reported as None, like a reference build without weights/lpips_vgg.pt.

Pipeline (lpips.LPIPS(net='vgg') semantics):
  x in [0,1] -> scale to [-1,1] -> (x - shift)/scale with ImageNet-ish constants ->
  VGG16 features at relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 -> unit-normalize each
  channel vector -> squared diff -> 1x1 conv (linear head) -> spatial mean -> sum layers.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per block; features tapped after each block
VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    """3x3 same conv, NCHW; w [O,I,3,3]."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return out + b[None, :, None, None]


def vgg_features(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x [N,3,H,W] in [-1,1] normalized; returns the five tap activations."""
    feats = []
    h = x
    li = 0
    for bi, (ch, n_convs) in enumerate(VGG_BLOCKS):
        for ci in range(n_convs):
            h = _conv(h, params[f"conv{li}_w"], params[f"conv{li}_b"])
            h = jax.nn.relu(h)
            li += 1
        feats.append(h)
        if bi < len(VGG_BLOCKS) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return feats


@functools.partial(jax.jit, static_argnames=())
def _lpips_fn(params: dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a, b [N,3,H,W] in [0,1]."""
    shift = jnp.asarray(SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(SCALE).reshape(1, 3, 1, 1)

    def norm_input(x):
        return (2.0 * x - 1.0 - shift) / scale

    fa = vgg_features(params, norm_input(a))
    fb = vgg_features(params, norm_input(b))
    total = jnp.zeros(())
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / jnp.maximum(jnp.linalg.norm(xa, axis=1, keepdims=True), 1e-10)
        nb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=1, keepdims=True), 1e-10)
        d = (na - nb) ** 2  # [N,C,H,W]
        lin = params[f"lin{i}_w"]  # [1, C, 1, 1]
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return total


class LPIPSJax:
    """JAX LPIPS-VGG; `available` is False without a weights file."""

    def __init__(self, weights_path: str | Path = "weights/lpips_vgg.npz"):
        self.params: Optional[dict] = None
        p = Path(weights_path)
        if p.exists():
            data = np.load(p)
            self.params = {k: jnp.asarray(v) for k, v in data.items()}

    @property
    def available(self) -> bool:
        return self.params is not None

    def __call__(self, a: np.ndarray, b: np.ndarray) -> Optional[float]:
        """a, b [3,H,W] in [0,1]."""
        if self.params is None:
            return None
        return float(_lpips_fn(self.params, jnp.asarray(a)[None], jnp.asarray(b)[None]))


def convert_torch_lpips(torch_lpips_state: dict, out_path: str | Path) -> None:
    """One-time converter: official `lpips.LPIPS(net='vgg')` state_dict -> npz.

    Run wherever torch+lpips are installed:
        import lpips, numpy as np
        m = lpips.LPIPS(net='vgg')
        convert_torch_lpips({k: v.numpy() for k, v in m.state_dict().items()}, out)
    """
    # lpips's vgg is split into slice1..slice5; gather conv weights in order
    convs = []
    for k in sorted(torch_lpips_state):
        if k.startswith("net.slice") and k.endswith(".weight") and torch_lpips_state[k].ndim == 4:
            convs.append(k[: -len(".weight")])

    def slice_order(name):
        parts = name.split(".")
        return (int(parts[1][len("slice"):]), int(parts[2]))

    convs.sort(key=slice_order)
    out = {}
    for i, base in enumerate(convs):
        out[f"conv{i}_w"] = np.asarray(torch_lpips_state[base + ".weight"])
        out[f"conv{i}_b"] = np.asarray(torch_lpips_state[base + ".bias"])
    for i in range(5):
        out[f"lin{i}_w"] = np.asarray(torch_lpips_state[f"lin{i}.model.1.weight"]).reshape(
            1, -1, 1, 1
        )
    np.savez_compressed(out_path, **out)


def random_params(seed: int = 0) -> dict:
    """Random-weight LPIPS for tests (architecture exercise only)."""
    rng = np.random.default_rng(seed)
    params = {}
    li = 0
    in_ch = 3
    for ch, n_convs in VGG_BLOCKS:
        for _ in range(n_convs):
            params[f"conv{li}_w"] = jnp.asarray(
                rng.normal(0, 0.05, (ch, in_ch, 3, 3)).astype(np.float32)
            )
            params[f"conv{li}_b"] = jnp.zeros((ch,), jnp.float32)
            in_ch = ch
            li += 1
    for i, (ch, _) in enumerate(VGG_BLOCKS):
        params[f"lin{i}_w"] = jnp.asarray(
            np.abs(rng.normal(0, 0.01, (1, ch, 1, 1))).astype(np.float32)
        )
    return params
