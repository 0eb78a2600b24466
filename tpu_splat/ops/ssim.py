"""Fused SSIM loss (XLA): 11x11 Gaussian window, sigma 1.5, valid padding.

Semantics of the reference CUDA kernel (src/training/kernels/ssim.cu:16-41, SURVEY.md §8.8):
hardcoded 11-tap Gaussian (sigma=1.5), C1=0.01^2, C2=0.03^2, separable convolution, and
"valid" mode crops the 5-px border from the final mean.

The separable blur is written as 11 shifted adds per direction rather than
`lax.conv_general_dilated`: a 3-channel depthwise conv lowers poorly on TPU (measured ~4x
slower fwd+bwd) and in reduced precision (its impulse response deviates from the exact
Gaussian outer product by ~3e-3 relative; the shifted-add form matches it to f32 exactness
— tools/profiling/profile_noise_ssim.py). XLA fuses the shifted adds into a single
elementwise pipeline.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

WINDOW = 11
SIGMA = 1.5
C1 = 0.01**2
C2 = 0.03**2


@functools.lru_cache(maxsize=None)
def _gauss_kernel_np() -> np.ndarray:
    x = np.arange(WINDOW) - (WINDOW - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * SIGMA**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 Gaussian blur, valid padding. img [B, C, H, W] -> [B, C, H-10, W-10]."""
    k = _gauss_kernel_np()
    b, c, h, w = img.shape
    m = WINDOW - 1
    out_w = jnp.zeros((b, c, h, w - m), img.dtype)
    for i, wgt in enumerate(k):
        out_w = out_w + wgt * img[:, :, :, i : w - m + i]
    out = jnp.zeros((b, c, h - m, w - m), img.dtype)
    for i, wgt in enumerate(k):
        out = out + wgt * out_w[:, :, i : h - m + i, :]
    return out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM between [C,H,W] or [B,C,H,W] images, valid padding (reference default:
    `fused_ssim(rendered, gt, "valid", train=true)`, trainer.cpp:123)."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]

    mu1 = _blur(img1)
    mu2 = _blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1) - mu1_sq
    sigma2_sq = _blur(img2 * img2) - mu2_sq
    sigma12 = _blur(img1 * img2) - mu12

    num = (2.0 * mu12 + C1) * (2.0 * sigma12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    return jnp.mean(num / den)
