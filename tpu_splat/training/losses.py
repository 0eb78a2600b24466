"""Training losses (trainer.cpp:103-197 semantics, single fused loss).

The reference computes five separate losses each with its own .backward()
(trainer.cpp:677-714) — an artifact it itself flags; here they sum into one jitted scalar
(SURVEY.md §8.13 explicitly recommends this equivalence).

  photometric = (1-lambda_dssim) * L1 + lambda_dssim * (1 - SSIM_valid)
  scale_reg   = scale_reg * mean(exp(scaling_raw))        over alive slots
  opacity_reg = opacity_reg * mean(sigmoid(opacity_raw))  over alive slots
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ssim import ssim


def photometric_loss(rendered: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float):
    l1 = jnp.mean(jnp.abs(rendered - gt))
    if not lambda_dssim:  # static: skip the SSIM convs entirely when unweighted
        return l1
    ssim_val = ssim(rendered, gt)
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_val)


def regularization_losses(
    params: dict[str, jnp.ndarray], alive: jnp.ndarray, scale_reg: float, opacity_reg: float
):
    """scale_reg * mean(scaling) + opacity_reg * mean(opacity) (trainer.cpp:133-160)."""
    alive_f = alive.astype(params["means"].dtype)
    n = jnp.maximum(jnp.sum(alive_f), 1.0)
    loss = jnp.zeros((), params["means"].dtype)
    if scale_reg > 0:
        scaling = jnp.exp(params["scaling_raw"])  # [C,3]
        loss = loss + scale_reg * jnp.sum(scaling * alive_f[:, None]) / (n * 3.0)
    if opacity_reg > 0:
        opacity = jax.nn.sigmoid(params["opacity_raw"][:, 0])
        loss = loss + opacity_reg * jnp.sum(opacity * alive_f) / n
    return loss
