"""Spherical-harmonics color evaluation, degree <= 4.

Degrees <= 3 match `convert_sh_to_color` (fastgs/rasterization/include/kernel_utils.cuh:15-39)
— the reference fast path's in-kernel cap — and degree 4 adds the gsplat Sloan fast basis
(gsplat/SphericalHarmonicsCUDA.cu:76-103). View direction = normalize(mean - cam_pos),
color = 0.5 + sum. The active degree is a *traced* int (bands masked), so SH-degree
scheduling (sh_degree_interval) does not trigger recompilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.48860251190291987
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525251999,
         -1.0925484305920792, 0.54627421529603959)
SH_C3 = (0.59004358992664352, 2.8906114426405538, 0.45704579946446572,
         0.3731763325901154, 1.4453057213202769)


def sh_to_color(
    sh0: jnp.ndarray,  # [N, 1, 3]
    shN: jnp.ndarray,  # [N, K-1, 3] (K-1 >= 15 for degree 3; extra bands ignored)
    dirs: jnp.ndarray,  # [N, 3] unnormalized (mean - cam_pos)
    active_sh_degree,  # traced or static int
) -> jnp.ndarray:
    """RGB [N, 3] = 0.5 + SH(dir) with band masking by active degree; NOT clamped here —
    the blend clamps >= 0 with pass-through gradients (kernels_forward.cuh:410,
    kernels_backward.cuh:296-303)."""
    # Safe normalize: dirs can be exactly 0 for dead/degenerate slots; clamping norm^2 keeps
    # the VJP finite there (grad is masked to 0 downstream, but 0*NaN would still be NaN).
    norm_sq = jnp.sum(dirs * dirs, axis=-1, keepdims=True)
    d = dirs * jax.lax.rsqrt(jnp.maximum(norm_sq, 1e-24))
    x, y, z = d[..., 0:1], d[..., 1:2], d[..., 2:3]  # [N,1]

    result = 0.5 + SH_C0 * sh0[:, 0, :]

    deg = jnp.asarray(active_sh_degree)
    m1 = (deg >= 1).astype(result.dtype)
    m2 = (deg >= 2).astype(result.dtype)
    m3 = (deg >= 3).astype(result.dtype)

    c = shN  # [N, K-1, 3]
    b1 = (-SH_C1 * y) * c[:, 0] + (SH_C1 * z) * c[:, 1] + (-SH_C1 * x) * c[:, 2]
    result = result + m1 * b1

    if c.shape[1] >= 8:
        xx, yy, zz = x * x, y * y, z * z
        xy, xz, yz = x * y, x * z, y * z
        b2 = (
            (SH_C2[0] * xy) * c[:, 3]
            + (SH_C2[1] * yz) * c[:, 4]
            + (0.94617469575755997 * zz - SH_C2[2]) * c[:, 5]
            + (SH_C2[3] * xz) * c[:, 6]
            + (SH_C2[4] * xx - SH_C2[4] * yy) * c[:, 7]
        )
        result = result + m2 * b2

    if c.shape[1] >= 15:
        b3 = (
            (SH_C3[0] * y * (-3.0 * xx + yy)) * c[:, 8]
            + (SH_C3[1] * xy * z) * c[:, 9]
            + (SH_C3[2] * y * (1.0 - 5.0 * zz)) * c[:, 10]
            + (SH_C3[3] * z * (5.0 * zz - 3.0)) * c[:, 11]
            + (SH_C3[2] * x * (1.0 - 5.0 * zz)) * c[:, 12]
            + (SH_C3[4] * z * (xx - yy)) * c[:, 13]
            + (SH_C3[0] * x * (-xx + 3.0 * yy)) * c[:, 14]
        )
        result = result + m3 * b3

    if c.shape[1] >= 24:
        # degree 4 (Sloan fast basis, gsplat/SphericalHarmonicsCUDA.cu:76-103)
        m4 = (deg >= 4).astype(result.dtype)
        fc1 = xx - yy
        fs1 = 2.0 * xy
        fc2 = x * fc1 - y * fs1
        fs2 = x * fs1 + y * fc1
        fc3 = x * fc2 - y * fs2
        fs3 = x * fs2 + y * fc2
        tmp0d = z * (-4.683325804901025 * zz + 2.007139630671868)
        tmp1c = 3.31161143515146 * zz - 0.47308734787878
        tmp2b = -1.770130769779931 * z
        psh6 = 0.9461746957575601 * zz - 0.3153915652525201
        psh12 = z * (1.865881662950577 * zz - 1.119528997770346)
        b4 = (
            (0.6258357354491763 * fs3) * c[:, 15]
            + (tmp2b * fs2) * c[:, 16]
            + (tmp1c * fs1) * c[:, 17]
            + (tmp0d * y) * c[:, 18]
            + (1.984313483298443 * z * psh12 - 1.006230589874905 * psh6) * c[:, 19]
            + (tmp0d * x) * c[:, 20]
            + (tmp1c * fc1) * c[:, 21]
            + (tmp2b * fc2) * c[:, 22]
            + (0.6258357354491763 * fc3) * c[:, 23]
        )
        result = result + m4 * b4

    return result
