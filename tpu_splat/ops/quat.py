"""Quaternion utilities (reference: fastgs preprocess quat math, kernels_forward.cuh:79-95,
and gsplat/QuatToRotmatCUDA.cu)."""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Unnormalized wxyz quaternion [..., 4] -> rotation matrix [..., 3, 3].

    Normalization is folded in by dividing the quadratic terms by |q|^2, exactly as the
    reference preprocess does (kernels_forward.cuh:82-95). Degenerate |q|^2 < eps is the
    caller's cull condition; here it is clamped to stay finite.
    """
    qr, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.maximum(qr * qr + qx * qx + qy * qy + qz * qz, eps)
    s = 2.0 / n
    xx, yy, zz = s * qx * qx, s * qy * qy, s * qz * qz
    xy, xz, yz = s * qx * qy, s * qx * qz, s * qy * qz
    rx, ry, rz = s * qr * qx, s * qr * qy, s * qr * qz
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - rz, ry + xz,
            rz + xy, 1.0 - (xx + zz), yz - rx,
            xz - ry, rx + yz, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_to_rotmat_cols(q: jnp.ndarray, eps: float = 1e-8):
    """Rotation-matrix entries as nine flat [...] columns, row-major tuple-of-tuples.

    Same normalization-folded math as `quat_to_rotmat` (kernels_forward.cuh:82-95), but
    never materializes a [..., 3, 3] array: consumers that expand matrix products into
    flat column arithmetic keep XLA's forward AND autodiff-backward in fully fused
    elementwise passes (the [N, 3, 3] einsum chain's VJP measured ~37 ms of
    relayout-heavy code at 1M gaussians — tools/profiling/profile_parambwd.py)."""
    qr, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.maximum(qr * qr + qx * qx + qy * qy + qz * qz, eps)
    s = 2.0 / n
    xx, yy, zz = s * qx * qx, s * qy * qy, s * qz * qz
    xy, xz, yz = s * qx * qy, s * qx * qz, s * qy * qz
    rx, ry, rz = s * qr * qx, s * qr * qy, s * qr * qz
    return (
        (1.0 - (yy + zz), xy - rz, ry + xz),
        (rz + xy, 1.0 - (xx + zz), yz - rx),
        (xz - ry, rx + yz, 1.0 - (xx + yy)),
    )


def quat_scale_to_covar(q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """(quat [...,4], scale σ [...,3]) -> 3D covariance R S^2 R^T [...,3,3]."""
    r = quat_to_rotmat(q)
    rs = r * (scales[..., None, :] ** 2)  # R @ diag(s^2)
    return rs @ jnp.swapaxes(r, -1, -2)
