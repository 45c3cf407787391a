"""Rotation parameterisations and conversions (batched, jit-friendly).

Semantics follow the reference's ZYX-euler conventions so that poses parsed
from its datasets round-trip identically (reference:
detect_3d_cuboid/src/matrix_utils.cpp:19-98).  All functions broadcast over
leading batch dimensions; quaternions are stored as (..., 4) in (w, x, y, z)
order.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# quaternion primitives
# ---------------------------------------------------------------------------

def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalise, flipping sign so w >= 0 (canonical double cover)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both (..., 4) wxyz."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    r = jnp.stack(
        [
            1.0 - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, 1.0 - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, 1.0 - (txx + tyy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) wxyz.

    Branch-free Shepperd method: compute all four candidate quaternions and
    select the numerically best (largest pivot), so it is safe under vmap/jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidate (unnormalised) quaternions, one per pivot
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 pivots, 4)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    return quat_normalize(q[..., 0, :])


def quat_from_yaw(yaw: jnp.ndarray) -> jnp.ndarray:
    """Pure z-axis rotation quaternion (matches g2o_Object.h:107)."""
    half = 0.5 * yaw
    zeros = jnp.zeros_like(yaw)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


# ---------------------------------------------------------------------------
# ZYX euler conventions (reference matrix_utils.cpp:19-98)
# ---------------------------------------------------------------------------

def euler_zyx_to_quat(roll, pitch, yaw) -> jnp.ndarray:
    """ZYX euler (roll about x applied first) -> quaternion wxyz.

    Matches reference `zyx_euler_to_quat` (matrix_utils.cpp:19-33).
    """
    sy, cy = jnp.sin(yaw * 0.5), jnp.cos(yaw * 0.5)
    sp, cp = jnp.sin(pitch * 0.5), jnp.cos(pitch * 0.5)
    sr, cr = jnp.sin(roll * 0.5), jnp.cos(roll * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_to_euler_zyx(q: jnp.ndarray):
    """Quaternion wxyz -> (roll, pitch, yaw) (matrix_utils.cpp:38-49)."""
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    roll = jnp.arctan2(2.0 * (qw * qx + qy * qz), 1.0 - 2.0 * (qx * qx + qy * qy))
    pitch = jnp.arcsin(jnp.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))
    return roll, pitch, yaw


def euler_zyx_to_rot(roll, pitch, yaw) -> jnp.ndarray:
    """ZYX euler -> rotation matrix (..., 3, 3) (matrix_utils.cpp:81-96)."""
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    sr, cr = jnp.sin(roll), jnp.cos(roll)
    sy, cy = jnp.sin(yaw), jnp.cos(yaw)
    r = jnp.stack(
        [
            cp * cy, (sr * sp * cy) - (cr * sy), (cr * sp * cy) + (sr * sy),
            cp * sy, (sr * sp * sy) + (cr * cy), (cr * sp * sy) - (sr * cy),
            -sp, sr * cp, cr * cp,
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rot_to_euler_zyx(R: jnp.ndarray):
    """Rotation matrix -> (roll, pitch, yaw); regular branch only
    (matrix_utils.cpp:54-74 gimbal-lock branches are ~never hit in practice)."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


# ---------------------------------------------------------------------------
# small angle helpers
# ---------------------------------------------------------------------------

def normalize_to_pi_half(angle: jnp.ndarray) -> jnp.ndarray:
    """Fold angle into (-pi/2, pi/2] by +-pi, like reference `normalize_to_pi`
    (matrix_utils.cpp:344-353; despite the name it folds to half-pi range)."""
    angle = jnp.where(angle > jnp.pi / 2, angle - jnp.pi, angle)
    angle = jnp.where(angle < -jnp.pi / 2, angle + jnp.pi, angle)
    return angle


def angle_dist_pi(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """min(|a-b|, pi-|a-b|): distance between undirected line angles."""
    d = jnp.abs(a - b)
    return jnp.minimum(d, jnp.pi - d)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Hat operator: (..., 3) -> (..., 3, 3)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zeros = jnp.zeros_like(x)
    m = jnp.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))
