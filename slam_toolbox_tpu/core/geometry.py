"""Batched SE(2) geometry, the L0 math layer (host-side, pure NumPy).

These run on the host orchestration path where per-call device dispatch
would dominate (jitted kernels inline their own math); keep them NumPy.

Poses are arrays of shape (..., 3) = (x, y, heading). All functions are pure,
vectorized, and jit-safe. Reference semantics (cited for parity, not ported):
  - Pose2 / Transform: /root/reference/lib/karto_sdk/include/karto_sdk/Karto.h:2035-3045
  - NormalizeAngle:    /root/reference/lib/karto_sdk/include/karto_sdk/Math.h:182-203
  - LinkInfo edge model: /root/reference/lib/karto_sdk/include/karto_sdk/Mapper.h:174-188
  - Weighted pose fusion: /root/reference/lib/karto_sdk/src/Mapper.cpp:1914-1958
"""
from __future__ import annotations

import math

import numpy as np

KT_TOLERANCE = 1e-6  # Math.h:41
MAX_VARIANCE = 500.0  # Mapper.cpp:52

# The single-pose fast paths below use the math module: same libm double
# ops as NumPy (bit-identical results) at ~20x less per-call overhead —
# these run thousands of times per drain on the host bookkeeping path.


def normalize_angle(angle):
    """Wrap angle(s) to [-pi, pi]. (Math.h:182)"""
    if np.ndim(angle) == 0:
        return math.atan2(math.sin(angle), math.cos(angle))
    return np.arctan2(np.sin(angle), np.cos(angle))


def normalize_angle_np(angle):
    return np.arctan2(np.sin(angle), np.cos(angle))


def rot2(theta):
    """(...,) -> (..., 2, 2) rotation matrices."""
    c, s = np.cos(theta), np.sin(theta)
    return np.stack(
        [np.stack([c, -s], axis=-1), np.stack([s, c], axis=-1)], axis=-2
    )


def compose(a, b):
    """SE(2) composition a ⊕ b: apply pose b in the frame of pose a.

    Matches Transform(a).TransformPose(b) (Karto.h:2974-2980).
    """
    a = np.asarray(a)
    b = np.asarray(b)
    if a.ndim == 1 and b.ndim == 1:
        ax, ay, ah = a.tolist()
        bx, by, bh = b.tolist()
        ca, sa = math.cos(ah), math.sin(ah)
        h = ah + bh
        return np.array([
            ax + ca * bx - sa * by,
            ay + sa * bx + ca * by,
            math.atan2(math.sin(h), math.cos(h)),
        ])
    ca, sa = np.cos(a[..., 2]), np.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    h = normalize_angle(a[..., 2] + b[..., 2])
    return np.stack([x, y, h], axis=-1)


def inverse(p):
    """SE(2) inverse: compose(inverse(p), p) == identity."""
    p = np.asarray(p)
    if p.ndim == 1:
        px, py, ph = p.tolist()
        c, s = math.cos(ph), math.sin(ph)
        return np.array(
            [-(c * px + s * py), -(-s * px + c * py), -ph]
        )
    c, s = np.cos(p[..., 2]), np.sin(p[..., 2])
    x = -(c * p[..., 0] + s * p[..., 1])
    y = -(-s * p[..., 0] + c * p[..., 1])
    return np.stack([x, y, -p[..., 2]], axis=-1)


def relative_pose(p1, p2):
    """Pose of p2 expressed in the frame of p1 (the LinkInfo pose difference).

    Matches Transform(rPose1, Pose2()).TransformPose(rPose2) used at
    Mapper.h:180-181: position R(-h1)·(pos2-pos1), heading h2-h1 normalized.
    """
    p1 = np.asarray(p1)
    p2 = np.asarray(p2)
    if p1.ndim == 1 and p2.ndim == 1:
        x1, y1, h1 = p1.tolist()
        x2, y2, h2 = p2.tolist()
        c, s = math.cos(h1), math.sin(h1)
        dx, dy = x2 - x1, y2 - y1
        h = h2 - h1
        return np.array([
            c * dx + s * dy,
            -s * dx + c * dy,
            math.atan2(math.sin(h), math.cos(h)),
        ])
    c, s = np.cos(p1[..., 2]), np.sin(p1[..., 2])
    dx = p2[..., 0] - p1[..., 0]
    dy = p2[..., 1] - p1[..., 1]
    x = c * dx + s * dy
    y = -s * dx + c * dy
    h = normalize_angle(p2[..., 2] - p1[..., 2])
    return np.stack([x, y, h], axis=-1)


def transform_pose_between(p1, p2, p):
    """Apply the rigid transform that maps pose p1 onto pose p2, to pose p.

    Matches Transform(p1, p2).TransformPose(p) (Karto.h:2963-3025):
    rotation by (h2-h1), translation p2 - R·p1; heading p.h + (h2-h1).
    Used for odometry propagation through the last correction
    (Mapper.cpp:2698-2701).
    """
    p1 = np.asarray(p1)
    p2 = np.asarray(p2)
    p = np.asarray(p)
    if p1.ndim == 1 and p2.ndim == 1 and p.ndim == 1:
        x1, y1, h1 = p1.tolist()
        x2, y2, h2 = p2.tolist()
        px, py, ph = p.tolist()
        dh = h2 - h1
        c, s = math.cos(dh), math.sin(dh)
        h = ph + dh
        return np.array([
            x2 - (c * x1 - s * y1) + c * px - s * py,
            y2 - (s * x1 + c * y1) + s * px + c * py,
            math.atan2(math.sin(h), math.cos(h)),
        ])
    dh = p2[..., 2] - p1[..., 2]
    c, s = np.cos(dh), np.sin(dh)
    tx = p2[..., 0] - (c * p1[..., 0] - s * p1[..., 1])
    ty = p2[..., 1] - (s * p1[..., 0] + c * p1[..., 1])
    x = tx + c * p[..., 0] - s * p[..., 1]
    y = ty + s * p[..., 0] + c * p[..., 1]
    h = normalize_angle(p[..., 2] + dh)
    return np.stack([x, y, h], axis=-1)


def sensor_at(robot_pose, offset_pose):
    """Sensor pose if the robot is at robot_pose (Karto.h:5566-5569)."""
    return compose(robot_pose, offset_pose)


def corrected_at(sensor_pose, offset_pose):
    """Robot pose given the sensor pose; inverse of sensor_at with the
    360°-lidar frame fix (Karto.h:5574-5586): the world offset keeps the
    offset pose's own heading, and the subtraction is componentwise.
    """
    sensor_pose = np.asarray(sensor_pose)
    offset_pose = np.asarray(offset_pose)
    if sensor_pose.ndim == 1 and offset_pose.ndim == 1:
        sx, sy, sh = sensor_pose.tolist()
        ox, oy, oh = offset_pose.tolist()
        length = math.sqrt(ox * ox + oy * oy)
        alpha = math.atan2(oy, ox)
        hs = math.atan2(math.sin(sh), math.cos(sh))
        a = hs + alpha - oh
        hd = sh - oh
        return np.array([
            sx - length * math.cos(a),
            sy - length * math.sin(a),
            math.atan2(math.sin(hd), math.cos(hd)),
        ])
    ox, oy, oh = offset_pose[..., 0], offset_pose[..., 1], offset_pose[..., 2]
    length = np.sqrt(ox * ox + oy * oy)
    alpha = np.arctan2(oy, ox)
    hs = normalize_angle(sensor_pose[..., 2])
    wx = length * np.cos(hs + alpha - oh)
    wy = length * np.sin(hs + alpha - oh)
    x = sensor_pose[..., 0] - wx
    y = sensor_pose[..., 1] - wy
    h = normalize_angle(sensor_pose[..., 2] - oh)
    return np.stack([x, y, h], axis=-1)


def rot3_z(theta):
    """3x3 rotation about z embedding the SE(2) tangent ordering (x, y, th).

    Matches Matrix3::FromAxisAngle(0,0,1,theta) (Karto.h:2496-2528) as used
    to rotate edge covariances into the source frame (Mapper.h:183-187).
    """
    theta = np.asarray(theta)
    if theta.ndim == 0:
        c, s = math.cos(float(theta)), math.sin(float(theta))
        return np.array(
            [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]
        )
    c, s = np.cos(theta), np.sin(theta)
    z = np.zeros_like(c)
    o = np.ones_like(c)
    return np.stack(
        [
            np.stack([c, -s, z], axis=-1),
            np.stack([s, c, z], axis=-1),
            np.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def rotate_covariance(cov, theta):
    """R(theta) · cov · R(theta)^T with R = rot3_z (Mapper.h:183-187 uses
    theta = -h1 to express the covariance in the source-pose frame)."""
    cov = np.asarray(cov)
    theta = np.asarray(theta)
    if cov.ndim == 2 and theta.ndim == 0:
        # scalar fast path (one edge): R only mixes the xy block, so the
        # two 3x3 matmuls collapse to 12 multiply-adds (~5 us -> ~1.5 us
        # per edge on the drain bookkeeping path)
        c, s = math.cos(float(theta)), math.sin(float(theta))
        (c00, c01, c02), (c10, c11, c12), (c20, c21, c22) = cov.tolist()
        b00 = c * c00 - s * c10
        b01 = c * c01 - s * c11
        b02 = c * c02 - s * c12
        b10 = s * c00 + c * c10
        b11 = s * c01 + c * c11
        b12 = s * c02 + c * c12
        return np.array([
            [c * b00 - s * b01, s * b00 + c * b01, b02],
            [c * b10 - s * b11, s * b10 + c * b11, b12],
            [c * c20 - s * c21, s * c20 + c * c21, c22],
        ])
    r = rot3_z(theta)
    return r @ cov @ np.swapaxes(r, -1, -2)


def weighted_mean_pose(means, covariances):
    """Covariance-weighted mean of poses (Mapper.cpp:1914-1958).

    means: (K, 3); covariances: (K, 3, 3). Position/heading channels are
    fused with weights inv(sum(inv(C_i)))·inv(C_i) applied to the full
    (x, y, h) vector; the heading is then overwritten by the *unweighted*
    circular mean, exactly as the reference does.
    """
    means = np.asarray(means)
    if len(means) == 1:
        # single contributor: the weighted mean is the mean itself (the
        # general path's inv(inv(C))·inv(C) roundtrip only adds rounding)
        # — the overwhelmingly common case on corridor scans (one
        # previous-scan link, no accepted chains), ~0.09 ms/scan saved
        x, y, h = means[0].tolist()
        return np.array([x, y, math.atan2(math.sin(h), math.cos(h))])
    covariances = np.asarray(covariances)
    inverses = np.linalg.inv(covariances)  # (K,3,3)
    sum_inv = np.sum(inverses, axis=0)
    inv_sum_inv = np.linalg.inv(sum_inv)
    weights = inv_sum_inv[None] @ inverses  # (K,3,3)
    fused = np.sum((weights @ means[..., None])[..., 0], axis=0)  # (3,)
    # heading via circular mean, then wrap componentwise sum like Pose2 +=
    tx = np.mean(np.cos(means[:, 2]))
    ty = np.mean(np.sin(means[:, 2]))
    return np.array([fused[0], fused[1], np.arctan2(ty, tx)])


def se2_points_world(pose, local_points):
    """Transform (B, 2) local points by pose -> world points (B, 2)."""
    r = rot2(pose[..., 2])
    return pose[..., None, :2] + (local_points @ np.swapaxes(r, -1, -2))
