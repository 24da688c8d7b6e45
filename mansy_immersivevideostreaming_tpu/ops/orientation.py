"""Head-orientation math: quaternion -> equirectangular coordinates.

Vectorized (numpy) rebuild of reference
``dataset_preprocess/head_orientation_lib.py``: quaternion rotation of a
reference view vector (``:19-30``), 3-D direction -> (theta, phi) viewing
angles (``:64-75``), angles -> equirect pixel (``:78-84``), and angular
distance (``:50-53``).  The reference loops one pyquaternion op per sample;
here whole traces are batched array math (and jnp-compatible).
"""

from __future__ import annotations

import numpy as np


def quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate vector(s) ``v`` [3] by unit-normalized quaternion(s)
    ``q`` [..., 4] in (w, x, y, z) order."""
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, xyz = q[..., :1], q[..., 1:]
    v = np.broadcast_to(np.asarray(v, np.float64), xyz.shape)
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def extract_direction_dataset1(q_xyzw: np.ndarray) -> np.ndarray:
    """Reference ``head_orientation_lib.py:19-23``: rotate [1,0,0] by
    Quaternion([q4, q3, q2, q1]) given input (q1..q4) = (x, y, z, w)."""
    q = np.stack([q_xyzw[..., 3], q_xyzw[..., 2], q_xyzw[..., 1],
                  q_xyzw[..., 0]], axis=-1)
    return quat_rotate(q, np.array([1.0, 0.0, 0.0]))


def extract_direction_dataset2(q_xyzw: np.ndarray) -> np.ndarray:
    """Reference ``head_orientation_lib.py:26-30``: rotate [0,0,1] by
    Quaternion([q4, -q3, q2, -q1])."""
    q = np.stack([q_xyzw[..., 3], -q_xyzw[..., 2], q_xyzw[..., 1],
                  -q_xyzw[..., 0]], axis=-1)
    return quat_rotate(q, np.array([0.0, 0.0, 1.0]))


def degree_distance(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Angular distance in degrees (reference ``:50-53``), batched over
    leading axes of v1.

    At the poles (``vector_to_ang`` passes the zero projection when the
    viewer looks exactly along [0,1,0]) the 0/0 normalize is degenerate in
    the reference too; the nan propagates identically — we only silence the
    RuntimeWarning."""
    with np.errstate(invalid="ignore", divide="ignore"):
        v1 = v1 / np.linalg.norm(v1, axis=-1, keepdims=True)
        v2 = v2 / np.linalg.norm(v2, axis=-1, keepdims=True)
        return np.degrees(
            np.arccos(np.clip(np.sum(v1 * v2, axis=-1), -1.0, 1.0)))


def vector_to_ang(v: np.ndarray):
    """Direction vector(s) [..., 3] -> (theta, phi) in degrees; exact port of
    reference ``head_orientation_lib.py:64-75``."""
    v = np.asarray(v, np.float64)
    alpha = degree_distance(v, np.array([0.0, 1.0, 0.0]))
    phi = 90.0 - alpha
    proj1 = np.zeros_like(v)
    proj1[..., 1] = np.cos(np.radians(alpha))
    proj2 = v - proj1
    theta = degree_distance(proj2, np.array([1.0, 0.0, 0.0]))
    sign = np.where(degree_distance(v, np.array([0.0, 0.0, -1.0])) > 90.0,
                    -1.0, 1.0)
    return sign * theta, phi


def ang_to_geoxy(theta: np.ndarray, phi: np.ndarray, h: float, w: float):
    """(theta, phi) degrees -> (x=height-axis, y=width-axis) pixels; exact
    port of reference ``head_orientation_lib.py:78-84``."""
    x = h / 2.0 - (h / 2.0) * np.sin(np.radians(phi))
    temp = np.where(theta < 0, 360.0 + theta, theta)
    temp = 360.0 - temp
    y = temp / 360.0 * w
    return x, y


def geoy_to_phi(geoy: np.ndarray, height: float) -> np.ndarray:
    """Equirect height-axis pixel -> phi degrees (reference ``:40-43``).

    Unused by the reference's own pipeline (only the inverse direction is
    called from ``hmdtrace.py:45-47``); kept batched for API completeness."""
    d = (height / 2.0 - np.asarray(geoy, np.float64)) / (height / 2.0)
    return np.sign(d) * np.degrees(np.arcsin(np.abs(d)))


def pixel_to_ang(x: np.ndarray, y: np.ndarray, geo_h: float, geo_w: float):
    """Equirect pixel -> (theta, phi) degrees; inverse of
    :func:`ang_to_geoxy` (reference ``head_orientation_lib.py:33-37``)."""
    phi = geoy_to_phi(x, geo_h)
    theta = -(np.asarray(y, np.float64) / geo_w) * 360.0
    theta = np.where(theta < -180.0, 360.0 + theta, theta)
    return theta, phi


def adjust_pixel_dataset1(hi: np.ndarray, wi: np.ndarray, h: float, w: float):
    """Height-axis flip with wrap (reference ``:95-99``)."""
    hi = h - np.asarray(hi)
    return np.where(hi < 0, hi + h, hi), np.asarray(wi)


def adjust_pixel_dataset2(hi: np.ndarray, wi: np.ndarray, h: float, w: float):
    """Width-axis flip with wrap (reference ``:88-92``)."""
    wi = w - np.asarray(wi)
    return np.asarray(hi), np.where(wi < 0, wi + w, wi)


def adjust_pixellist_dataset(dataset: int, pixel_list, h: float, w: float):
    """Reference ``head_orientation_lib.py:102-111`` (unused by its own
    pipeline): apply the per-dataset pixel flip over an (hi, wi) list.
    Returns an iterator of (hi, wi) pairs, as the reference does."""
    if len(pixel_list):
        hi, wi = np.asarray(pixel_list, np.float64).T
    else:
        hi = wi = np.zeros(0)
    if dataset == 1:
        hi, wi = adjust_pixel_dataset1(hi, wi, h, w)
    elif dataset == 2:
        hi, wi = adjust_pixel_dataset2(hi, wi, h, w)
    return zip(hi.tolist(), wi.tolist())
