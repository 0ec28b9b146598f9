"""Host-side 3D geometry library (numpy): rotations, quaternions, SE3,
primitive meshes.

Covers the slice of the reference's ``co/geometry.py`` that the pipeline
and metrics actually use (SURVEY.md: ``xyplane``, ``rotm_from_quat``,
``quat_random``, ``stack_mesh`` drive data generation at reference
data/create_syn_data.py:109-144; the distance functions back the rotation
metrics in co/metric.py:172-209) plus the standard conversion set for API
parity. Conventions: quaternions are (w, x, y, z); rotation matrices act on
column vectors.
"""

from __future__ import annotations

import numpy as np


# ----------------------------------------------------------- quaternions
def quat_identity(n: int = 1) -> np.ndarray:
    q = np.zeros((n, 4))
    q[:, 0] = 1
    return q.squeeze()


def quat_random(rng=None, n: int = 1) -> np.ndarray:
    """Uniform random unit quaternion(s) (Shoemake's method)."""
    rng = rng or np.random
    u1, u2, u3 = rng.uniform(0, 1, (3, n))
    q = np.stack([
        np.sqrt(1 - u1) * np.sin(2 * np.pi * u2),
        np.sqrt(1 - u1) * np.cos(2 * np.pi * u2),
        np.sqrt(u1) * np.sin(2 * np.pi * u3),
        np.sqrt(u1) * np.cos(2 * np.pi * u3),
    ], axis=1)
    return q[0] if n == 1 else q


def quat_normalize(q):
    q = np.asarray(q, dtype=np.float64)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q):
    q = np.asarray(q)
    out = q.copy()
    out[..., 1:] *= -1
    return out


def quat_mul(a, b):
    a, b = np.asarray(a), np.asarray(b)
    w1, x1, y1, z1 = np.moveaxis(a, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(b, -1, 0)
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_slerp(q0, q1, t):
    q0, q1 = quat_normalize(q0), quat_normalize(q1)
    d = float(np.dot(q0, q1))
    if d < 0:
        q1, d = -q1, -d
    if d > 0.9995:
        return quat_normalize(q0 + t * (q1 - q0))
    theta = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - t) * theta) * q0 + np.sin(t * theta) * q1) / np.sin(theta)


def rotm_from_quat(q) -> np.ndarray:
    """Unit quaternion (w,x,y,z) -> 3x3 rotation matrix."""
    w, x, y, z = quat_normalize(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_from_rotm(R) -> np.ndarray:
    """3x3 rotation matrix -> unit quaternion (w,x,y,z), Shepperd's method."""
    R = np.asarray(R, dtype=np.float64)
    t = np.trace(R)
    if t > 0:
        s = 0.5 / np.sqrt(t + 1.0)
        return quat_normalize(np.array([
            0.25 / s, (R[2, 1] - R[1, 2]) * s,
            (R[0, 2] - R[2, 0]) * s, (R[1, 0] - R[0, 1]) * s]))
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = 2.0 * np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 0.0))
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return quat_normalize(q)


# ------------------------------------------------------- rotations (misc)
def rotm_from_axisangle(axis, angle) -> np.ndarray:
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = skew(axis)
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def skew(v) -> np.ndarray:
    x, y, z = v
    return np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], dtype=np.float64)


def rotm_from_euler_xyz(rx, ry, rz) -> np.ndarray:
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def so3_log(R) -> np.ndarray:
    """Rotation matrix -> axis-angle vector (log map)."""
    R = np.asarray(R, np.float64)
    cos_t = np.clip((np.trace(R) - 1) / 2, -1, 1)
    theta = np.arccos(cos_t)
    if theta < 1e-10:
        return np.zeros(3)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return theta / (2 * np.sin(theta)) * w


def so3_exp(w) -> np.ndarray:
    theta = np.linalg.norm(w)
    if theta < 1e-10:
        return np.eye(3)
    return rotm_from_axisangle(w / theta, theta)


def se3_exp(xi) -> np.ndarray:
    """Twist (v, w) -> 4x4 transform."""
    v, w = np.asarray(xi[:3]), np.asarray(xi[3:])
    theta = np.linalg.norm(w)
    R = so3_exp(w)
    if theta < 1e-10:
        V = np.eye(3)
    else:
        K = skew(w / theta)
        V = (np.eye(3) + (1 - np.cos(theta)) / theta * K
             + (theta - np.sin(theta)) / theta * (K @ K))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T


def se3_log(T) -> np.ndarray:
    R, t = T[:3, :3], T[:3, 3]
    w = so3_log(R)
    theta = np.linalg.norm(w)
    if theta < 1e-10:
        V_inv = np.eye(3)
    else:
        K = skew(w / theta)
        V = (np.eye(3) + (1 - np.cos(theta)) / theta * K
             + (theta - np.sin(theta)) / theta * (K @ K))
        V_inv = np.linalg.inv(V)
    return np.concatenate([V_inv @ t, w])


# ---------------------------------------------------- rotation distances
def rotm_distance_identity(es, ta) -> np.ndarray:
    """||I - R_es R_ta^T||_F per pair; es, ta: (N, 3, 3)."""
    rel = np.einsum("nij,nkj->nik", es, ta)
    return np.linalg.norm(np.eye(3)[None] - rel, axis=(1, 2))


def rotm_distance_geodesic(es, ta) -> np.ndarray:
    """Geodesic angle between rotations; es, ta: (N, 3, 3)."""
    rel = np.einsum("nij,nkj->nik", es, ta)
    tr = np.trace(rel, axis1=1, axis2=2)
    return np.arccos(np.clip((tr - 1) / 2, -1, 1))


# alias matching the reference metric's name (co/metric.py:186)
rotm_distance_geodesic_unit_sphere = rotm_distance_geodesic


def quat_distance_angle(es, ta) -> np.ndarray:
    d = np.abs(np.sum(quat_normalize(es) * quat_normalize(ta), axis=-1))
    return 2 * np.arccos(np.clip(d, -1, 1))


def quat_distance_mineucl(es, ta) -> np.ndarray:
    return np.minimum(np.linalg.norm(es - ta, axis=-1),
                      np.linalg.norm(es + ta, axis=-1))


def quat_distance_normdiff(es, ta) -> np.ndarray:
    return 1 - np.abs(np.sum(quat_normalize(es) * quat_normalize(ta), axis=-1))


# ----------------------------------------------------------------- meshes
def xyplane(z: float = 0.0, interleaved: bool = False):
    """Unit xy quad at depth z: (verts, faces, normals).

    interleaved=True returns two independent triangles (6 verts, shared
    edge split by eps) like the reference co/geometry.py:662-674 — used
    for per-triangle attribute rendering.
    """
    if interleaved:
        eps = 1e-6
        v = np.array([[-1, -1, z], [-1, 1, z], [1, 1, z],
                      [1 - eps, 1, z], [1 - eps, -1, z], [-1 - eps, -1, z]],
                     np.float32)
        f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    else:
        v = np.array([[-1, -1, z], [-1, 1, z], [1, 1, z], [1, -1, z]],
                     np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = np.tile(np.array([[0, 0, -1]], np.float32), (len(v), 1))
    return v, f, n


def stack_mesh(verts_list, faces_list):
    """Concatenate meshes with face-index offsets."""
    verts, faces = [], []
    off = 0
    for v, f in zip(verts_list, faces_list):
        verts.append(np.asarray(v, np.float32))
        faces.append(np.asarray(f, np.int64) + off)
        off += len(v)
    return np.vstack(verts), np.vstack(faces).astype(np.int32)


def mesh_triangle_areas(verts, faces) -> np.ndarray:
    a = verts[faces[:, 1]] - verts[faces[:, 0]]
    b = verts[faces[:, 2]] - verts[faces[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=1)


def mesh_vertex_normals(verts, faces) -> np.ndarray:
    """Area-weighted per-vertex normals."""
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(norm, 1e-12)
