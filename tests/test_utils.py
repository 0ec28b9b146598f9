"""Host-side utils: geometry3d, io3d, metrics, colormaps."""
import numpy as np
import pytest

from depthinspace_tpu.utils import geometry3d as g3
from depthinspace_tpu.utils import io3d, cmap
from depthinspace_tpu.utils import metric as M


def test_quat_rotm_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        q = g3.quat_random(rng)
        R = g3.rotm_from_quat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.isclose(np.linalg.det(R), 1.0)
        q2 = g3.quat_from_rotm(R)
        # q and -q are the same rotation
        assert np.allclose(q, q2, atol=1e-8) or np.allclose(q, -q2, atol=1e-8)


def test_so3_log_exp_roundtrip():
    rng = np.random.RandomState(1)
    w = rng.randn(3) * 0.7
    R = g3.so3_exp(w)
    assert np.allclose(g3.so3_log(R), w, atol=1e-8)


def test_rotation_distances():
    R = g3.rotm_from_axisangle([0, 0, 1], 0.3)
    d = g3.rotm_distance_geodesic(R[None], np.eye(3)[None])
    assert np.isclose(d[0], 0.3, atol=1e-8)
    d0 = g3.rotm_distance_identity(R[None], R[None])
    assert np.isclose(d0[0], 0.0, atol=1e-8)


def test_quat_slerp_endpoints():
    q0 = g3.quat_random(np.random.RandomState(2))
    q1 = g3.quat_random(np.random.RandomState(3))
    assert np.allclose(g3.quat_slerp(q0, q1, 0.0), g3.quat_normalize(q0),
                       atol=1e-8)


def test_mesh_helpers():
    v, f, n = g3.xyplane(z=2.0)
    assert v.shape == (4, 3) and f.shape == (2, 3)
    areas = g3.mesh_triangle_areas(v, f)
    assert np.isclose(areas.sum(), 4.0)  # 2x2 quad
    verts, faces = g3.stack_mesh([v, v + 5], [f, f])
    assert verts.shape == (8, 3)
    assert faces[2:].min() == 4


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    verts = rng.randn(10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    colors = rng.randint(0, 255, (10, 3)).astype(np.uint8)
    for binary in (True, False):
        p = tmp_path / f"m_{binary}.ply"
        io3d.write_ply(p, verts, faces, colors, binary=binary)
        v2, f2, c2 = io3d.read_ply(p)
        np.testing.assert_allclose(v2, verts, rtol=1e-6)
        np.testing.assert_array_equal(f2, faces)
        np.testing.assert_array_equal(c2, colors)


def test_obj_reading(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2/1 4/2 3/3\n")
    v, f, _, n = io3d.read_obj(p)
    assert v.shape == (4, 3)
    assert f.shape == (2, 3)
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0)


def test_distance_metric_stats():
    m = M.DistanceMetric(vec_length=1)
    m.add(np.array([[1.0], [2.0]]), np.array([[0.0], [0.0]]))
    m.add(np.array([[3.0]]), np.array([[0.0]]))
    s = m.get()
    assert np.isclose(s["dist2_mean"], 2.0)
    assert np.isclose(s["dist2_median"], 2.0)
    assert np.isclose(s["dist2_max"], 3.0)


def test_outlier_fraction_metric():
    m = M.OutlierFractionMetric(thresholds=[0.5, 2.5], vec_length=1)
    m.add(np.array([[1.0], [2.0], [3.0]]), np.zeros((3, 1)))
    s = m.get()
    assert np.isclose(s["of0.5"], 1.0)
    assert np.isclose(s["of2.5"], 1 / 3)


def test_binary_accuracy_metric():
    m = M.BinaryAccuracyMetric()
    rng = np.random.RandomState(0)
    ta = rng.randint(0, 2, 1000).astype(float)
    es = np.clip(ta * 0.8 + rng.rand(1000) * 0.3, 0, 1)  # informative scores
    m.add(es, ta)
    s = m.get()
    assert s["auc"] > 0.9


def test_functional_metrics():
    es = np.array([1.0, 2.0, 3.0])
    ta = np.array([1.0, 1.0, 1.0])
    assert np.isclose(M.mae(es, ta), 1.0)
    assert np.isclose(M.rmse(es, ta), np.sqrt(5 / 3))
    assert np.isclose(M.outlier_fraction(es, ta, threshold=1.5), 1 / 3)


def test_cmaps():
    err = np.abs(np.random.RandomState(0).randn(8, 9))
    out = cmap.color_error_image(err)
    assert out.shape == (8, 9, 3)
    depth = np.random.RandomState(1).rand(8, 9) * 10
    out = cmap.color_depth_map(depth)
    assert out.shape == (8, 9, 3) and out.dtype == np.uint8


def test_flow_oor_fraction():
    from depthinspace_tpu.train.worker import flow_oor_fraction

    tl, bs, H, W = 2, 1, 16, 40
    flow = np.zeros((tl, tl, bs, H, W, 2), np.float32)
    # one in-image vector beyond the window, one beyond but pointing
    # off-image (must NOT count), diagonal large values (excluded)
    flow[0, 1, 0, 8, 10] = (12.0, 0.0)       # in-image, |u| > 8
    flow[0, 1, 0, 8, 11] = (50.0, 0.0)       # lands off-image -> ignored
    flow[1, 0, 0, 3, 3] = (-2.0, 1.0)        # in-range
    flow[0, 0, :] = 99.0                      # diagonal, excluded
    oor, n = flow_oor_fraction(flow, max_shift=8)
    assert oor == 1.0
    # in-image count: all finite targets of the two off-diagonal blocks
    # minus the single off-image vector
    assert n == 2 * bs * H * W - 1

    # int16 wire encoding decodes identically
    wire = np.clip(np.rint(flow * 256.0), -32768, 32767).astype(np.int16)
    oor_w, n_w = flow_oor_fraction(wire, max_shift=8)
    assert (oor_w, n_w) == (oor, n)


def test_streaming_eval_metric_matches_host_path():
    """StreamingEvalMetric (device, histogram at wire resolution) agrees
    with the exact host DistanceMetric/OutlierFractionMetric path on wire-
    quantized inputs: mean/std/min/max/of{t} exactly, quantiles to 1/256."""
    import jax.numpy as jnp
    from depthinspace_tpu.utils.metric import StreamingEvalMetric

    rng = np.random.RandomState(0)
    tl, bs, H, W = 4, 4, 32, 24
    met_d = StreamingEvalMetric()
    met_h = M.MultipleMetric(
        M.DistanceMetric(vec_length=1),
        M.OutlierFractionMetric(vec_length=1, thresholds=[0.1, 0.5, 1, 2, 5]))
    for i in range(3):
        es_u16 = rng.randint(0, 40 * 256, (tl, bs, H, W)).astype(np.uint16)
        gt = ((rng.rand(tl, bs, H, W).astype(np.float32) * 40)
              * (rng.rand(tl, bs, H, W) > 0.2))
        gt_u16 = np.clip(gt * 256 + 0.5, 0, 65535).astype(np.uint16)
        n_valid = bs if i < 2 else 3       # padded eval tail
        met_d.add(jnp.asarray(es_u16), jnp.asarray(gt_u16), n_valid)
        es = es_u16[:, :n_valid].astype(np.float32) / 256.0
        g = gt_u16[:, :n_valid].astype(np.float32) / 256.0
        met_h.add((es * (g > 0)).reshape(-1, 1), g.reshape(-1, 1))
    d, h = met_d.get(), met_h.get()
    assert set(d) == set(h)
    for k in h:
        tol = 1 / 256 + 1e-9 if ("median" in k or "_q" in k) else 1e-5
        assert abs(d[k] - h[k]) <= tol, (k, d[k], h[k])

    # f32 (unencoded) gt path quantizes like the wire and stays consistent
    met_f = StreamingEvalMetric()
    met_f.add(jnp.asarray(es_u16), jnp.asarray(gt), bs)
    assert abs(met_f.get()["of1"]
               - float((np.abs(es_u16.astype(np.float32) / 256 * (gt_u16 > 0)
                               - gt_u16.astype(np.float32) / 256) > 1).mean())) < 1e-5


def test_euler_lookat_orthonormal():
    rng = np.random.RandomState(3)
    for _ in range(20):
        xyz = rng.uniform(-1.2, 1.2, 3)
        R = g3.rotm_from_xyz(xyz)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.isclose(np.linalg.det(R), 1.0)
        # roundtrip away from gimbal lock
        back = g3.xyz_from_rotm(R)
        np.testing.assert_allclose(g3.rotm_from_xyz(back), R, atol=1e-10)
    d = rng.randn(3)
    L = g3.rotm_from_lookat(d)
    assert np.allclose(L @ L.T, np.eye(3), atol=1e-10)
    # +z row of the lookat frame aligns with the direction
    np.testing.assert_allclose(L[2], d / np.linalg.norm(d), atol=1e-10)
    # nearest_orthogonal recovers a perturbed rotation
    Rn = g3.nearest_orthogonal_matrix(R + rng.randn(3, 3) * 1e-4)
    assert np.allclose(Rn @ Rn.T, np.eye(3), atol=1e-10)


def test_axisangle_roundtrips():
    rng = np.random.RandomState(4)
    q = g3.quat_random(rng=rng)
    aa = g3.axisangle_from_quat(q)
    R = g3.rotm_from_quat(q)
    np.testing.assert_allclose(g3.axisangle_from_rotm(R), aa, atol=1e-8)
    x = rng.randn(5, 3)
    np.testing.assert_allclose(g3.axisangle_apply(aa, x), x @ R.T,
                               atol=1e-8)


def test_spherical_roundtrip_and_random():
    rng = np.random.RandomState(5)
    x = rng.randn(50, 3)
    np.testing.assert_allclose(
        g3.spherical_to_cart(g3.cart_to_spherical(x)), x, atol=1e-10)
    pts = g3.spherical_random(r=2.0, n=500, rng=rng)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 2.0, atol=1e-9)


def test_projection_helpers():
    rng = np.random.RandomState(6)
    K = np.array([[400.0, 0, 200], [0, 410.0, 150], [0, 0, 1]])
    R = g3.rotm_from_quat(g3.quat_random(rng=rng))
    t = rng.randn(3)
    P = g3.compose_projection_matrix(K, R, t)
    K2, R2, t2 = g3.decompose_projection_matrix(P)
    np.testing.assert_allclose(K2, K, atol=1e-8)
    np.testing.assert_allclose(R2, R, atol=1e-8)
    np.testing.assert_allclose(t2, t, atol=1e-8)
    C = g3.translation_to_cameracenter(R, t)
    np.testing.assert_allclose(g3.cameracenter_to_translation(R, C), t,
                               atol=1e-10)
    # relative motion consistency: projecting through (R01, t01) equals
    # going world->cam1 directly
    R1 = g3.rotm_from_quat(g3.quat_random(rng=rng))
    t1 = rng.randn(3)
    R01, t01 = g3.relative_motion(R, t, R1, t1)
    X = rng.randn(10, 3)
    cam0 = X @ R.T + t
    np.testing.assert_allclose(cam0 @ R01.T + t01, X @ R1.T + t1,
                               atol=1e-9)
    uv = g3.project_xyz(X + [0, 0, 10], K, R * 0 + np.eye(3), [0, 0, 0])
    assert uv.shape == (10, 2)
    h = g3.to_homogeneous(X)
    np.testing.assert_allclose(g3.from_homogeneous(h), X)


def test_plane_fit():
    rng = np.random.RandomState(7)
    n = np.array([1.0, 2.0, -0.5]); n /= np.linalg.norm(n)
    d = 0.7
    basis = np.linalg.svd(n[None])[2][1:]
    pts = rng.randn(200, 2) @ basis - d * n
    plane = g3.fit_plane(pts)
    dist = g3.point_plane_distance(pts, plane)
    assert np.abs(dist).max() < 1e-9
    assert abs(abs(plane[:3] @ n) - 1.0) < 1e-9


def test_primitive_meshes_and_subdivision():
    for maker, nv in ((g3.tetrahedron, 4), (g3.cube, 8),
                      (g3.octahedron, 6), (g3.icosahedron, 12)):
        v, f = maker()
        assert v.shape == (nv, 3) and f.min() == 0 and f.max() == nv - 1
        areas = g3.mesh_triangle_areas(v, f)
        assert (areas > 0).all()
    v, f = g3.icosahedron()
    v2, f2 = g3.subdivide_mesh(v, f, n=1)
    assert len(f2) == 4 * len(f)
    # subdivision conserves total area for flat faces
    np.testing.assert_allclose(g3.mesh_triangle_areas(v2, f2).sum(),
                               g3.mesh_triangle_areas(v, f).sum(),
                               rtol=1e-6)
    iv, if_, _ = g3.mesh_independent_verts(v, f, np.ones_like(v))
    assert len(iv) == 3 * len(f) and len(if_) == len(f)
    nv_ = g3.normalize_mesh(v * 3 + 5)
    assert np.isclose((nv_.max(0) - nv_.min(0)).max(), 1.0, atol=1e-6)
    # winding-order fix makes all face normals agree with vertex normals
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    f_bad = f.copy(); f_bad[::2] = f_bad[::2][:, [0, 2, 1]]
    f_fix = g3.mesh_adjust_winding_order(v, f_bad, vn)
    e1 = v[f_fix[:, 1]] - v[f_fix[:, 0]]
    e2 = v[f_fix[:, 2]] - v[f_fix[:, 0]]
    fn = np.cross(e1, e2)
    ref = vn[f_fix].mean(axis=1)
    assert (np.sum(fn * ref, axis=1) > 0).all()
    sv, sf = g3.pcl_to_shapecl(np.zeros((3, 3)), shape="cube", width=0.5)
    assert sv.shape == (24, 3) and sf.shape == (36, 3)
