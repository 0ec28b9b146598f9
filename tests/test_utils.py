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
