"""Native C++ renderer: build, render a known plane, check depth/IR."""
import numpy as np
import pytest

from depthinspace_tpu.render import Camera, Shader, RenderInput, Renderer
from depthinspace_tpu.utils.geometry3d import xyplane, stack_mesh


def _plane_scene(z=3.0, half=10.0):
    v, f, n = xyplane(z=z)
    v = v.copy()
    v[:, :2] *= half
    c = np.full_like(v, 0.8)
    return v, f, c


def test_renders_fronto_parallel_plane():
    H, W = 64, 56
    f = 40.0
    v, faces, colors = _plane_scene(z=3.0)
    data = RenderInput(v, faces, colors)
    cam = Camera(f, f, W / 2, H / 2, np.eye(3), np.zeros(3), W, H)
    proj = Camera(f, f, W / 2, H / 2, np.eye(3),
                  np.array([-0.025 * 1, 0, 0]) * 0 + np.array([-0.025, 0, 0]),
                  W, H)
    pattern = np.zeros((H, W), np.float32)
    pattern[::4, ::4] = 1.0

    r = Renderer(cam, Shader(0.5, 1.5, 0.0, 10))
    r.mesh_proj(data, proj, pattern)

    depth = r.depth()
    assert depth.shape == (H, W)
    # fronto-parallel plane at z=3: every covered pixel has depth 3
    covered = depth > 0
    assert covered.mean() > 0.95
    np.testing.assert_allclose(depth[covered], 3.0, rtol=1e-4)

    amb = r.normal()
    assert amb[covered].min() > 0.1          # shaded, nonzero
    ir = r.color()
    assert ir.max() > 0.05                   # some dots projected
    # dots are sparse: most pixels dark
    assert (ir < 0.01).mean() > 0.5


def test_occlusion_and_shadow():
    H, W = 64, 56
    f = 40.0
    # background plane at z=4 + small square at z=2 in front
    v1, f1, c1 = _plane_scene(z=4.0)
    v2, f2, n2 = xyplane(z=2.0)
    v2 = v2.copy()
    v2[:, :2] *= 0.5
    c2 = np.full_like(v2, 0.5)
    verts, faces = stack_mesh([v1, v2], [f1, f2])
    colors = np.vstack([c1, c2])
    data = RenderInput(verts, faces, colors)

    cam = Camera(f, f, W / 2, H / 2, np.eye(3), np.zeros(3), W, H)
    proj = Camera(f, f, W / 2, H / 2, np.eye(3), np.array([-0.4, 0, 0]), W, H)
    pattern = np.ones((H, W), np.float32)

    r = Renderer(cam, Shader(0.5, 1.5, 0.0, 10))
    r.mesh_proj(data, proj, pattern)
    depth = r.depth()

    # center shows the near square, border shows the far plane
    assert abs(depth[H // 2, W // 2] - 2.0) < 1e-3
    assert abs(depth[2, 2] - 4.0) < 1e-3

    # projector shadow: with a strongly offset projector there must be a
    # region of the far plane right of the square receiving no pattern
    ir = r.color()
    near_mask = np.abs(depth - 2.0) < 1e-3
    far_mask = np.abs(depth - 4.0) < 1e-3
    assert ir[near_mask].mean() > 0.05
    shadow_zone = far_mask & (ir < 1e-6)
    assert shadow_zone.sum() > 10, "expected projector shadow on far plane"


def test_procedural_albedo_texture():
    """tex_amp > 0 adds scene-fixed variance to the ambient image; the
    texture moves rigidly with the scene under camera translation and
    depth is untouched (native/render.cpp albedo_texture)."""
    H, W, f = 64, 56, 40.0
    v, faces, colors = _plane_scene(z=3.0)
    data = RenderInput(v, faces, colors)
    proj = Camera(f, f, W / 2, H / 2, np.eye(3), np.array([-0.025, 0, 0]),
                  W, H)
    pattern = np.zeros((H, W), np.float32)
    pattern[::4, ::4] = 1.0
    tex = dict(tex_amp=0.5, tex_scale=3.0, tex_offset=(1.0, 2.0, 3.0))

    def render(cam_t, **shader_kw):
        cam = Camera(f, f, W / 2, H / 2, np.eye(3), cam_t, W, H)
        r = Renderer(cam, Shader(0.5, 1.5, 0.0, 10, **shader_kw))
        r.mesh_proj(data, proj, pattern)
        return r

    r_flat = render(np.zeros(3))
    r_tex = render(np.zeros(3), **tex)
    cov = r_flat.depth() > 0
    np.testing.assert_allclose(r_flat.depth(), r_tex.depth())
    # fronto-parallel constant-albedo plane is flat; texture adds variance
    assert r_flat.normal()[cov].std() < 1e-5
    assert r_tex.normal()[cov].std() > 0.01

    # camera shifted +0.1 at z=3 -> image content shifts fx*0.1/3 = -1.33 px
    # (scene-fixed texture); integer cross-correlation peak at -1
    r_tex2 = render(np.array([0.1, 0.0, 0.0]), **tex)
    a, b = r_tex.normal(), r_tex2.normal()
    prod = np.fft.ifft2(np.fft.fft2(a) * np.conj(np.fft.fft2(b))).real
    dy, dx = np.unravel_index(prod.argmax(), prod.shape)
    assert dy == 0 and dx in (W - 1, W - 2), (dy, dx)
