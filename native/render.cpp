// CPU structured-light mesh renderer for synthetic data generation.
//
// TPU-native replacement for the reference's external CUDA renderer
// ("cyrender" from the Connecting-the-Dots repo, used at reference
// data/create_syn_data.py:75,155,197-224): rasterizes a triangle mesh with
// a z-buffer and renders, per camera pose,
//   - depth map,
//   - "ambient" image: Lambertian shading with a headlight at the camera,
//     modulated by per-vertex albedo colors,
//   - IR image: the projector's dot pattern projectively textured onto the
//     scene (perspective-correct), shaded by the Lambert term w.r.t. the
//     projector direction with quadratic distance attenuation
//     1 / (1 + d_alpha*d + d_beta*d^2) and projector-visibility z-test
//     (shadow mapping), so occluded regions receive no pattern.
//
// Offline tool => clarity over micro-optimization; parallelized over image
// rows with a per-thread-free design (each triangle rasterized once,
// z-buffer updated serially per pixel; triangles are processed in sequence
// but the inner pixel loops vectorize well under -O3).
//
// C ABI for ctypes binding (see depthinspace_tpu/render/renderer.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 sub(const Vec3& a, const Vec3& b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
static inline float dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline Vec3 normalize(const Vec3& a) {
  float n = std::sqrt(dot(a, a));
  if (n < 1e-12f) return {0, 0, 0};
  return {a.x / n, a.y / n, a.z / n};
}

struct Camera {
  float fx, fy, px, py;
  float R[9];   // world -> camera rotation (row major), X_c = R X_w + t
  float t[3];
  int width, height;

  Vec3 to_cam(const Vec3& w) const {
    return {R[0] * w.x + R[1] * w.y + R[2] * w.z + t[0],
            R[3] * w.x + R[4] * w.y + R[5] * w.z + t[1],
            R[6] * w.x + R[7] * w.y + R[8] * w.z + t[2]};
  }
  // camera center in world coordinates: -R^T t
  Vec3 center() const {
    return {-(R[0] * t[0] + R[3] * t[1] + R[6] * t[2]),
            -(R[1] * t[0] + R[4] * t[1] + R[7] * t[2]),
            -(R[2] * t[0] + R[5] * t[1] + R[8] * t[2])};
  }
};

struct Shader {
  float ka, kd, ks, alpha;   // ambient, diffuse, specular, shininess
  float d_alpha, d_beta;     // projector distance attenuation
  // per-pixel procedural albedo texture (tex_amp = 0 disables): the
  // interpolated world position is fed through 2-octave 3D value noise and
  // modulates the albedo — high-frequency texture that moves rigidly WITH
  // the scene under camera motion, which is what makes image-based optical
  // flow well-posed on the ambient renders (the per-vertex colors alone
  // are too low-frequency: the background board has 17x17 vertices)
  float tex_amp, tex_scale;
  float tex_ox, tex_oy, tex_oz;
};

// ---- 3D value noise (hash lattice + smoothstep trilinear) --------------
static inline float hash3(int32_t x, int32_t y, int32_t z) {
  uint32_t h = (uint32_t)x * 374761393u + (uint32_t)y * 668265263u +
               (uint32_t)z * 2246822519u;
  h = (h ^ (h >> 13)) * 1274126177u;
  h ^= h >> 16;
  return (float)(h & 0xFFFFFFu) * (1.f / 16777216.f);   // [0, 1)
}

static inline float smoothstep01(float t) { return t * t * (3.f - 2.f * t); }

static float vnoise(float x, float y, float z) {
  float fx = std::floor(x), fy = std::floor(y), fz = std::floor(z);
  int32_t ix = (int32_t)fx, iy = (int32_t)fy, iz = (int32_t)fz;
  float tx = smoothstep01(x - fx), ty = smoothstep01(y - fy),
        tz = smoothstep01(z - fz);
  float v = 0.f;
  for (int dz = 0; dz <= 1; ++dz)
    for (int dy = 0; dy <= 1; ++dy)
      for (int dx = 0; dx <= 1; ++dx) {
        float w = (dx ? tx : 1.f - tx) * (dy ? ty : 1.f - ty) *
                  (dz ? tz : 1.f - tz);
        v += w * hash3(ix + dx, iy + dy, iz + dz);
      }
  return v;
}

static inline float albedo_texture(const Shader& sh, const Vec3& Xw) {
  if (sh.tex_amp <= 0.f) return 1.f;
  float sx = sh.tex_scale * Xw.x + sh.tex_ox;
  float sy = sh.tex_scale * Xw.y + sh.tex_oy;
  float sz = sh.tex_scale * Xw.z + sh.tex_oz;
  float n = 0.65f * vnoise(sx, sy, sz) +
            0.35f * vnoise(2.7f * sx + 17.31f, 2.7f * sy + 11.17f,
                           2.7f * sz + 5.73f);
  float t = 1.f + sh.tex_amp * (2.f * n - 1.f);
  return std::min(2.f, std::max(0.05f, t));
}

// Render a z-buffer + per-pixel interpolated attributes for one camera.
// Attributes: world position (3), normal (3), color (3) — perspective
// correct via 1/z interpolation.
struct GBuffer {
  int w, h;
  bool depth_only;
  std::vector<float> depth;       // z in camera frame; INF if empty
  std::vector<float> attr;        // 9 floats per pixel: Xw(3) n(3) albedo(3)

  GBuffer(int w_, int h_, bool depth_only_ = false)
      : w(w_), h(h_), depth_only(depth_only_) {
    depth.assign((size_t)w * h, std::numeric_limits<float>::infinity());
    if (!depth_only) attr.assign((size_t)w * h * 9, 0.f);
  }
};

void rasterize(const Camera& cam, const float* verts, int n_verts,
               const int32_t* faces, int n_faces, const float* colors,
               const float* normals, GBuffer* gb) {
  (void)n_verts;
  const int W = cam.width, H = cam.height;
  for (int f = 0; f < n_faces; ++f) {
    const int32_t i0 = faces[3 * f], i1 = faces[3 * f + 1],
                  i2 = faces[3 * f + 2];
    Vec3 w0 = {verts[3 * i0], verts[3 * i0 + 1], verts[3 * i0 + 2]};
    Vec3 w1 = {verts[3 * i1], verts[3 * i1 + 1], verts[3 * i1 + 2]};
    Vec3 w2 = {verts[3 * i2], verts[3 * i2 + 1], verts[3 * i2 + 2]};
    Vec3 c0 = cam.to_cam(w0), c1 = cam.to_cam(w1), c2 = cam.to_cam(w2);
    const float zeps = 1e-6f;
    if (c0.z < zeps || c1.z < zeps || c2.z < zeps) continue;  // no clipping

    // screen coordinates
    float x0 = cam.fx * c0.x / c0.z + cam.px, y0 = cam.fy * c0.y / c0.z + cam.py;
    float x1 = cam.fx * c1.x / c1.z + cam.px, y1 = cam.fy * c1.y / c1.z + cam.py;
    float x2 = cam.fx * c2.x / c2.z + cam.px, y2 = cam.fy * c2.y / c2.z + cam.py;

    float area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0);
    if (std::fabs(area) < 1e-12f) continue;
    float inv_area = 1.f / area;

    int xmin = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
    int xmax = std::min(W - 1, (int)std::ceil(std::max({x0, x1, x2})));
    int ymin = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
    int ymax = std::min(H - 1, (int)std::ceil(std::max({y0, y1, y2})));
    if (xmin > xmax || ymin > ymax) continue;

    float iz0 = 1.f / c0.z, iz1 = 1.f / c1.z, iz2 = 1.f / c2.z;

    for (int y = ymin; y <= ymax; ++y) {
      for (int x = xmin; x <= xmax; ++x) {
        float fx = (float)x, fy = (float)y;
        float l0 = ((x1 - fx) * (y2 - fy) - (x2 - fx) * (y1 - fy)) * inv_area;
        float l1 = ((x2 - fx) * (y0 - fy) - (x0 - fx) * (y2 - fy)) * inv_area;
        float l2 = 1.f - l0 - l1;
        if (l0 < 0.f || l1 < 0.f || l2 < 0.f) continue;
        // perspective-correct weights
        float izp = l0 * iz0 + l1 * iz1 + l2 * iz2;
        float z = 1.f / izp;
        size_t idx = (size_t)y * W + x;
        if (z >= gb->depth[idx]) continue;
        gb->depth[idx] = z;
        if (gb->depth_only) continue;
        float b0 = l0 * iz0 * z, b1 = l1 * iz1 * z, b2 = l2 * iz2 * z;
        float* a = &gb->attr[idx * 9];
        for (int k = 0; k < 3; ++k) {
          a[k] = b0 * verts[3 * i0 + k] + b1 * verts[3 * i1 + k] +
                 b2 * verts[3 * i2 + k];
          a[3 + k] = b0 * normals[3 * i0 + k] + b1 * normals[3 * i1 + k] +
                     b2 * normals[3 * i2 + k];
          a[6 + k] = b0 * colors[3 * i0 + k] + b1 * colors[3 * i1 + k] +
                     b2 * colors[3 * i2 + k];
        }
      }
    }
  }
}

static inline float sample_pattern(const float* pattern, int ph, int pw,
                                   float x, float y) {
  // bilinear, zero outside
  if (x < 0.f || y < 0.f || x > pw - 1.f || y > ph - 1.f) return 0.f;
  int x0 = (int)x, y0 = (int)y;
  int x1 = std::min(x0 + 1, pw - 1), y1 = std::min(y0 + 1, ph - 1);
  float ax = x - x0, ay = y - y0;
  float v00 = pattern[y0 * pw + x0], v01 = pattern[y0 * pw + x1];
  float v10 = pattern[y1 * pw + x0], v11 = pattern[y1 * pw + x1];
  return (1 - ay) * ((1 - ax) * v00 + ax * v01) +
         ay * ((1 - ax) * v10 + ax * v11);
}

}  // namespace

extern "C" {

// cam_params / proj_params layout: [fx, fy, px, py, R(9, row major), t(3)]
// shader: [ka, kd, ks, alpha, d_alpha, d_beta,
//          tex_amp, tex_scale, tex_ox, tex_oy, tex_oz]
// pattern: (pat_h, pat_w) single channel
// outputs (height x width): depth, ir, ambient — caller-allocated
void dis_render_mesh_proj(
    const float* verts, int n_verts, const int32_t* faces, int n_faces,
    const float* colors, const float* normals,
    const float* cam_params, const float* proj_params,
    const float* pattern, int pat_h, int pat_w,
    const float* shader_params, int height, int width,
    float* out_depth, float* out_ir, float* out_ambient) {
  Camera cam;
  cam.fx = cam_params[0]; cam.fy = cam_params[1];
  cam.px = cam_params[2]; cam.py = cam_params[3];
  std::memcpy(cam.R, cam_params + 4, 9 * sizeof(float));
  std::memcpy(cam.t, cam_params + 13, 3 * sizeof(float));
  cam.width = width; cam.height = height;

  Camera proj;
  proj.fx = proj_params[0]; proj.fy = proj_params[1];
  proj.px = proj_params[2]; proj.py = proj_params[3];
  std::memcpy(proj.R, proj_params + 4, 9 * sizeof(float));
  std::memcpy(proj.t, proj_params + 13, 3 * sizeof(float));
  proj.width = pat_w; proj.height = pat_h;

  Shader sh;
  sh.ka = shader_params[0]; sh.kd = shader_params[1];
  sh.ks = shader_params[2]; sh.alpha = shader_params[3];
  sh.d_alpha = shader_params[4]; sh.d_beta = shader_params[5];
  sh.tex_amp = shader_params[6]; sh.tex_scale = shader_params[7];
  sh.tex_ox = shader_params[8]; sh.tex_oy = shader_params[9];
  sh.tex_oz = shader_params[10];

  // main G-buffer from the camera
  GBuffer gb(width, height);
  rasterize(cam, verts, n_verts, faces, n_faces, colors, normals, &gb);

  // projector shadow map for visibility (depth only)
  GBuffer sm(pat_w, pat_h, /*depth_only=*/true);
  rasterize(proj, verts, n_verts, faces, n_faces, colors, normals, &sm);

  Vec3 cam_c = cam.center();
  Vec3 proj_c = proj.center();

  for (int y = 0; y < height; ++y) {
    for (int x = 0; x < width; ++x) {
      size_t idx = (size_t)y * width + x;
      float z = gb.depth[idx];
      if (!std::isfinite(z)) {
        out_depth[idx] = 0.f;
        out_ir[idx] = 0.f;
        out_ambient[idx] = 0.f;
        continue;
      }
      out_depth[idx] = z;
      const float* a = &gb.attr[idx * 9];
      Vec3 Xw = {a[0], a[1], a[2]};
      Vec3 n = normalize({a[3], a[4], a[5]});
      float albedo = (a[6] + a[7] + a[8]) / 3.f;
      albedo *= albedo_texture(sh, Xw);

      // ambient: headlight Lambert from the camera
      Vec3 to_cam_dir = normalize(sub(cam_c, Xw));
      float lamb_cam = std::fabs(dot(n, to_cam_dir));
      float amb = sh.ka * albedo + sh.kd * albedo * lamb_cam;
      if (sh.ks > 0.f) {
        float spec = std::pow(std::max(0.f, lamb_cam), sh.alpha);
        amb += sh.ks * spec;
      }
      out_ambient[idx] = std::min(1.f, amb);

      // IR: projector-pattern sample with shadow test + attenuation
      Vec3 Xp = proj.to_cam(Xw);
      float ir = 0.f;
      if (Xp.z > 1e-6f) {
        float ux = proj.fx * Xp.x / Xp.z + proj.px;
        float uy = proj.fy * Xp.y / Xp.z + proj.py;
        // shadow-map visibility: the first surface the projector sees
        int sx = (int)std::lround(ux), sy = (int)std::lround(uy);
        bool visible = true;
        if (sx >= 0 && sy >= 0 && sx < pat_w && sy < pat_h) {
          float sz = sm.depth[(size_t)sy * pat_w + sx];
          visible = Xp.z <= sz * 1.005f + 1e-3f;
        }
        if (visible) {
          float pat = sample_pattern(pattern, pat_h, pat_w, ux, uy);
          Vec3 to_proj = normalize(sub(proj_c, Xw));
          float lamb_p = std::fabs(dot(n, to_proj));
          float d = std::sqrt(dot(sub(Xw, proj_c), sub(Xw, proj_c)));
          float atten = 1.f / (1.f + sh.d_alpha * d + sh.d_beta * d * d);
          ir = std::min(1.f, albedo * pat * lamb_p * atten *
                                 (sh.ka + sh.kd));
        }
      }
      out_ir[idx] = ir;
    }
  }
}

}  // extern "C"
