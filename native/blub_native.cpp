// blub-tpu native runtime components.
//
// The reference implements its whole host runtime in Rust; here the TPU
// compute path is JAX/XLA and the host-side hot paths live in this C++
// module (loaded via ctypes, built by blub_tpu/ops/native.py):
//   - signed-distance-field baking for solid meshes (scene load; the
//     numpy fallback is O(points x tris) with large constants),
//   - PNG encoding for the screenshot/recording pipeline
//     (screenshot_capture.rs encodes on worker threads in the reference),
//   - z-buffered particle sphere splatting for the offline renderer.
//
// Plain C ABI; all buffers are caller-allocated numpy arrays.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct V3 {
  float x, y, z;
};

inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// squared distance point-segment
inline float seg_d2(V3 p, V3 a, V3 d) {
  float dd = dot(d, d);
  float t = dd > 1e-20f ? clampf(dot(sub(p, a), d) / dd, 0.f, 1.f) : 0.f;
  V3 c = {a.x + t * d.x, a.y + t * d.y, a.z + t * d.z};
  V3 r = sub(p, c);
  return dot(r, r);
}

void sdf_worker(const float* verts, const int32_t* tris, int64_t n_tris,
                const float* points, int64_t begin, int64_t end, float* out) {
  // tie-break nudges matching the Python fallback (core/models.py)
  const float EPS_Y = 3.53163e-5f, EPS_Z = 7.07271e-5f;
  for (int64_t i = begin; i < end; ++i) {
    V3 p = {points[3 * i], points[3 * i + 1], points[3 * i + 2]};
    V3 q = {p.x, p.y + EPS_Y, p.z + EPS_Z};
    float best = 1e30f;
    int64_t crossings = 0;
    for (int64_t t = 0; t < n_tris; ++t) {
      V3 a = {verts[3 * tris[3 * t]], verts[3 * tris[3 * t] + 1], verts[3 * tris[3 * t] + 2]};
      V3 b = {verts[3 * tris[3 * t + 1]], verts[3 * tris[3 * t + 1] + 1], verts[3 * tris[3 * t + 1] + 2]};
      V3 c = {verts[3 * tris[3 * t + 2]], verts[3 * tris[3 * t + 2] + 1], verts[3 * tris[3 * t + 2] + 2]};
      V3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
      // face region
      float d1 = dot(ab, ap), d2 = dot(ac, ap);
      V3 bp = sub(p, b);
      float d3 = dot(ab, bp), d4 = dot(ac, bp);
      V3 cp = sub(p, c);
      float d5 = dot(ab, cp), d6 = dot(ac, cp);
      float va = d3 * d6 - d5 * d4, vb = d5 * d2 - d1 * d6, vc = d1 * d4 - d3 * d2;
      float denom = va + vb + vc;
      float s = denom >= 0.f ? 1.f : -1.f;
      float d2min;
      if (va * s >= 0.f && vb * s >= 0.f && vc * s >= 0.f) {
        V3 n = cross(ab, ac);
        float n2 = std::max(dot(n, n), 1e-20f);
        float pn = dot(ap, n);
        d2min = pn * pn / n2;
      } else {
        d2min = 1e30f;
      }
      d2min = std::min(d2min, seg_d2(p, a, ab));
      d2min = std::min(d2min, seg_d2(p, a, ac));
      d2min = std::min(d2min, seg_d2(p, b, sub(c, b)));
      best = std::min(best, d2min);

      // +x ray parity in the yz plane (nudged origin)
      float e1 = (b.y - a.y) * (q.z - a.z) - (b.z - a.z) * (q.y - a.y);
      float e2 = (c.y - b.y) * (q.z - b.z) - (c.z - b.z) * (q.y - b.y);
      float e3 = (a.y - c.y) * (q.z - c.z) - (a.z - c.z) * (q.y - c.y);
      bool neg = e1 < 0 && e2 < 0 && e3 < 0;
      bool pos = e1 > 0 && e2 > 0 && e3 > 0;
      if (neg || pos) {
        float area = e1 + e2 + e3;
        if (std::fabs(area) < 1e-20f) area = 1e-20f;
        float xhit = (e2 * a.x + e3 * b.x + e1 * c.x) / area;
        if (xhit > q.x) ++crossings;
      }
    }
    float d = std::sqrt(best);
    out[i] = (crossings & 1) ? -d : d;
  }
}

}  // namespace

extern "C" {

// Signed distance from points to a triangle mesh. Multithreaded.
void blub_mesh_sdf(const float* verts, int64_t n_verts, const int32_t* tris,
                   int64_t n_tris, const float* points, int64_t n_points,
                   float* out) {
  (void)n_verts;
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::max(1u, hw ? hw : 4u);
  n_threads = std::min<int64_t>(n_threads, std::max<int64_t>(n_points / 4096, 1));
  if (n_threads <= 1) {
    sdf_worker(verts, tris, n_tris, points, 0, n_points, out);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n_points + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t b = t * chunk, e = std::min(n_points, b + chunk);
    if (b >= e) break;
    pool.emplace_back(sdf_worker, verts, tris, n_tris, points, b, e, out);
  }
  for (auto& th : pool) th.join();
}

// PNG encode rgb8 [h, w, 3]. Returns bytes written, or -1 if out_cap too
// small (call again with a bigger buffer), or -2 on zlib error.
int64_t blub_encode_png(const uint8_t* rgb, int64_t h, int64_t w, uint8_t* out,
                        int64_t out_cap) {
  auto put32 = [](uint8_t* p, uint32_t v) {
    p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
  };
  // filter-0 scanlines
  std::vector<uint8_t> raw((size_t)h * (w * 3 + 1));
  for (int64_t y = 0; y < h; ++y) {
    raw[(size_t)y * (w * 3 + 1)] = 0;
    std::memcpy(&raw[(size_t)y * (w * 3 + 1) + 1], rgb + (size_t)y * w * 3, (size_t)w * 3);
  }
  uLongf comp_cap = compressBound((uLong)raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), (uLong)raw.size(), 6) != Z_OK)
    return -2;

  int64_t total = 8 + (12 + 13) + (12 + (int64_t)comp_cap) + 12;
  if (total > out_cap) return -1;

  uint8_t* p = out;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  std::memcpy(p, sig, 8); p += 8;

  auto chunk = [&](const char* tag, const uint8_t* data, uint32_t len) {
    put32(p, len); p += 4;
    std::memcpy(p, tag, 4);
    if (len) std::memcpy(p + 4, data, len);
    uint32_t crc = crc32(0, p, len + 4);
    put32(p + 4 + len, crc);
    p += 8 + len;
  };
  uint8_t ihdr[13];
  put32(ihdr, (uint32_t)w); put32(ihdr + 4, (uint32_t)h);
  ihdr[8] = 8; ihdr[9] = 2; ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  chunk("IHDR", ihdr, 13);
  chunk("IDAT", comp.data(), (uint32_t)comp_cap);
  chunk("IEND", nullptr, 0);
  return p - out;
}

// Z-buffered sphere splatting: writes depth (f32, init to +inf by caller) and
// winner index (i32, init to -1) buffers of size h*w.
void blub_splat(const float* px, const float* py, const float* z,
                const float* r_px, const uint8_t* valid, int64_t n,
                int64_t w, int64_t h, float focal, float* depth,
                int32_t* winner) {
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    float r = r_px[i];
    int64_t cx = (int64_t)std::lround(px[i]);
    int64_t cy = (int64_t)std::lround(py[i]);
    int64_t ir = (int64_t)std::ceil(r);
    float r2 = r * r;
    for (int64_t dy = -ir; dy <= ir; ++dy) {
      int64_t y = cy + dy;
      if (y < 0 || y >= h) continue;
      for (int64_t dx = -ir; dx <= ir; ++dx) {
        int64_t x = cx + dx;
        float d2 = (float)(dx * dx + dy * dy);
        if (x < 0 || x >= w || d2 > r2) continue;
        float zoff = std::sqrt(std::max(r2 - d2, 0.f)) * z[i] / focal;
        float zz = z[i] - zoff;
        int64_t lin = y * w + x;
        if (zz < depth[lin]) {
          depth[lin] = zz;
          winner[lin] = (int32_t)i;
        }
      }
    }
  }
}

int32_t blub_native_abi_version() { return 1; }

}  // extern "C"
