// Point-to-triangle-mesh signed distance with a median-split AABB BVH and
// angle-weighted pseudonormal sign (Baerentzen & Aanaes 2005) — the native
// host-side replacement for libigl's `signed_distance` used by the offline
// BEHAVE contact-label generator (`interdiff/data/prepare_behave.py:42`).
//
// The reference leans on igl (C++) through python bindings; this is our own
// implementation, exposed through a C ABI consumed via ctypes
// (interdiff_tpu/utils/native.py).  Build: `make -C native` (g++ -O3).
//
// API (all float32 / int32, row-major):
//   void* sd_build(const float* verts, int V, const int* faces, int F);
//   void  sd_query(void* h, const float* pts, int N,
//                  float* out_signed_dist, int* out_face, float* out_cp);
//   void  sd_free(void* h);

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <utility>
#include <vector>

namespace {

struct V3 {
  float x = 0, y = 0, z = 0;
};

inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 operator*(float s, V3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float norm(V3 a) { return std::sqrt(dot(a, a)); }
inline V3 normalize(V3 a) {
  float n = norm(a);
  return n > 1e-20f ? (1.0f / n) * a : V3{0, 0, 0};
}

// Ericson, "Real-Time Collision Detection" 5.1.5.
V3 closest_point_on_triangle(V3 p, V3 a, V3 b, V3 c, int* region) {
  V3 ab = b - a, ac = c - a, ap = p - a;
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) { *region = 0; return a; }  // vertex A

  V3 bp = p - b;
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) { *region = 1; return b; }  // vertex B

  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {  // edge AB
    *region = 3;
    float v = d1 / (d1 - d3);
    return a + v * ab;
  }

  V3 cp = p - c;
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) { *region = 2; return c; }  // vertex C

  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {  // edge AC
    *region = 5;
    float w = d2 / (d2 - d6);
    return a + w * ac;
  }

  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {  // edge BC
    *region = 4;
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    return b + w * (c - b);
  }

  *region = 6;  // interior
  float denom = 1.0f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  return a + v * ab + w * ac;
}

struct BVHNode {
  V3 lo, hi;
  int left = -1, right = -1;  // children, or
  int start = 0, count = 0;   // leaf triangle range
};

struct SignedDistanceMesh {
  std::vector<V3> verts;
  std::vector<int> faces;          // 3 * F
  std::vector<V3> face_normals;    // F
  std::vector<V3> vertex_normals;  // V (angle-weighted)
  std::map<std::pair<int, int>, V3> edge_normals;
  std::vector<BVHNode> nodes;
  std::vector<int> order;  // triangle permutation for leaves
  std::vector<V3> centroids;

  int build(int start, int count) {
    BVHNode node;
    node.lo = {1e30f, 1e30f, 1e30f};
    node.hi = {-1e30f, -1e30f, -1e30f};
    for (int i = start; i < start + count; ++i) {
      int t = order[i];
      for (int k = 0; k < 3; ++k) {
        V3 v = verts[faces[3 * t + k]];
        node.lo.x = std::min(node.lo.x, v.x);
        node.lo.y = std::min(node.lo.y, v.y);
        node.lo.z = std::min(node.lo.z, v.z);
        node.hi.x = std::max(node.hi.x, v.x);
        node.hi.y = std::max(node.hi.y, v.y);
        node.hi.z = std::max(node.hi.z, v.z);
      }
    }
    int idx = static_cast<int>(nodes.size());
    nodes.push_back(node);
    if (count <= 4) {
      nodes[idx].start = start;
      nodes[idx].count = count;
      return idx;
    }
    V3 ext = node.hi - node.lo;
    int axis = (ext.x > ext.y && ext.x > ext.z) ? 0 : (ext.y > ext.z ? 1 : 2);
    auto key = [&](int t) {
      return axis == 0 ? centroids[t].x
                       : (axis == 1 ? centroids[t].y : centroids[t].z);
    };
    std::nth_element(order.begin() + start, order.begin() + start + count / 2,
                     order.begin() + start + count,
                     [&](int a, int b) { return key(a) < key(b); });
    int mid = count / 2;
    int l = build(start, mid);
    int r = build(start + mid, count - mid);
    nodes[idx].left = l;
    nodes[idx].right = r;
    nodes[idx].count = 0;
    return idx;
  }

  float box_dist2(const BVHNode& n, V3 p) const {
    float dx = std::max({n.lo.x - p.x, 0.0f, p.x - n.hi.x});
    float dy = std::max({n.lo.y - p.y, 0.0f, p.y - n.hi.y});
    float dz = std::max({n.lo.z - p.z, 0.0f, p.z - n.hi.z});
    return dx * dx + dy * dy + dz * dz;
  }

  void query_one(V3 p, float* out_dist, int* out_face, V3* out_cp) const {
    float best = 1e30f;
    int best_tri = 0, best_region = 6;
    V3 best_cp{};
    // explicit stack traversal, nearest-box first
    int stack[128];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      int ni = stack[--sp];
      const BVHNode& n = nodes[ni];
      if (box_dist2(n, p) >= best) continue;
      if (n.left < 0) {
        for (int i = n.start; i < n.start + n.count; ++i) {
          int t = order[i];
          int region;
          V3 cp = closest_point_on_triangle(
              p, verts[faces[3 * t]], verts[faces[3 * t + 1]],
              verts[faces[3 * t + 2]], &region);
          float d2 = dot(p - cp, p - cp);
          if (d2 < best) {
            best = d2;
            best_tri = t;
            best_region = region;
            best_cp = cp;
          }
        }
      } else {
        float dl = box_dist2(nodes[n.left], p);
        float dr = box_dist2(nodes[n.right], p);
        // push farther child first so nearer is processed next
        if (dl < dr) {
          stack[sp++] = n.right;
          stack[sp++] = n.left;
        } else {
          stack[sp++] = n.left;
          stack[sp++] = n.right;
        }
      }
    }

    // pseudonormal of the closest primitive
    const int* f = &faces[3 * best_tri];
    V3 nrm;
    switch (best_region) {
      case 0: nrm = vertex_normals[f[0]]; break;
      case 1: nrm = vertex_normals[f[1]]; break;
      case 2: nrm = vertex_normals[f[2]]; break;
      case 3: nrm = edge_normal(f[0], f[1], best_tri); break;
      case 4: nrm = edge_normal(f[1], f[2], best_tri); break;
      case 5: nrm = edge_normal(f[0], f[2], best_tri); break;
      default: nrm = face_normals[best_tri];
    }
    float s = dot(p - best_cp, nrm) >= 0 ? 1.0f : -1.0f;
    *out_dist = s * std::sqrt(best);
    *out_face = best_tri;
    *out_cp = best_cp;
  }

  V3 edge_normal(int a, int b, int fallback_tri) const {
    auto it = edge_normals.find({std::min(a, b), std::max(a, b)});
    return it != edge_normals.end() ? it->second : face_normals[fallback_tri];
  }
};

}  // namespace

extern "C" {

void* sd_build(const float* verts, int V, const int* faces, int F) {
  auto* m = new SignedDistanceMesh();
  m->verts.resize(V);
  std::memcpy(m->verts.data(), verts, sizeof(float) * 3 * V);
  m->faces.assign(faces, faces + 3 * F);

  m->face_normals.resize(F);
  m->vertex_normals.assign(V, V3{});
  m->centroids.resize(F);
  for (int t = 0; t < F; ++t) {
    V3 a = m->verts[faces[3 * t]], b = m->verts[faces[3 * t + 1]],
       c = m->verts[faces[3 * t + 2]];
    m->face_normals[t] = normalize(cross(b - a, c - a));
    m->centroids[t] = (1.0f / 3.0f) * (a + b + c);
    // angle-weighted vertex normals
    const V3 tri[3] = {a, b, c};
    for (int k = 0; k < 3; ++k) {
      V3 e1 = tri[(k + 1) % 3] - tri[k];
      V3 e2 = tri[(k + 2) % 3] - tri[k];
      float cosang = dot(e1, e2) / std::max(norm(e1) * norm(e2), 1e-20f);
      cosang = std::max(-1.0f, std::min(1.0f, cosang));
      float ang = std::acos(cosang);
      m->vertex_normals[faces[3 * t + k]] =
          m->vertex_normals[faces[3 * t + k]] + ang * m->face_normals[t];
    }
    for (int k = 0; k < 3; ++k) {
      int i = faces[3 * t + k], j = faces[3 * t + (k + 1) % 3];
      auto key = std::make_pair(std::min(i, j), std::max(i, j));
      auto it = m->edge_normals.find(key);
      if (it == m->edge_normals.end())
        m->edge_normals[key] = m->face_normals[t];
      else
        it->second = it->second + m->face_normals[t];
    }
  }
  for (auto& v : m->vertex_normals) v = normalize(v);
  for (auto& kv : m->edge_normals) kv.second = normalize(kv.second);

  m->order.resize(F);
  for (int t = 0; t < F; ++t) m->order[t] = t;
  m->nodes.reserve(2 * F);
  m->build(0, F);
  return m;
}

void sd_query(void* handle, const float* pts, int N, float* out_dist,
              int* out_face, float* out_cp) {
  auto* m = static_cast<SignedDistanceMesh*>(handle);
  for (int i = 0; i < N; ++i) {
    V3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    V3 cp;
    m->query_one(p, &out_dist[i], &out_face[i], &cp);
    if (out_cp) {
      out_cp[3 * i] = cp.x;
      out_cp[3 * i + 1] = cp.y;
      out_cp[3 * i + 2] = cp.z;
    }
  }
}

void sd_free(void* handle) {
  delete static_cast<SignedDistanceMesh*>(handle);
}

}  // extern "C"
