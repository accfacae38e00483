// Native mesh post-processing kernels.
//
// TPU-native counterpart of the reference's native-code layer: where the
// reference ships C/CUDA detector kernels (hand_object_detector/lib/model/
// csrc), this framework's detector ops are XLA programs, and the native layer
// instead accelerates the HOST-side mesh runtime: connected components
// (FloaterRemover), degenerate-face removal, and grid decimation (FaceReducer)
// over 10^5..10^6-element meshes, where pure-Python union-find dominates
// export time.
//
// Build: g++ -O2 -shared -fPIC -o libmesh_ops.so mesh_ops.cpp
// Loaded via ctypes (followmyhold_tpu/native/__init__.py) with a NumPy
// fallback when the .so is absent.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Union-find with path halving.
static int32_t uf_find(int32_t* parent, int32_t a) {
  while (parent[a] != a) {
    parent[a] = parent[parent[a]];
    a = parent[a];
  }
  return a;
}

// Label connected components over face edges.
// verts: n_verts, faces: [n_faces, 3] int32. out_labels: [n_verts] int32.
// Returns the label of the largest component.
int32_t connected_components(int32_t n_verts, int32_t n_faces,
                             const int32_t* faces, int32_t* out_labels) {
  std::vector<int32_t> parent(n_verts);
  for (int32_t i = 0; i < n_verts; ++i) parent[i] = i;

  for (int32_t f = 0; f < n_faces; ++f) {
    int32_t a = uf_find(parent.data(), faces[3 * f]);
    int32_t b = uf_find(parent.data(), faces[3 * f + 1]);
    int32_t c = uf_find(parent.data(), faces[3 * f + 2]);
    if (b != a) parent[b] = a;
    if (c != a) parent[uf_find(parent.data(), c)] = a;
  }

  std::vector<int64_t> count(n_verts, 0);
  for (int32_t i = 0; i < n_verts; ++i) {
    out_labels[i] = uf_find(parent.data(), i);
    count[out_labels[i]]++;
  }
  int32_t best = 0;
  int64_t best_count = -1;
  for (int32_t i = 0; i < n_verts; ++i) {
    if (count[i] > best_count) {
      best_count = count[i];
      best = i;
    }
  }
  return best;
}

// Compact a mesh to the vertices with keep[i] != 0, dropping faces touching
// removed vertices. Returns new face count; writes remapped faces and the
// vertex remap (-1 for dropped).
int32_t compact_mesh(int32_t n_verts, int32_t n_faces, const int32_t* faces,
                     const uint8_t* keep, int32_t* out_faces,
                     int32_t* out_remap) {
  int32_t nv = 0;
  for (int32_t i = 0; i < n_verts; ++i)
    out_remap[i] = keep[i] ? nv++ : -1;

  int32_t nf = 0;
  for (int32_t f = 0; f < n_faces; ++f) {
    int32_t a = out_remap[faces[3 * f]];
    int32_t b = out_remap[faces[3 * f + 1]];
    int32_t c = out_remap[faces[3 * f + 2]];
    if (a >= 0 && b >= 0 && c >= 0) {
      out_faces[3 * nf] = a;
      out_faces[3 * nf + 1] = b;
      out_faces[3 * nf + 2] = c;
      nf++;
    }
  }
  return nf;
}

// Grid-cluster decimation: assign each vertex to a grid cell of size `cell`,
// average positions per cell, remap faces, drop degenerates and duplicates.
// Returns new face count; n_out_verts written through.
int32_t decimate_grid(int32_t n_verts, int32_t n_faces, const float* verts,
                      const int32_t* faces, float cell, float lo_x, float lo_y,
                      float lo_z, float* out_verts, int32_t* out_faces,
                      int32_t* n_out_verts) {
  std::unordered_map<int64_t, int32_t> cell_id;
  cell_id.reserve(n_verts * 2);
  std::vector<int32_t> remap(n_verts);
  std::vector<double> acc;
  std::vector<int32_t> cnt;

  const double inv = 1.0 / (cell > 1e-12f ? cell : 1e-12f);
  for (int32_t i = 0; i < n_verts; ++i) {
    int64_t gx = (int64_t)((verts[3 * i] - lo_x) * inv);
    int64_t gy = (int64_t)((verts[3 * i + 1] - lo_y) * inv);
    int64_t gz = (int64_t)((verts[3 * i + 2] - lo_z) * inv);
    int64_t key = (gx * 73856093LL) ^ (gy * 19349663LL) ^ (gz * 83492791LL);
    auto it = cell_id.find(key);
    int32_t id;
    if (it == cell_id.end()) {
      id = (int32_t)cnt.size();
      cell_id.emplace(key, id);
      acc.resize(acc.size() + 3, 0.0);
      cnt.push_back(0);
    } else {
      id = it->second;
    }
    remap[i] = id;
    acc[3 * id] += verts[3 * i];
    acc[3 * id + 1] += verts[3 * i + 1];
    acc[3 * id + 2] += verts[3 * i + 2];
    cnt[id]++;
  }

  int32_t nv = (int32_t)cnt.size();
  for (int32_t i = 0; i < nv; ++i) {
    out_verts[3 * i] = (float)(acc[3 * i] / cnt[i]);
    out_verts[3 * i + 1] = (float)(acc[3 * i + 1] / cnt[i]);
    out_verts[3 * i + 2] = (float)(acc[3 * i + 2] / cnt[i]);
  }
  *n_out_verts = nv;

  std::unordered_map<int64_t, bool> seen;
  seen.reserve(n_faces * 2);
  int32_t nf = 0;
  for (int32_t f = 0; f < n_faces; ++f) {
    int32_t a = remap[faces[3 * f]];
    int32_t b = remap[faces[3 * f + 1]];
    int32_t c = remap[faces[3 * f + 2]];
    if (a == b || b == c || a == c) continue;
    // canonical key for dedup (sorted)
    int32_t s0 = a < b ? (a < c ? a : c) : (b < c ? b : c);
    int32_t s2 = a > b ? (a > c ? a : c) : (b > c ? b : c);
    int32_t s1 = a + b + c - s0 - s2;
    int64_t key = ((int64_t)s0 << 42) | ((int64_t)s1 << 21) | (int64_t)s2;
    if (seen.count(key)) continue;
    seen.emplace(key, true);
    out_faces[3 * nf] = a;
    out_faces[3 * nf + 1] = b;
    out_faces[3 * nf + 2] = c;
    nf++;
  }
  return nf;
}

// Marching-tetrahedra geometry emission over a precomputed list of
// sign-change cells (the Python side finds candidate cells with a vectorized
// scan; the per-cell edge-dedup + interpolation here was the numpy hot spot:
// ~20 s for 1.1M verts at 385^3, ~1 s in C++). Topology tables are passed in
// from ops/surface.py so there is exactly one source of truth.
//
// Returns 0 on success, 1 when out_verts/out_faces capacity was exhausted
// (counts are still written; caller treats it as overflow).
int32_t marching_tets_cells(
    int32_t n, const float* s, int64_t n_cells, const int32_t* cells,
    const int32_t* tets,          // [6][4] cell-corner ids per tet
    const int32_t* tri_table,     // [6][16][2][3] edge ids or -1
    const int32_t* edge_corners,  // [6][n_edges][2] edge -> corner pair
    int32_t n_edges_per_tet,
    const int32_t* corners,       // [8][3] cell corner offsets
    const int32_t* dirs,          // [7][3] edge directions
    const int32_t* bit2dir,       // [8] (dx*4+dy*2+dz) -> dir id
    const double* bbox_min, const double* step,
    float* out_verts, int32_t* out_faces, int64_t* out_counts,
    int64_t max_v, int64_t max_f) {
  std::unordered_map<int64_t, int32_t> edge_slot;
  edge_slot.reserve((size_t)(n_cells * 4));
  int64_t nv = 0, nf = 0;
  const int64_t nn = (int64_t)n * n;

  for (int64_t c = 0; c < n_cells; ++c) {
    const int32_t ci = cells[3 * c], cj = cells[3 * c + 1],
                  ck = cells[3 * c + 2];
    int ins[8];
    for (int k = 0; k < 8; ++k) {
      const int64_t gi = ci + corners[3 * k], gj = cj + corners[3 * k + 1],
                    gk = ck + corners[3 * k + 2];
      ins[k] = s[gi * nn + gj * n + gk] < 0.f;
    }
    for (int t = 0; t < 6; ++t) {
      const int cse = ins[tets[4 * t]] + 2 * ins[tets[4 * t + 1]] +
                      4 * ins[tets[4 * t + 2]] + 8 * ins[tets[4 * t + 3]];
      for (int tri = 0; tri < 2; ++tri) {
        const int32_t* e = &tri_table[(((int64_t)t * 16 + cse) * 2 + tri) * 3];
        if (e[0] < 0) continue;
        if (nf >= max_f) goto overflow;
        for (int v = 0; v < 3; ++v) {
          const int32_t* ec =
              &edge_corners[((int64_t)t * n_edges_per_tet + e[v]) * 2];
          const int32_t* ca = &corners[3 * ec[0]];
          const int32_t* cb = &corners[3 * ec[1]];
          const int32_t lx = (ca[0] < cb[0] ? ca[0] : cb[0]) + ci;
          const int32_t ly = (ca[1] < cb[1] ? ca[1] : cb[1]) + cj;
          const int32_t lz = (ca[2] < cb[2] ? ca[2] : cb[2]) + ck;
          const int32_t dx = ca[0] ^ cb[0], dy = ca[1] ^ cb[1],
                        dz = ca[2] ^ cb[2];  // offsets are 0/1
          const int32_t dir = bit2dir[dx * 4 + dy * 2 + dz];
          const int64_t key = ((int64_t)lx * nn + (int64_t)ly * n + lz) * 7
                              + dir;
          auto it = edge_slot.find(key);
          int32_t slot;
          if (it == edge_slot.end()) {
            if (nv >= max_v) goto overflow;
            const int64_t i1 = (int64_t)lx * nn + (int64_t)ly * n + lz;
            const int32_t* d3 = &dirs[3 * dir];
            const int64_t i2 = (int64_t)(lx + d3[0]) * nn +
                               (int64_t)(ly + d3[1]) * n + (lz + d3[2]);
            const double s1 = s[i1], s2 = s[i2];
            const double den = s1 - s2;
            double tt = (den != 0.0) ? s1 / den : 0.5;
            if (tt < 0.0) tt = 0.0;
            if (tt > 1.0) tt = 1.0;
            out_verts[3 * nv] = (float)(bbox_min[0] + (lx + tt * d3[0]) * step[0]);
            out_verts[3 * nv + 1] =
                (float)(bbox_min[1] + (ly + tt * d3[1]) * step[1]);
            out_verts[3 * nv + 2] =
                (float)(bbox_min[2] + (lz + tt * d3[2]) * step[2]);
            slot = (int32_t)nv++;
            edge_slot.emplace(key, slot);
          } else {
            slot = it->second;
          }
          out_faces[3 * nf + v] = slot;
        }
        ++nf;
      }
    }
  }
  out_counts[0] = nv;
  out_counts[1] = nf;
  return 0;
overflow:
  out_counts[0] = nv;
  out_counts[1] = nf;
  return 1;
}

}  // extern "C"
