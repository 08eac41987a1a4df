// Uniform-grid cell-table builder — C++ runtime component (SURVEY.md §2.2
// "Accel grid/BVH": the reference's accelerator build is native; ours too).
// Python computes bbox/resolution (cheap); this fills the fixed-capacity cell
// table + overflow list with semantics identical to the NumPy fallback in
// raytracer_tpu/accel/grid.py (ascending triangle ids per cell; sorted
// overflow) so the two builders produce byte-identical arrays.

#include <algorithm>
#include <cstdlib>
#include <cstring>
#include <set>
#include <vector>

extern "C" {

// Returns 0 on success. cell_tris_out: malloc'd [nx*ny*nz*capacity] i32 filled
// with `nt` sentinels; overflow_out: malloc'd sorted unique spilled ids.
int rt_grid_build(const float* verts, int nv, const int* tris, int nt,
                  const double* bmin, const double* cell_size, int nx, int ny,
                  int nz, int capacity, int** cell_tris_out,
                  int** overflow_out, int* n_overflow) {
  (void)nv;
  const long ncells = (long)nx * ny * nz;
  int* table = (int*)std::malloc(sizeof(int) * ncells * capacity);
  if (!table) return 1;
  std::vector<int> counts(ncells, 0);
  for (long c = 0; c < ncells * capacity; ++c) table[c] = nt;
  std::set<int> overflow;

  auto clampi = [](int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  };

  for (int i = 0; i < nt; ++i) {
    double tmin[3], tmax[3];
    for (int a = 0; a < 3; ++a) {
      double p0 = verts[3 * tris[3 * i] + a];
      double p1 = verts[3 * tris[3 * i + 1] + a];
      double p2 = verts[3 * tris[3 * i + 2] + a];
      tmin[a] = std::min(p0, std::min(p1, p2));
      tmax[a] = std::max(p0, std::max(p1, p2));
    }
    int lo[3], hi[3];
    const int res[3] = {nx, ny, nz};
    for (int a = 0; a < 3; ++a) {
      lo[a] = clampi((int)((tmin[a] - bmin[a]) / cell_size[a]), 0, res[a] - 1);
      hi[a] = clampi((int)((tmax[a] - bmin[a]) / cell_size[a]), 0, res[a] - 1);
    }
    for (int cx = lo[0]; cx <= hi[0]; ++cx)
      for (int cy = lo[1]; cy <= hi[1]; ++cy)
        for (int cz = lo[2]; cz <= hi[2]; ++cz) {
          long c = ((long)cx * ny + cy) * nz + cz;
          if (counts[c] < capacity)
            table[c * capacity + counts[c]++] = i;
          else
            overflow.insert(i);
        }
  }

  int* ov = (int*)std::malloc(sizeof(int) * std::max<size_t>(overflow.size(), 1));
  if (!ov) {
    std::free(table);
    return 1;
  }
  int k = 0;
  for (int id : overflow) ov[k++] = id;
  *cell_tris_out = table;
  *overflow_out = ov;
  *n_overflow = (int)overflow.size();
  return 0;
}

}  // extern "C"
