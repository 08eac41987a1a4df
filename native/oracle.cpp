// Recursive C++ Whitted oracle — the project's stand-in for the reference binary.
//
// /root/reference was an empty mount (SURVEY.md §0), so this renderer *defines*
// the forward ground truth, implementing docs/SPEC.md literally in the exact
// shape of the reference genre's call stack (SURVEY.md §3.1):
//   main → render → per-pixel castRay → trace → material switch → recursion.
// Double precision throughout; the JAX renderer must match it allclose in fp32.
//
// Usage: oracle <scene.txt> <out.ppm> [width height]
// Scene text format: see tests/oracle/export_scene.py (the writer).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

namespace {

constexpr double T_MIN = 1e-4;
constexpr double DET_EPS = 1e-8;

struct V3 {
  double x = 0, y = 0, z = 0;
};
V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
V3 operator*(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
V3 operator*(double s, V3 a) { return a * s; }
V3 operator*(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
V3 operator-(V3 a) { return {-a.x, -a.y, -a.z}; }
double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
V3 normalize(V3 v) {
  double n = std::sqrt(dot(v, v));
  return n > 0 ? v * (1.0 / n) : v;
}

enum MType { DIFFUSE_AND_GLOSSY = 0, REFLECTION = 1, REFLECTION_AND_REFRACTION = 2 };

struct Material {
  int mtype;
  V3 albedo;
  double kd, ks, spec_n, ior;
};
struct Sphere {
  V3 c;
  double r;
  int mat;
};
struct Plane {
  V3 p, n, tg, bt;
  int mat, checker;
  double scale;
  V3 albedo2;
};
struct Light {
  V3 pos, intensity;
};

struct Scene {
  std::vector<Material> mats;
  std::vector<Sphere> spheres;
  std::vector<Plane> planes;
  std::vector<V3> verts, vnorms;
  std::vector<int> tris;      // 3 per face
  std::vector<int> tri_mat;   // per face
  std::vector<double> uvs;    // 2 per vertex (vertex-aligned), empty = none
  int mesh_checker = 0;       // st-checker albedo on the mesh (SPEC mesh_uv)
  double mesh_cscale = 1.0;
  V3 mesh_albedo2;
  std::vector<Light> lights;
  bool smooth = false;
  // options
  int width = 256, height = 256, max_depth = 4;
  double bias = 1e-4;
  V3 bg;
  // camera
  V3 cam_pos;
  double fov = 90;
  double c2w[9];  // row-major
};

// --- intersections (SPEC) ---

double sphereT(const V3& o, const V3& d, const Sphere& s) {
  V3 L = o - s.c;
  double a = dot(d, d), b = 2 * dot(d, L), c0 = dot(L, L) - s.r * s.r;
  double disc = b * b - 4 * a * c0;
  if (disc < 0) return INFINITY;
  double sq = std::sqrt(disc);
  double q = (b >= 0) ? -0.5 * (b + sq) : -0.5 * (b - sq);
  double t0 = q / a;
  double t1 = (std::fabs(q) > 0) ? c0 / q : -INFINITY;
  double tlo = std::min(t0, t1), thi = std::max(t0, t1);
  if (tlo > T_MIN) return tlo;
  if (thi > T_MIN) return thi;
  return INFINITY;
}

double planeT(const V3& o, const V3& d, const Plane& p) {
  double denom = dot(p.n, d);
  if (std::fabs(denom) < DET_EPS) return INFINITY;
  double t = dot(p.p - o, p.n) / denom;
  return t > T_MIN ? t : INFINITY;
}

double triTUV(const V3& o, const V3& d, const V3& v0, const V3& e1, const V3& e2,
              double* u, double* v) {
  V3 pvec = cross(d, e2);
  double det = dot(e1, pvec);
  if (std::fabs(det) < DET_EPS) return INFINITY;
  double inv = 1.0 / det;
  V3 tvec = o - v0;
  *u = dot(tvec, pvec) * inv;
  if (*u < 0 || *u > 1) return INFINITY;
  V3 qvec = cross(tvec, e1);
  *v = dot(d, qvec) * inv;
  if (*v < 0 || *u + *v > 1) return INFINITY;
  double t = dot(e2, qvec) * inv;
  return t > T_MIN ? t : INFINITY;
}

// --- optics (SPEC) ---

V3 reflect(const V3& i, const V3& n) { return i - 2 * dot(i, n) * n; }

bool refract(const V3& i, const V3& n, double ior, V3* out) {
  double cosi = std::max(-1.0, std::min(1.0, dot(i, n)));
  double etai = 1, etat = ior;
  V3 nn = n;
  if (cosi < 0) {
    cosi = -cosi;
  } else {
    std::swap(etai, etat);
    nn = -n;
  }
  double eta = etai / etat;
  double k = 1 - eta * eta * (1 - cosi * cosi);
  if (k < 0) return false;  // TIR
  *out = eta * i + (eta * cosi - std::sqrt(k)) * nn;
  return true;
}

double fresnel(const V3& i, const V3& n, double ior) {
  double cosi = std::max(-1.0, std::min(1.0, dot(i, n)));
  double etai = 1, etat = ior;
  if (cosi > 0) std::swap(etai, etat);
  double sint = etai / etat * std::sqrt(std::max(0.0, 1 - cosi * cosi));
  if (sint >= 1) return 1.0;
  double cost = std::sqrt(std::max(0.0, 1 - sint * sint));
  cosi = std::fabs(cosi);
  double rs = (etat * cosi - etai * cost) / (etat * cosi + etai * cost);
  double rp = (etai * cosi - etat * cost) / (etai * cosi + etat * cost);
  return 0.5 * (rs * rs + rp * rp);
}

// --- trace + castRay (SPEC; group tie order sphere < plane < triangle) ---

struct Hit {
  double t = INFINITY;
  int kind = 0;  // 0 none, 1 sphere, 2 plane, 3 tri
  int idx = 0;
  double u = 0, v = 0;
};

Hit trace(const Scene& sc, const V3& o, const V3& d) {
  Hit h;
  for (size_t k = 0; k < sc.spheres.size(); ++k) {
    double t = sphereT(o, d, sc.spheres[k]);
    if (t < h.t) { h.t = t; h.kind = 1; h.idx = (int)k; }
  }
  for (size_t k = 0; k < sc.planes.size(); ++k) {
    double t = planeT(o, d, sc.planes[k]);
    if (t < h.t) { h.t = t; h.kind = 2; h.idx = (int)k; }
  }
  size_t nt = sc.tris.size() / 3;
  for (size_t k = 0; k < nt; ++k) {
    const V3& v0 = sc.verts[sc.tris[3 * k]];
    V3 e1 = sc.verts[sc.tris[3 * k + 1]] - v0;
    V3 e2 = sc.verts[sc.tris[3 * k + 2]] - v0;
    double u, v;
    double t = triTUV(o, d, v0, e1, e2, &u, &v);
    if (t < h.t) { h.t = t; h.kind = 3; h.idx = (int)k; h.u = u; h.v = v; }
  }
  return h;
}

bool occluded(const Scene& sc, const V3& o, const V3& d, double maxT) {
  Hit h = trace(sc, o, d);
  return h.kind != 0 && h.t < maxT;
}

V3 castRay(const Scene& sc, const V3& o, const V3& d, int depth) {
  if (depth > sc.max_depth) return sc.bg;
  Hit h = trace(sc, o, d);
  if (h.kind == 0) return sc.bg;
  V3 p = o + h.t * d;
  V3 n;
  int mat;
  V3 albedo;
  if (h.kind == 1) {
    const Sphere& s = sc.spheres[h.idx];
    n = (p - s.c) * (1.0 / s.r);
    mat = s.mat;
    albedo = sc.mats[mat].albedo;
  } else if (h.kind == 2) {
    const Plane& pl = sc.planes[h.idx];
    n = pl.n;
    mat = pl.mat;
    albedo = sc.mats[mat].albedo;
    if (pl.checker) {
      double u = dot(p - pl.p, pl.tg) * pl.scale;
      double v = dot(p - pl.p, pl.bt) * pl.scale;
      double fu = u - std::floor(u), fv = v - std::floor(v);
      if ((fu > 0.5) != (fv > 0.5)) albedo = pl.albedo2;
    }
  } else {
    const V3& v0 = sc.verts[sc.tris[3 * h.idx]];
    const V3& v1 = sc.verts[sc.tris[3 * h.idx + 1]];
    const V3& v2 = sc.verts[sc.tris[3 * h.idx + 2]];
    if (sc.smooth) {
      n = normalize((1 - h.u - h.v) * sc.vnorms[sc.tris[3 * h.idx]] +
                    h.u * sc.vnorms[sc.tris[3 * h.idx + 1]] +
                    h.v * sc.vnorms[sc.tris[3 * h.idx + 2]]);
    } else {
      n = normalize(cross(v1 - v0, v2 - v0));
    }
    mat = sc.tri_mat[h.idx];
    albedo = sc.mats[mat].albedo;
    if (!sc.uvs.empty() && sc.mesh_checker) {
      // barycentric st from vertex-aligned uvs (SPEC "mesh_uv"); the checker
      // formula matches the plane checker on (s, t)
      int a = sc.tris[3 * h.idx], b = sc.tris[3 * h.idx + 1],
          c = sc.tris[3 * h.idx + 2];
      double s = (1 - h.u - h.v) * sc.uvs[2 * a] + h.u * sc.uvs[2 * b] +
                 h.v * sc.uvs[2 * c];
      double t = (1 - h.u - h.v) * sc.uvs[2 * a + 1] +
                 h.u * sc.uvs[2 * b + 1] + h.v * sc.uvs[2 * c + 1];
      double fu = s * sc.mesh_cscale - std::floor(s * sc.mesh_cscale);
      double fv = t * sc.mesh_cscale - std::floor(t * sc.mesh_cscale);
      if ((fu > 0.5) != (fv > 0.5)) albedo = sc.mesh_albedo2;
    }
  }
  const Material& m = sc.mats[mat];
  switch (m.mtype) {
    case REFLECTION: {
      double kr = fresnel(d, n, m.ior);
      V3 rdir = normalize(reflect(d, n));
      V3 rorig = dot(rdir, n) < 0 ? p - n * sc.bias : p + n * sc.bias;
      return kr * castRay(sc, rorig, rdir, depth + 1);
    }
    case REFLECTION_AND_REFRACTION: {
      double kr = fresnel(d, n, m.ior);
      V3 rdir = normalize(reflect(d, n));
      V3 rorig = dot(rdir, n) < 0 ? p - n * sc.bias : p + n * sc.bias;
      V3 refl = castRay(sc, rorig, rdir, depth + 1);
      V3 refr = {0, 0, 0};
      V3 tdir;
      if (refract(d, n, m.ior, &tdir)) {
        tdir = normalize(tdir);
        V3 torig = dot(tdir, n) < 0 ? p - n * sc.bias : p + n * sc.bias;
        refr = castRay(sc, torig, tdir, depth + 1);
      }
      return kr * refl + (1 - kr) * refr;
    }
    default: {  // DIFFUSE_AND_GLOSSY
      V3 sorig = dot(d, n) < 0 ? p + n * sc.bias : p - n * sc.bias;
      V3 lightAmt = {0, 0, 0}, spec = {0, 0, 0};
      for (const Light& L : sc.lights) {
        V3 lvec = L.pos - p;
        double dist = std::sqrt(dot(lvec, lvec));
        V3 ldir = lvec * (1.0 / dist);
        double ldn = std::max(0.0, dot(ldir, n));
        double vis = occluded(sc, sorig, ldir, dist) ? 0.0 : 1.0;
        lightAmt = lightAmt + vis * ldn * L.intensity;
        V3 r = reflect(-ldir, n);
        spec = spec +
               std::pow(std::max(0.0, -dot(r, d)), m.spec_n) * L.intensity;
      }
      return lightAmt * albedo * m.kd + spec * m.ks;
    }
  }
}

// --- scene text parser (format: tests/oracle/export_scene.py) ---

bool loadScene(const char* path, Scene* sc) {
  std::ifstream f(path);
  if (!f) return false;
  std::string tok;
  while (f >> tok) {
    if (tok == "opts") {
      f >> sc->width >> sc->height >> sc->max_depth >> sc->bias >> sc->bg.x >>
          sc->bg.y >> sc->bg.z;
    } else if (tok == "camera") {
      f >> sc->cam_pos.x >> sc->cam_pos.y >> sc->cam_pos.z >> sc->fov;
      for (int i = 0; i < 9; ++i) f >> sc->c2w[i];
    } else if (tok == "materials") {
      int m;
      f >> m;
      sc->mats.resize(m);
      for (auto& mt : sc->mats)
        f >> mt.mtype >> mt.albedo.x >> mt.albedo.y >> mt.albedo.z >> mt.kd >>
            mt.ks >> mt.spec_n >> mt.ior;
    } else if (tok == "spheres") {
      int n;
      f >> n;
      sc->spheres.resize(n);
      for (auto& s : sc->spheres)
        f >> s.c.x >> s.c.y >> s.c.z >> s.r >> s.mat;
    } else if (tok == "planes") {
      int n;
      f >> n;
      sc->planes.resize(n);
      for (auto& p : sc->planes)
        f >> p.p.x >> p.p.y >> p.p.z >> p.n.x >> p.n.y >> p.n.z >> p.tg.x >>
            p.tg.y >> p.tg.z >> p.bt.x >> p.bt.y >> p.bt.z >> p.mat >>
            p.checker >> p.scale >> p.albedo2.x >> p.albedo2.y >> p.albedo2.z;
    } else if (tok == "mesh") {
      int nv, nt, smooth;
      f >> nv >> nt >> smooth;
      sc->smooth = smooth != 0;
      sc->verts.resize(nv);
      for (auto& v : sc->verts) f >> v.x >> v.y >> v.z;
      if (sc->smooth) {
        sc->vnorms.resize(nv);
        for (auto& v : sc->vnorms) f >> v.x >> v.y >> v.z;
      }
      sc->tris.resize(3 * nt);
      sc->tri_mat.resize(nt);
      for (int k = 0; k < nt; ++k)
        f >> sc->tris[3 * k] >> sc->tris[3 * k + 1] >> sc->tris[3 * k + 2] >>
            sc->tri_mat[k];
    } else if (tok == "mesh_uv") {
      int nu;
      f >> nu >> sc->mesh_checker >> sc->mesh_cscale >> sc->mesh_albedo2.x >>
          sc->mesh_albedo2.y >> sc->mesh_albedo2.z;
      sc->uvs.resize(2 * nu);
      for (int k = 0; k < nu; ++k) f >> sc->uvs[2 * k] >> sc->uvs[2 * k + 1];
    } else if (tok == "lights") {
      int n;
      f >> n;
      sc->lights.resize(n);
      for (auto& l : sc->lights)
        f >> l.pos.x >> l.pos.y >> l.pos.z >> l.intensity.x >> l.intensity.y >>
            l.intensity.z;
    }
  }
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s scene.txt out.ppm [W H]\n", argv[0]);
    return 2;
  }
  Scene sc;
  if (!loadScene(argv[1], &sc)) {
    std::fprintf(stderr, "cannot read %s\n", argv[1]);
    return 1;
  }
  if (argc >= 5) {
    sc.width = std::atoi(argv[3]);
    sc.height = std::atoi(argv[4]);
  }
  const int W = sc.width, H = sc.height;
  std::vector<uint8_t> img(W * H * 3);
  double scale = std::tan(sc.fov * M_PI / 180.0 / 2.0);
  double aspect = double(W) / H;
  const double* M = sc.c2w;
  for (int j = 0; j < H; ++j) {
    double y = (1 - 2 * (j + 0.5) / H) * scale;
    for (int i = 0; i < W; ++i) {
      double x = (2 * (i + 0.5) / W - 1) * aspect * scale;
      V3 dc = {x, y, -1};
      V3 d = normalize({M[0] * dc.x + M[1] * dc.y + M[2] * dc.z,
                        M[3] * dc.x + M[4] * dc.y + M[5] * dc.z,
                        M[6] * dc.x + M[7] * dc.y + M[8] * dc.z});
      V3 c = castRay(sc, sc.cam_pos, d, 0);
      auto q = [](double v) {
        return (uint8_t)(std::min(1.0, std::max(0.0, v)) * 255.0 + 0.5);
      };
      img[3 * (j * W + i)] = q(c.x);
      img[3 * (j * W + i) + 1] = q(c.y);
      img[3 * (j * W + i) + 2] = q(c.z);
    }
  }
  std::ofstream out(argv[2], std::ios::binary);
  out << "P6\n" << W << " " << H << "\n255\n";
  out.write((const char*)img.data(), img.size());
  std::fprintf(stderr, "wrote %s (%dx%d)\n", argv[2], W, H);
  return 0;
}
