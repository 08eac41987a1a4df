"""Wavefront OBJ load/save. Reference analog: the hand-rolled `loadOBJ` parser
(SURVEY §2.2 "OBJ loader" — host cold path, so Python is the right tool; a C++
fast path lives in native/objloader.cpp and is used automatically when built).

Supports: `v x y z`, `vn x y z`, `f a b c ...` (fans triangulated), `f a//n`,
`f a/t/n`, negative indices. Returns positions/triangles (+vertex normals when
every face supplies them and they index 1:1 with vertices, else recomputed).
"""

import os

import numpy as np

from raytracer_tpu.io.meshgen import vertex_normals
from raytracer_tpu.utils.native import native_lib


def save_obj(path: str, verts: np.ndarray, tris: np.ndarray,
             normals: np.ndarray | None = None) -> None:
    with open(path, "w") as f:
        f.write("# raytracer_tpu OBJ export\n")
        for v in np.asarray(verts, np.float64):
            f.write(f"v {v[0]:.8g} {v[1]:.8g} {v[2]:.8g}\n")
        if normals is not None:
            for n in np.asarray(normals, np.float64):
                f.write(f"vn {n[0]:.8g} {n[1]:.8g} {n[2]:.8g}\n")
        for t in np.asarray(tris, np.int64) + 1:
            if normals is not None:
                f.write(f"f {t[0]}//{t[0]} {t[1]}//{t[1]} {t[2]}//{t[2]}\n")
            else:
                f.write(f"f {t[0]} {t[1]} {t[2]}\n")


def load_obj(path: str, smooth: bool | None = None):
    """→ (verts [V,3] f32, tris [T,3] i32, normals [V,3] f32 or None).

    smooth=True forces recomputed vertex normals; False forces flat (None);
    None keeps file normals when present (vertex-aligned), else flat.
    """
    lib = native_lib()
    if lib is not None:
        parsed = lib.load_obj(path)
    else:
        parsed = _load_obj_py(path)
    verts, tris, vn = parsed
    normals = None
    if smooth is True:
        normals = vertex_normals(verts, tris)
    elif smooth is None and vn is not None:
        normals = vn
    return verts, tris, normals


def _load_obj_py(path: str):
    verts, norms, faces = [], [], []
    face_vn = []  # per-corner normal index or -1
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                verts.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("vn "):
                p = line.split()
                norms.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("f "):
                corners = line.split()[1:]
                idx = []
                for c in corners:
                    parts = c.split("/")
                    vi = int(parts[0])
                    ni = int(parts[2]) if len(parts) >= 3 and parts[2] else 0
                    idx.append((vi, ni))
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append((idx[0][0], idx[k][0], idx[k + 1][0]))
                    face_vn.append((idx[0][1], idx[k][1], idx[k + 1][1]))
    nv = len(verts)
    v = np.asarray(verts, np.float32).reshape(-1, 3)

    def fix(i: int) -> int:
        return i - 1 if i > 0 else nv + i

    t = np.asarray([[fix(a), fix(b), fix(c)] for a, b, c in faces],
                   np.int32).reshape(-1, 3)
    vn = None
    if norms and all(all(n != 0 for n in f) for f in face_vn):
        # keep normals only when they map 1:1 onto vertices (our own exports do)
        aligned = all(f[k] - 1 == t[i, k] for i, f in enumerate(face_vn)
                      for k in range(3)) and len(norms) == nv
        if aligned:
            vn = np.asarray(norms, np.float32).reshape(-1, 3)
    return v, t, vn
