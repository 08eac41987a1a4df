"""Scene → text export for the C++ oracle (native/oracle.cpp reads this).

Format (whitespace-separated, %.9g floats):
  opts W H max_depth bias bg_r bg_g bg_b
  camera px py pz fov c2w[9 row-major]
  materials M  then per-row: mtype albedo(3) kd ks spec_n ior
  spheres N    then per-row: cx cy cz r mat
  planes N     then per-row: p(3) n(3) tg(3) bt(3) mat checker scale albedo2(3)
  mesh V T smooth  then V vert rows, [V normal rows], T rows: i j k mat
  lights L     then per-row: pos(3) intensity(3)
"""

import numpy as np


def _row(f, *vals):
    f.write(" ".join(f"{v:.9g}" if isinstance(v, float) else str(v)
                     for v in vals) + "\n")


def export_scene(path, scene, camera, opts):
    g = lambda a: np.asarray(a, np.float64)
    with open(path, "w") as f:
        _row(f, "opts", opts.width, opts.height, opts.max_depth,
             float(opts.bias), *map(float, opts.background))
        pos = g(camera.pos)
        c2w = g(camera.c2w).reshape(-1)
        _row(f, "camera", *map(float, pos), float(camera.fov_deg),
             *map(float, c2w))

        m = scene.materials
        f.write(f"materials {len(np.asarray(m.mtype))}\n")
        for i in range(len(np.asarray(m.mtype))):
            _row(f, int(np.asarray(m.mtype)[i]), *map(float, g(m.albedo)[i]),
                 float(g(m.kd)[i]), float(g(m.ks)[i]), float(g(m.spec_n)[i]),
                 float(g(m.ior)[i]))

        s = scene.spheres
        f.write(f"spheres {s.count}\n")
        for i in range(s.count):
            _row(f, *map(float, g(s.center)[i]), float(g(s.radius)[i]),
                 int(np.asarray(s.mat_id)[i]))

        p = scene.planes
        f.write(f"planes {p.count}\n")
        for i in range(p.count):
            _row(f, *map(float, g(p.point)[i]), *map(float, g(p.normal)[i]),
                 *map(float, g(p.tangent)[i]), *map(float, g(p.bitangent)[i]),
                 int(np.asarray(p.mat_id)[i]), int(np.asarray(p.checker)[i]),
                 float(g(p.checker_scale)[i]), *map(float, g(p.albedo2)[i]))

        mesh = scene.meshes
        smooth = 1 if mesh.smooth else 0
        nv = g(mesh.verts).shape[0]
        nt = mesh.count
        f.write(f"mesh {nv} {nt} {smooth}\n")
        for v in g(mesh.verts):
            _row(f, *map(float, v))
        if smooth:
            for n in g(mesh.normals):
                _row(f, *map(float, n))
        tris = np.asarray(mesh.tris)
        tmat = np.asarray(mesh.mat_id)
        for i in range(nt):
            _row(f, int(tris[i, 0]), int(tris[i, 1]), int(tris[i, 2]),
                 int(tmat[i]))

        li = scene.lights
        f.write(f"lights {li.count}\n")
        for i in range(li.count):
            _row(f, *map(float, g(li.pos)[i]), *map(float, g(li.intensity)[i]))
