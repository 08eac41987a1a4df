"""MXU matmul brute tracer (ops/mat_trace.py) vs the exact XLA brute.

Interpret mode on CPU. Standard: finalized hit distances agree bitwise off
knife edges (the tracer recomputes the winner's t with the canonical MT op
order); winner ids match off knife edges; occlusion booleans flip only on
knife-edge candidates (the matmul expansion reassociates MT's fp, ~1e-6
relative search noise — module docstring).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.core.types import Meshes
from raytracer_tpu.io import meshgen
from raytracer_tpu.models import presets
from raytracer_tpu.ops import geometry as geom
from raytracer_tpu.ops import mat_trace as MT
from raytracer_tpu.renderer import render
from tests.helpers import assert_images_close


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(MT, "_INTERPRET", True)


@pytest.fixture(scope="module")
def mesh_scene():
    scene, cam, opts = presets.config4_mesh(use_obj=False)
    verts, tris = meshgen.bumpy_sphere(subdiv=3, radius=1.3)
    verts = verts + np.array([0.0, -0.1, -5.5], np.float32)
    scene = scene.replace(meshes=Meshes.build(
        verts, tris, np.zeros((tris.shape[0],), np.int32),
        normals=meshgen.vertex_normals(verts, tris)))
    opts = dataclasses.replace(opts, width=64, height=40, max_depth=2,
                               tile_rays=2560)
    return scene, cam, opts


@pytest.fixture(scope="module")
def rays(mesh_scene):
    scene, cam, opts = mesh_scene
    dirs = geom.raygen(cam.pos, cam.c2w, cam.fov_deg, opts.width, opts.height)
    orig = jnp.broadcast_to(jnp.asarray(cam.pos), dirs.shape)
    return orig, dirs, opts


def _brute(scene, orig, direc, t_min):
    """Exact MT over every triangle (reference winner, ascending-id ties)."""
    v0, e1, e2 = scene.meshes.tri_soa()
    ts, _, _ = geom.triangle_hits(orig, direc, v0, e1, e2, t_min)
    ts = np.asarray(ts)
    best = ts.min(axis=1)
    idx = np.where(np.isfinite(best), ts.argmin(axis=1), v0.shape[0])
    return best, idx


def test_weights_match_mt_quantities(mesh_scene):
    """The linear expansion reproduces det/u·det/v·det/t·det to fp noise."""
    scene, cam, opts = mesh_scene
    v0, e1, e2 = (np.asarray(a, np.float64)
                  for a in scene.meshes.tri_soa())
    rng = np.random.default_rng(0)
    o = rng.normal(0, 2, (64, 3))
    d = rng.normal(0, 1, (64, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    w, c = MT.build_tri_weights(v0, e1, e2, bt=64)
    w, c = np.asarray(w, np.float64), np.asarray(c, np.float64)
    feats = np.concatenate(
        [d, np.cross(o - c, d), o - c, np.ones((64, 1))], axis=1)
    out = feats @ w[:10]
    # direct comparison on the first block (subdiv-3 sphere has > 64 tris)
    pv = np.cross(d[:, None, :], e2[None, :64])           # [N,64,3]
    tv = o[:, None, :] - v0[None, :64]
    qv = np.cross(tv, e1[None, :64])
    det = (e1[None, :64] * pv).sum(-1)
    u_num = (tv * pv).sum(-1)
    v_num = (d[:, None, :] * qv).sum(-1)
    t_num = (e2[None, :64] * qv).sum(-1)
    for q, ref in enumerate((det, u_num, v_num, t_num)):
        got = out[:, q * 64:(q + 1) * 64]
        scale = np.abs(ref).max() + 1e-9
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-6,
                                   err_msg=f"quantity {q}")


def test_nearest_matches_brute(mesh_scene, rays):
    scene, cam, opts = mesh_scene
    orig, dirs, _ = rays
    t_ref, i_ref = _brute(scene, orig, dirs, opts.t_min)

    tr = MT.MatTracer.build(scene, bt=512)
    feats = MT.ray_features(orig, dirs, tr._center)
    tb, ib = MT.mat_nearest(feats, tr._w, t_min=float(opts.t_min),
                            bt=512)
    tb = np.asarray(tr._finalize(orig, dirs, tb, ib, opts.t_min))
    ib = np.asarray(ib)

    fin = np.isfinite(t_ref)
    assert fin.sum() > 100
    miss_flip = (fin != np.isfinite(tb)).mean()
    assert miss_flip <= 0.005, f"hit/miss flips {miss_flip}"
    both = fin & np.isfinite(tb)
    np.testing.assert_allclose(tb[both], t_ref[both], rtol=2e-6)
    assert (ib[both] != i_ref[both]).mean() <= 0.005


def test_occluded_matches_brute(mesh_scene, rays):
    scene, cam, opts = mesh_scene
    orig, dirs, _ = rays
    t_ref, _ = _brute(scene, orig, dirs, opts.t_min)
    mx = jnp.full(orig.shape[:1], 6.0, jnp.float32)

    tr = MT.MatTracer.build(scene, bt=512)
    feats = MT.ray_features(orig, dirs, tr._center)
    occ = np.asarray(MT.mat_occluded(feats, mx, tr._w,
                                     t_min=float(opts.t_min), bt=512))
    ref = t_ref < 6.0
    assert (occ != ref).mean() <= 0.005


def test_mat_selectable_backend(mesh_scene):
    """VERDICT r4 #5: `--tracer mat` resolves end-to-end via build_tracer."""
    from raytracer_tpu.utils.hostload import build_tracer

    scene, _, _ = mesh_scene
    assert isinstance(build_tracer(scene, "mat"), MT.MatTracer)


@pytest.mark.slow
def test_mat_cross_backend_agreement(mesh_scene, rays):
    """Mat vs grid vs BVH winner search on a config4-class mesh: finalized
    t's agree to the cross-backend standard (rtol 2e-6, ids exact off knife
    edges — ops/pallas_walk.py docstring) and occlusion bits match."""
    from raytracer_tpu.accel.bvh import BVHTracer
    from raytracer_tpu.accel.grid import GridTracer

    scene, cam, opts = mesh_scene
    verts, tris = meshgen.bumpy_sphere(subdiv=4, radius=1.3)
    verts = verts + np.array([0.0, -0.1, -5.5], np.float32)
    scene = scene.replace(meshes=Meshes.build(
        verts, tris, np.zeros((tris.shape[0],), np.int32),
        normals=meshgen.vertex_normals(verts, tris)))
    orig, dirs, _ = rays
    t_min = float(opts.t_min)

    tr_mat = MT.MatTracer.build(scene, bt=512)
    hits = {}
    for name, tr in (("mat", tr_mat), ("grid", GridTracer.build(scene)),
                     ("bvh", BVHTracer.build(scene))):
        h = tr.nearest(orig, dirs, t_min, opts.tri_chunk)
        hits[name] = (np.asarray(h.t), np.asarray(h.idx),
                      np.asarray(h.kind))
    t0, i0, k0 = hits["grid"]
    for name in ("mat", "bvh"):
        t1, i1, k1 = hits[name]
        fin = np.isfinite(t0) & np.isfinite(t1)
        assert (np.isfinite(t0) != np.isfinite(t1)).mean() <= 0.005, name
        np.testing.assert_allclose(t1[fin], t0[fin], rtol=2e-6,
                                   err_msg=name)
        assert ((i1 != i0) | (k1 != k0))[fin].mean() <= 0.005, name

    mx = jnp.full(orig.shape[:1], 6.0, jnp.float32)
    occ = {name: np.asarray(tr.occluded(orig, dirs, mx, t_min,
                                        opts.tri_chunk))
           for name, tr in (("mat", tr_mat),
                            ("grid", GridTracer.build(scene)),
                            ("bvh", BVHTracer.build(scene)))}
    assert (occ["mat"] != occ["grid"]).mean() <= 0.005
    assert (occ["bvh"] != occ["grid"]).mean() <= 0.005


@pytest.mark.slow
def test_mat_render_matches_default(mesh_scene):
    """End-to-end render through MatTracer == default path to the knife-edge
    pixel tolerance the golden tests use."""
    scene, cam, opts = mesh_scene
    ref = np.asarray(render(scene, cam, opts)[0])
    img = np.asarray(render(scene, cam, opts,
                            tracer=MT.MatTracer.build(scene, bt=512))[0])
    assert_images_close(img, ref, tol=1e-4, max_bad_frac=0.004,
                        name="mat-tracer")
