"""Pallas grid-DDA walk kernel vs the XLA while_loop walk (SURVEY §7.3.1).

Interpret mode on CPU. Standard: hit distances agree to ulp/association
noise (rtol 2e-6), winner ids match off knife edges, occlusion booleans and
the active-mask contract match exactly — the same bar as the PallasTracer
megakernel (see ops/pallas_walk.py docstring for why bitwise identity
across layout forms is impossible on this compiler).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.accel.grid import GridTracer, grid_walk
from raytracer_tpu.core.types import Meshes
from raytracer_tpu.io import meshgen
from raytracer_tpu.models import presets
from raytracer_tpu.ops import geometry as geom
from raytracer_tpu.ops import pallas_walk as PW
from raytracer_tpu.renderer import render
from tests.helpers import assert_images_close


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(PW, "_INTERPRET", True)


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
def walk_inputs(mesh_scene):
    scene, cam, opts = mesh_scene
    tr = GridTracer.build(scene)
    dirs = geom.raygen(cam.pos, cam.c2w, cam.fov_deg, opts.width, opts.height)
    orig = jnp.broadcast_to(jnp.asarray(cam.pos), dirs.shape)
    return tr, PW.pack_cell_table(tr._grid), orig, dirs, opts


def _assert_walks_agree(t0, i0, t1, i1):
    t0, t1, i0, i1 = map(np.asarray, (t0, t1, i0, i1))
    fin = np.isfinite(t0)
    assert (fin == np.isfinite(t1)).all(), "hit/miss sets differ"
    np.testing.assert_allclose(t1[fin], t0[fin], rtol=2e-6)
    assert (i0 != i1).mean() <= 0.005, "winner ids differ beyond knife edges"


def test_nearest_matches_xla_walk(walk_inputs):
    tr, table, orig, dirs, opts = walk_inputs
    v0, e1, e2 = tr._soa
    t0, i0 = grid_walk(tr._grid, v0, e1, e2, orig, dirs, opts.t_min)
    t1, i1 = PW.pallas_grid_walk(tr._grid, table, orig, dirs, opts.t_min)
    _assert_walks_agree(t0, i0, t1, i1)
    assert np.isfinite(np.asarray(t0)).sum() > 100  # scene sanity


def test_occlusion_matches_xla_walk(walk_inputs):
    tr, table, orig, dirs, opts = walk_inputs
    v0, e1, e2 = tr._soa
    mx = jnp.full(orig.shape[:1], 6.0, jnp.float32)
    o0, _ = grid_walk(tr._grid, v0, e1, e2, orig, dirs, opts.t_min,
                      occlusion_max_t=mx)
    o1, _ = PW.pallas_grid_walk(tr._grid, table, orig, dirs, opts.t_min,
                                occlusion_max_t=mx)
    np.testing.assert_array_equal(np.asarray(o0) < 6.0, np.asarray(o1) < 6.0)


def test_active_mask_contract(walk_inputs):
    """Masked-out lanes return exact misses; live lanes match the XLA walk."""
    tr, table, orig, dirs, opts = walk_inputs
    v0, e1, e2 = tr._soa
    rng = np.random.default_rng(3)
    act = jnp.asarray(rng.random(orig.shape[0]) > 0.5)
    t0, i0 = grid_walk(tr._grid, v0, e1, e2, orig, dirs, opts.t_min,
                       active=act)
    t1, i1 = PW.pallas_grid_walk(tr._grid, table, orig, dirs, opts.t_min,
                                 active=act)
    _assert_walks_agree(t0, i0, t1, i1)
    assert np.isinf(np.asarray(t1)[~np.asarray(act)]).all()


def test_overflow_seed(mesh_scene):
    """A tiny capacity forces overflow spill; the kernel starts from the
    shared walk_init seed, so spilled triangles must still be found."""
    scene, cam, opts = mesh_scene
    tr = GridTracer.build(scene, capacity=4)
    assert tr._grid.overflow.shape[0] > 0
    table = PW.pack_cell_table(tr._grid)
    dirs = geom.raygen(cam.pos, cam.c2w, cam.fov_deg, 32, 24)
    orig = jnp.broadcast_to(jnp.asarray(cam.pos), dirs.shape)
    v0, e1, e2 = tr._soa
    t0, i0 = grid_walk(tr._grid, v0, e1, e2, orig, dirs, opts.t_min)
    t1, i1 = PW.pallas_grid_walk(tr._grid, table, orig, dirs, opts.t_min)
    _assert_walks_agree(t0, i0, t1, i1)


@pytest.mark.slow
def test_grid_pallas_render_matches_default(mesh_scene):
    """End-to-end render through GridTracer(walk='pallas') == default path
    up to the knife-edge pixel tolerance the golden tests use."""
    scene, cam, opts = mesh_scene
    ref = np.asarray(render(scene, cam, opts,
                            tracer=GridTracer.build(scene))[0])
    img = np.asarray(render(scene, cam, opts,
                            tracer=GridTracer.build(scene, walk="pallas"))[0])
    assert_images_close(img, ref, tol=1e-4, max_bad_frac=0.004,
                        name="grid-pallas")
