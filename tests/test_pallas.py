"""Pallas megakernel tests — interpret mode on CPU (SURVEY.md §4.2).

The kernels are search-only and must agree with the XLA scan path exactly
(same fp semantics: +inf misses, min-fold, per-tile argmin).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.io import meshgen
from raytracer_tpu.models import presets
from raytracer_tpu.ops import geometry as G
from raytracer_tpu.ops import pallas_trace as PT
from raytracer_tpu.renderer import render
from tests.helpers import assert_images_close


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(PT, "_INTERPRET", True)


@pytest.fixture(scope="module")
def tri_soa():
    verts, tris = meshgen.bumpy_sphere(subdiv=2, radius=1.3)
    verts = verts + np.array([0, 0, -4], np.float32)
    v0 = verts[tris[:, 0]]
    e1 = verts[tris[:, 1]] - v0
    e2 = verts[tris[:, 2]] - v0
    return jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(0)
    n = 300
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.zeros((n, 3), jnp.float32), jnp.asarray(d, jnp.float32)


def test_tri_nearest_matches_xla(tri_soa, rays):
    v0, e1, e2 = tri_soa
    orig, d = rays
    t_ref, _, _ = G.triangle_hits(orig, d, v0, e1, e2, 1e-4)
    tb_ref = np.asarray(jnp.min(t_ref, axis=1))
    ib_ref = np.asarray(jnp.argmin(t_ref, axis=1))
    tri = PT.pack_tris(v0, e1, e2, bt=128)
    tb, ib = PT.tri_nearest(orig, d, tri, br=64, bt=128, interpret=True)
    tb, ib = np.asarray(tb), np.asarray(ib)
    hits = np.isfinite(tb_ref)
    np.testing.assert_allclose(tb[hits], tb_ref[hits], rtol=1e-6)
    assert np.isinf(tb[~hits]).all()
    np.testing.assert_array_equal(ib[hits], ib_ref[hits])


def test_tri_occluded_matches_xla(tri_soa, rays):
    v0, e1, e2 = tri_soa
    orig, d = rays
    t_ref, _, _ = G.triangle_hits(orig, d, v0, e1, e2, 1e-4)
    for max_t in (2.0, 5.0, 100.0):
        want = np.asarray(jnp.any(t_ref < max_t, axis=1))
        tri = PT.pack_tris(v0, e1, e2, bt=128)
        got = np.asarray(PT.tri_occluded(
            orig, d, jnp.full((orig.shape[0],), max_t), tri, br=64, bt=128,
            interpret=True))
        np.testing.assert_array_equal(got, want)


def test_ragged_ray_count(tri_soa):
    """N not a multiple of the ray block: padding rays must all miss."""
    v0, e1, e2 = tri_soa
    n = 77
    orig = jnp.zeros((n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
    tri = PT.pack_tris(v0, e1, e2, bt=128)
    tb, _ = PT.tri_nearest(orig, d, tri, br=64, bt=128, interpret=True)
    assert tb.shape == (n,)
    assert np.isfinite(np.asarray(tb)).all()  # head-on rays all hit the blob


@pytest.mark.slow
def test_pallas_render_matches_default():
    """Full render through PallasTracer == default render (small mesh scene)."""
    from raytracer_tpu.core.types import Meshes
    from raytracer_tpu.ops.pallas_trace import PallasTracer

    scene, cam, opts = presets.config4_mesh(use_obj=False)
    verts, tris = meshgen.bumpy_sphere(subdiv=2, radius=1.3)
    normals = meshgen.vertex_normals(verts, tris)
    verts = verts + np.array([0.0, -0.1, -5.5], np.float32)
    scene = scene.replace(meshes=Meshes.build(
        verts, tris, np.zeros((tris.shape[0],), np.int32), normals=normals))
    opts = dataclasses.replace(opts, width=64, height=36, max_depth=2,
                               tile_rays=2304)
    ref = np.asarray(render(scene, cam, opts)[0])
    tr = PallasTracer(scene, br=64, bt=128)
    img = np.asarray(render(scene, cam, opts, tracer=tr)[0])
    assert_images_close(img, ref, tol=1e-6, max_bad_frac=0.001, name="pallas")
