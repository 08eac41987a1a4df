"""MXU brute-force triangle tracer: the winner search as ONE big matmul.

Reference analog: `trace()`'s per-triangle loop (SURVEY §3.1) — re-designed
for the TPU's strongest unit instead of its weakest. The r2-d cost model
(BENCH_LOG) showed the DDA walk's per-lane row gathers cost ~10 ns each —
the price of ~100k MXU FLOPs — so for meshes up to ~100k triangles a dense
gather-free sweep beats any pointer-chasing structure. The sweep rides the
MXU because Möller–Trumbore is secretly linear: each of the four scalar
triple products MT needs is a dot of per-triangle CONSTANTS with the
10-dim per-ray feature vector f = [d, o×d, o, 1] (o recentred at the mesh
AABB centre for conditioning):

    det   = e1·(d×e2)      =  d·(−n)                       n = e1×e2
    u·det = (o−v0)·(d×e2)  =  (o×d)·e2 + d·(v0×e2)
    v·det = d·((o−v0)×e1)  = −(o×d)·e1 − d·(v0×e1)
    t·det = e2·((o−v0)×e1) =  o·n − (v0·n)

so [N rays] × [T tris] × {det,u,v,t} is ONE [N,16]@[16,4T] f32 matmul
(features padded 10→16), with a VPU epilogue (validity tests + running
min-fold) fused in the same Pallas kernel — only [N] best_t/best_i leave
VMEM. Triangle weights live in VMEM once per ray block (16·4T·4 B ≈ 512 KB
per 2k-tri block) and stream over the tri grid axis.

Exactness: the matmul expansion reassociates MT's products, so the SEARCH
ranks candidates with ~1e-6-relative noise (HIGHEST precision — six bf16
passes). The tracer therefore FINALIZES: gather the winning triangle (one
row per lane, once — not per walk step) and recompute t with the exact
`geometry.triangle_tuv` op order, so the returned hit distance is the same
fp value every other backend computes and disagreements are confined to
knife-edge candidates inside the search noise — the standard cross-backend
tolerance (rtol 2e-6 + ids exact off knife edges, see ops/pallas_walk.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops import geometry as geom

DET_EPS = 1e-8
_INTERPRET = None  # None = auto (interpret off TPU); tests force True
_F = 16  # feature rows (10 used, padded to a half-register for the MXU)


def _auto_interpret() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def build_tri_weights(v0, e1, e2, bt: int = 2048):
    """Host build: triangle SoA → (weights [16, 4·Tp], center [3]).

    Weight columns are packed per tri-block as [det | u | v | t] × bt so the
    kernel's [BR, 4·bt] matmul output slices into quantity planes. Padding
    triangles get all-zero columns (det 0 ⇒ never valid). Host math in f64
    from the f32 inputs, rounded once at the end — the expansion constants
    (cross products) are exact to f32 input precision.
    """
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    t = v0.shape[0]
    assert t > 0
    v1, v2 = v0 + e1, v0 + e2
    vmin = np.minimum(np.minimum(v0, v1), v2).min(axis=0)
    vmax = np.maximum(np.maximum(v0, v1), v2).max(axis=0)
    center = (vmin + vmax) * 0.5
    v0c = v0 - center

    n = np.cross(e1, e2)
    cols = {
        "det": np.concatenate(
            [-n, np.zeros((t, 3)), np.zeros((t, 3)), np.zeros((t, 1))], 1),
        "u": np.concatenate(
            [np.cross(v0c, e2), e2, np.zeros((t, 3)), np.zeros((t, 1))], 1),
        "v": np.concatenate(
            [-np.cross(v0c, e1), -e1, np.zeros((t, 3)), np.zeros((t, 1))], 1),
        "t": np.concatenate(
            [np.zeros((t, 3)), np.zeros((t, 3)), n,
             -(v0c * n).sum(1, keepdims=True)], 1),
    }
    tp = max(_cdiv(t, bt), 1) * bt
    w = np.zeros((_F, 4 * tp), np.float32)
    for b in range(tp // bt):
        lo, hi = b * bt, min((b + 1) * bt, t)
        for q, name in enumerate(("det", "u", "v", "t")):
            if hi > lo:
                w[:10, (4 * b + q) * bt:(4 * b + q) * bt + (hi - lo)] = \
                    cols[name][lo:hi].T.astype(np.float32)
    return jnp.asarray(w), jnp.asarray(center, jnp.float32)


def ray_features(orig, direc, center):
    """[N,3]×2 → [N,16] f32 feature rows [d, o×d, o, 1, 0…] (o recentred)."""
    o = orig - center[None, :]
    f = jnp.concatenate(
        [direc, jnp.cross(o, direc), o,
         jnp.ones((orig.shape[0], 1), jnp.float32)], axis=1)
    return jnp.pad(f, ((0, 0), (0, _F - 10)))


def _epilogue(out, bt: int, t_min: float):
    """[BR, 4·bt] matmul block → tt [BR, bt] (+inf misses)."""
    det = out[:, 0 * bt:1 * bt]
    un = out[:, 1 * bt:2 * bt]
    vn = out[:, 2 * bt:3 * bt]
    tn = out[:, 3 * bt:4 * bt]
    ok = jnp.abs(det) > DET_EPS
    inv = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
    u = un * inv
    v = vn * inv
    t = tn * inv
    ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > t_min)
    return jnp.where(ok, t, jnp.inf)


def _make_nearest_kernel(t_min: float, bt: int):
    def kernel(f_ref, w_ref, t_out, i_out):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            t_out[:] = jnp.full_like(t_out, jnp.inf)
            i_out[:] = jnp.full_like(i_out, 0)

        out = jnp.dot(f_ref[:], w_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        tt = _epilogue(out, bt, t_min)
        tmin = jnp.min(tt, axis=1, keepdims=True)             # [BR,1]
        amin = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None] + j * bt
        better = tmin < t_out[:]
        t_out[:] = jnp.where(better, tmin, t_out[:])
        i_out[:] = jnp.where(better, amin, i_out[:])

    return kernel


def _make_occluded_kernel(t_min: float, bt: int):
    def kernel(f_ref, maxt_ref, w_ref, occ_out):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            occ_out[:] = jnp.zeros_like(occ_out)

        out = jnp.dot(f_ref[:], w_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        tt = _epilogue(out, bt, t_min)
        hit = jnp.any(tt < maxt_ref[:], axis=1, keepdims=True)
        occ_out[:] = jnp.maximum(occ_out[:], hit.astype(jnp.int32))

    return kernel


def _pad_rows(x, np_, fill=0.0):
    if x.shape[0] == np_:
        return x
    pad = jnp.full((np_ - x.shape[0],) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad])


@functools.partial(jax.jit, static_argnames=("t_min", "br", "bt",
                                             "interpret"))
def mat_nearest(feats, weights, t_min: float = 1e-4, br: int = 256,
                bt: int = 2048, interpret: bool | None = None):
    """Nearest hit over the weight table → (t_approx [N] f32, idx [N] i32).

    feats from ray_features; weights/center from build_tri_weights. The
    returned t is the SEARCH's value (matmul-associated fp) — callers wanting
    the canonical fp distance recompute from idx (MatTracer.nearest does).
    """
    interpret = _auto_interpret() if interpret is None else interpret
    n = feats.shape[0]
    np_ = _cdiv(n, br) * br
    feats = _pad_rows(feats, np_)
    tp4 = weights.shape[1]
    grid = (np_ // br, tp4 // (4 * bt))

    f_spec = pl.BlockSpec((br, _F), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((_F, 4 * bt), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    t_out, i_out = pl.pallas_call(
        _make_nearest_kernel(t_min, bt),
        grid=grid,
        in_specs=[f_spec, w_spec],
        out_specs=(o_spec, o_spec),
        out_shape=(jax.ShapeDtypeStruct((np_, 1), jnp.float32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.int32)),
        interpret=interpret,
    )(feats, weights)
    return t_out[:n, 0], i_out[:n, 0]


@functools.partial(jax.jit, static_argnames=("t_min", "br", "bt",
                                             "interpret"))
def mat_occluded(feats, max_t, weights, t_min: float = 1e-4, br: int = 256,
                 bt: int = 2048, interpret: bool | None = None):
    """Any-hit with t in (t_min, max_t) per ray → bool [N]."""
    interpret = _auto_interpret() if interpret is None else interpret
    n = feats.shape[0]
    np_ = _cdiv(n, br) * br
    feats = _pad_rows(feats, np_)
    maxt = _pad_rows(max_t.reshape(-1, 1), np_)
    tp4 = weights.shape[1]
    grid = (np_ // br, tp4 // (4 * bt))

    f_spec = pl.BlockSpec((br, _F), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((_F, 4 * bt), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        _make_occluded_kernel(t_min, bt),
        grid=grid,
        in_specs=[f_spec, m_spec, w_spec],
        out_specs=m_spec,
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        interpret=interpret,
    )(feats, maxt, weights)
    return occ[:n, 0] > 0


class MatTracer:
    """Drop-in tracer: MXU matmul triangle sweep + jnp spheres/planes.

    Nearest hits are FINALIZED: the search's winner id indexes the exact
    triangle SoA and `geometry.triangle_tuv` recomputes the canonical f32
    hit distance (one gather per lane per trace — not per walk iteration),
    so Hit.t matches the brute/scan backends bitwise off knife edges.
    """

    def __init__(self, scene, br: int = 256, bt: int = 2048):
        from raytracer_tpu.core.types import as_jax

        self._scene = as_jax(scene)
        v0, e1, e2 = self._scene.meshes.tri_soa()
        w, c = build_tri_weights(np.asarray(v0), np.asarray(e1),
                                 np.asarray(e2), bt)
        self._w = jax.lax.stop_gradient(w)
        self._center = jax.lax.stop_gradient(c)
        self._soa = jax.lax.stop_gradient(
            (jnp.asarray(v0, jnp.float32), jnp.asarray(e1, jnp.float32),
             jnp.asarray(e2, jnp.float32)))
        self._br = br
        self._bt = bt
        self._n_tris = int(scene.meshes.count)

    @staticmethod
    def build(scene, br: int = 256, bt: int = 2048):
        return MatTracer(scene, br=br, bt=bt)

    def _finalize(self, orig, direc, tb, ib, t_min):
        """Exact-MT recompute of the winner's t (canonical fp value)."""
        v0, e1, e2 = self._soa
        hit = jnp.isfinite(tb)
        idx = jnp.where(hit, ib, 0)
        te, _, _ = geom.triangle_tuv(orig, direc, v0[idx], e1[idx], e2[idx],
                                     t_min)
        return jnp.where(hit & jnp.isfinite(te), te, jnp.inf)

    def nearest(self, orig, direc, t_min, tri_chunk, active=None):
        del active  # static kernel grid — masking saves nothing
        from raytracer_tpu.core.types import KIND_TRIANGLE, Meshes
        from raytracer_tpu.ops import trace as trace_ops

        orig = jax.lax.stop_gradient(orig)
        direc = jax.lax.stop_gradient(direc)
        base = trace_ops.nearest_hit(
            self._scene.replace(meshes=Meshes.empty()), orig, direc, t_min,
            tri_chunk)
        feats = ray_features(orig, direc, self._center)
        tb, ib = mat_nearest(feats, self._w, t_min=t_min, br=self._br,
                             bt=self._bt)
        tb = self._finalize(orig, direc, tb, ib, t_min)
        better = tb < base.t
        return trace_ops.Hit(
            kind=jnp.where(better, KIND_TRIANGLE, base.kind),
            idx=jnp.where(better, ib, base.idx),
            t=jnp.where(better, tb, base.t))

    def occluded(self, orig, direc, max_t, t_min, tri_chunk, active=None):
        del active
        from raytracer_tpu.core.types import Meshes
        from raytracer_tpu.ops import trace as trace_ops

        orig = jax.lax.stop_gradient(orig)
        direc = jax.lax.stop_gradient(direc)
        max_t = jax.lax.stop_gradient(max_t)
        occ = trace_ops.occluded(self._scene.replace(meshes=Meshes.empty()),
                                 orig, direc, max_t, t_min, tri_chunk)
        feats = ray_features(orig, direc, self._center)
        return occ | mat_occluded(feats, max_t, self._w, t_min=t_min,
                                  br=self._br, bt=self._bt)


jax.tree_util.register_pytree_node(
    MatTracer,
    lambda tr: ((tr._scene, tr._w, tr._center, tr._soa),
                (tr._br, tr._bt, tr._n_tris)),
    lambda aux, ch: _mat_tracer_unflatten(aux, ch))


def _mat_tracer_unflatten(aux, children):
    obj = MatTracer.__new__(MatTracer)
    obj._scene, obj._w, obj._center, obj._soa = children
    obj._br, obj._bt, obj._n_tris = aux
    return obj
