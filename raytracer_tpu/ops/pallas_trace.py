"""Pallas TPU megakernels for the triangle hot loop (BASELINE.json:5
"batched Pallas kernels over megakernel-style ray wavefronts").

Reference analog: the `trace()` × `rayTriangleIntersect` inner hot loop
(SURVEY.md §3.1). Layout strategy:

- rays enter as six [N,1] column vectors (sublane-major) so a ray block is
  [BR,1] and broadcasts against triangle rows [1,BT] into [BR,BT] VPU tiles;
- triangles enter as a single [9,T] planar SoA (rows v0|e1|e2 × xyz), so one
  sublane slice yields each component as [1,BT];
- grid = (ray_tiles, tri_tiles), triangle axis innermost; the output block
  index map ignores the triangle index, so the running (best_t, best_idx)
  accumulators stay resident in VMEM across the whole triangle sweep
  (matmul-k-loop pattern);
- misses are +inf; the cross-tile fold is a min + select, identical in fp
  semantics to the XLA scan path (ops/trace.py), so both backends agree
  bitwise and the winner search remains integer-residual + stop-gradient.

The kernels are search-only (no gradients flow; surface_at recomputes the
winner differentiably), so interpret=True runs them in CI on CPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DET_EPS = 1e-8
_INTERPRET = None  # None = auto (interpret off TPU); tests force True


def _auto_interpret() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    return jax.default_backend() != "tpu"  # Mosaic lowering needs a real TPU


def _cdiv(a, b):
    return -(-a // b)


def _mt_tile(o, d, tri, t_min):
    """Möller–Trumbore on a [BR,1] ray block × [1,BT] triangle block → t [BR,BT].

    o, d: tuples of [BR,1] components; tri: [9,BT] ref-read array.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z = tri[0:1, :], tri[1:2, :], tri[2:3, :]
    e1x, e1y, e1z = tri[3:4, :], tri[4:5, :], tri[5:6, :]
    e2x, e2y, e2z = tri[6:7, :], tri[7:8, :], tri[8:9, :]

    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = jnp.abs(det) > DET_EPS
    inv = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > t_min)
    return jnp.where(ok, t, jnp.inf)


def _make_nearest_kernel(t_min: float, bt: int):
    def kernel(ox, oy, oz, dx, dy, dz, tri, t_out, i_out):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            t_out[:] = jnp.full_like(t_out, jnp.inf)
            i_out[:] = jnp.full_like(i_out, 0)

        tt = _mt_tile((ox[:], oy[:], oz[:]), (dx[:], dy[:], dz[:]), tri[:],
                      t_min)
        tmin = jnp.min(tt, axis=1, keepdims=True)            # [BR,1]
        amin = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None] + j * bt
        better = tmin < t_out[:]
        t_out[:] = jnp.where(better, tmin, t_out[:])
        i_out[:] = jnp.where(better, amin, i_out[:])

    return kernel


def _make_occluded_kernel(t_min: float):
    def kernel(ox, oy, oz, dx, dy, dz, maxt, tri, occ_out):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            occ_out[:] = jnp.zeros_like(occ_out)

        tt = _mt_tile((ox[:], oy[:], oz[:]), (dx[:], dy[:], dz[:]), tri[:],
                      t_min)
        hit = jnp.any(tt < maxt[:], axis=1, keepdims=True).astype(jnp.int32)
        occ_out[:] = jnp.maximum(occ_out[:], hit)

    return kernel


def _prep_rays(orig, direc, br):
    """[N,3]×2 → six [Np,1] column arrays, N padded to a BR multiple with rays
    that never hit (dir 0 ⇒ det 0 for every triangle)."""
    n = orig.shape[0]
    np_ = _cdiv(n, br) * br
    pad = np_ - n
    if pad:
        orig = jnp.concatenate([orig, jnp.zeros((pad, 3), orig.dtype)])
        direc = jnp.concatenate([direc, jnp.zeros((pad, 3), direc.dtype)])
    cols = [orig[:, k:k + 1] for k in range(3)] + \
           [direc[:, k:k + 1] for k in range(3)]
    return cols, n, np_


def pack_tris(v0, e1, e2, bt: int = 512):
    """Triangle SoA → [9, Tp] planar (BT-padded with degenerate triangles)."""
    t = v0.shape[0]
    tp = max(_cdiv(t, bt), 1) * bt
    planar = jnp.zeros((9, tp), jnp.float32)
    rows = jnp.concatenate([jnp.asarray(v0, jnp.float32).T,
                            jnp.asarray(e1, jnp.float32).T,
                            jnp.asarray(e2, jnp.float32).T], axis=0)
    return planar.at[:, :t].set(rows)


@functools.partial(jax.jit, static_argnames=("t_min", "br", "bt", "interpret"))
def tri_nearest(orig, direc, tri_planar, t_min: float = 1e-4, br: int = 256,
                bt: int = 512, interpret: bool | None = None):
    """Nearest triangle hit over all rays → (t [N] f32 +inf-miss, idx [N] i32).

    tri_planar: [9, Tp] from pack_tris (Tp a multiple of bt).
    """
    interpret = _auto_interpret() if interpret is None else interpret
    cols, n, np_ = _prep_rays(orig, direc, br)
    tp = tri_planar.shape[1]
    grid = (np_ // br, tp // bt)

    ray_spec = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((9, bt), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    t_out, i_out = pl.pallas_call(
        _make_nearest_kernel(t_min, bt),
        grid=grid,
        in_specs=[ray_spec] * 6 + [tri_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((np_, 1), jnp.float32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.int32)),
        interpret=interpret,
    )(*cols, tri_planar)
    return t_out[:n, 0], i_out[:n, 0]


@functools.partial(jax.jit, static_argnames=("t_min", "br", "bt", "interpret"))
def tri_occluded(orig, direc, max_t, tri_planar, t_min: float = 1e-4,
                 br: int = 256, bt: int = 512, interpret: bool | None = None):
    """Any-hit with t in (t_min, max_t) per ray → bool [N]."""
    interpret = _auto_interpret() if interpret is None else interpret
    cols, n, np_ = _prep_rays(orig, direc, br)
    maxt = max_t.reshape(-1, 1)
    if maxt.shape[0] != np_:
        maxt = jnp.concatenate(
            [maxt, jnp.zeros((np_ - maxt.shape[0], 1), maxt.dtype)])
    tp = tri_planar.shape[1]
    grid = (np_ // br, tp // bt)

    ray_spec = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((9, bt), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    occ = pl.pallas_call(
        _make_occluded_kernel(t_min),
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        interpret=interpret,
    )(*cols, maxt, tri_planar)
    return occ[:n, 0] > 0


class PallasTracer:
    """Drop-in tracer: Pallas megakernel triangles + jnp spheres/planes."""

    def __init__(self, scene, br: int = 256, bt: int = 512):
        from raytracer_tpu.core.types import as_jax

        self._scene = as_jax(scene)
        v0, e1, e2 = self._scene.meshes.tri_soa()
        self._tri = jax.lax.stop_gradient(pack_tris(v0, e1, e2, bt))
        self._br = br
        self._bt = bt
        self._n_tris = int(scene.meshes.count)

    def nearest(self, orig, direc, t_min, tri_chunk, active=None):
        # `active` ignored: the Pallas megakernel's grid is static, masking
        # lanes saves nothing (see ops/trace.nearest_hit).
        del active
        from raytracer_tpu.core.types import KIND_TRIANGLE, Meshes
        from raytracer_tpu.ops import trace as trace_ops

        orig = jax.lax.stop_gradient(orig)
        direc = jax.lax.stop_gradient(direc)
        base = trace_ops.nearest_hit(
            self._scene.replace(meshes=Meshes.empty()), orig, direc, t_min,
            tri_chunk)
        tb, ib = tri_nearest(orig, direc, self._tri, t_min=t_min, br=self._br,
                             bt=self._bt)
        better = tb < base.t
        return trace_ops.Hit(
            kind=jnp.where(better, KIND_TRIANGLE, base.kind),
            idx=jnp.where(better, ib, base.idx),
            t=jnp.where(better, tb, base.t))

    def occluded(self, orig, direc, max_t, t_min, tri_chunk, active=None):
        del active  # static Pallas grid — see nearest()
        from raytracer_tpu.core.types import Meshes
        from raytracer_tpu.ops import trace as trace_ops

        orig = jax.lax.stop_gradient(orig)
        direc = jax.lax.stop_gradient(direc)
        max_t = jax.lax.stop_gradient(max_t)
        occ = trace_ops.occluded(self._scene.replace(meshes=Meshes.empty()),
                                 orig, direc, max_t, t_min, tri_chunk)
        return occ | tri_occluded(orig, direc, max_t, self._tri, t_min=t_min,
                                  br=self._br, bt=self._bt)


jax.tree_util.register_pytree_node(
    PallasTracer,
    lambda tr: ((tr._scene, tr._tri), (tr._br, tr._bt, tr._n_tris)),
    lambda aux, ch: _pallas_tracer_unflatten(aux, ch))


def _pallas_tracer_unflatten(aux, children):
    obj = PallasTracer.__new__(PallasTracer)
    obj._scene, obj._tri = children
    obj._br, obj._bt, obj._n_tris = aux
    return obj
