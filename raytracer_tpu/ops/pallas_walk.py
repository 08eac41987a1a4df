"""Pallas TPU grid-DDA walk kernel — the whole Amanatides–Woo traversal
fused into one kernel per ray block (SURVEY §2.2 "every hot-path component
as a Pallas kernel"; §7.3.1).

Contract: same traversal/tie semantics as `accel.grid.grid_walk` at its
default settings (fanout=1, skip=0) for both nearest-hit and any-hit modes;
hit distances agree to ulp/association noise (rtol ≤ 2e-6) and winner ids
match everywhere except knife-edge candidates within that noise — the SAME
standard the PallasTracer megakernel is held to (tests/test_pallas.py).
True bitwise identity across layout forms is unachievable: XLA contracts
mul+add chains differently per fusion context (measured 1-ulp flips on ~30%
of candidate t's between the [N,C,3]-broadcast and row-major forms of the
IDENTICAL formula, no Pallas involved). The entry state (overflow brute
seed + slab entry + first cell) comes from the shared
`accel.grid.walk_init`, so both backends start from identical state.

Data layout:
- per-ray walk state rides as [n_blocks, BR] planes (one row per block,
  lane-major so the VPU sees 128-lane rows);
- the pregathered cell table is repacked [ncells, R·128] f32 rows
  (R = ceil(C·10/128); columns of v0|e1|e2|id per listed triangle slot,
  zero-padded) and stays in HBM; each iteration DMAs one contiguous row per
  ACTIVE lane into a VMEM scratch block, then evaluates all C candidates as
  lane-major row vectors.

Why this is NOT the shipping default (measured; docs/ARCH.md "Why the DDA
walk stays in XLA"): the candidate fetch is a per-lane scattered row read.
XLA lowers that gather through the TPU's bulk gather machinery at full
width (N rows per while-iteration); a Pallas kernel can only express it as
BR scalar-issued DMA descriptors per block-iteration, and the grid runs
blocks SEQUENTIALLY on the single TensorCore — so the walk degenerates to
(n_blocks × iters) small steps with per-step fixed costs instead of
(iters) full-width vector steps. This kernel exists as the blueprint's
Pallas coverage of the walk, as a correctness cross-check, and as the
fault-isolation fallback (its program shape dodges the ≈3M-unit XLA grid
fault); select it with RT_GRID_WALK=pallas / GridTracer(walk="pallas").
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.accel import grid as grid_mod

DET_EPS = 1e-8
_INTERPRET = None  # None = auto (interpret off TPU); tests force True


def _auto_interpret() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def pack_cell_table(grid: grid_mod.GridData) -> jax.Array:
    """cell_soa [ncells, C, 10] → [ncells, R·128] f32 rows (zero-padded),
    R = ceil(C·10 / 128).

    Requires the pregathered 10-column build (the shipping default). Any
    capacity works: a cell's candidates pack into R consecutive 128-lane
    sublanes fetched by ONE contiguous DMA per lane per iteration, so the
    walk twin keeps running on the same grid as the XLA path after the
    r2-d coarse-grid re-tune (capacity 128 → R=10)."""
    soa = grid.cell_soa
    assert soa is not None and soa.shape[-1] == 10, \
        "pallas walk needs the pregathered 10-col cell_soa (RT_GRID_PREGATHER=1)"
    ncells, cap, _ = soa.shape
    row = soa.reshape(ncells, cap * 10)
    width = _cdiv(cap * 10, 128) * 128
    out = jnp.zeros((ncells, width), jnp.float32)
    return out.at[:, :row.shape[1]].set(row)


def _mt_rows(o, d, v0, e1, e2, t_min):
    """Möller–Trumbore on lane-major rows → t [rows, BR] (+inf miss).

    Same op order as geom.triangle_tuv / pallas_trace._mt_tile so the fold
    is bitwise-identical to the XLA walk's candidate eval.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z = v0
    e1x, e1y, e1z = e1
    e2x, e2y, e2z = e2
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


def _make_walk_kernel(res, capacity: int, n_tris: int, t_min: float,
                      max_iters: int, br: int, occlusion: bool, width: int):
    nx, ny, nz = res

    def kernel(ox, oy, oz, dx, dy, dz, cx0, cy0, cz0, tmx0, tmy0, tmz0,
               sx, sy, sz, tdx, tdy, tdz, act0, bt0, bi0, mx0,
               soa_hbm, t_out, i_out,
               cand, cid_vmem, sem):
        # all row refs are [1, BR]; cand [BR, width] VMEM scratch.
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        step = (sx[:], sy[:], sz[:])
        td = (tdx[:], tdy[:], tdz[:])
        maxt = mx0[:]

        def parked(bt, tmax_min):
            if occlusion:
                return (bt < maxt) | (tmax_min > maxt)
            return bt <= tmax_min

        def cond(state):
            it, cell, tmax, bt, bi, active = state
            return jnp.any(active) & (it < max_iters)

        def body(state):
            it, cell, tmax, bt, bi, active = state
            cx, cy, cz = cell
            tmx, tmy, tmz = tmax
            cid = jnp.where(active, (cx * ny + cy) * nz + cz, 0)

            # per-lane scattered row fetch: BR scalar-indexed DMA descriptors
            cid_vmem[:] = cid

            def fetch(lane, _):
                c = cid_vmem[0, lane]
                row = pltpu.make_async_copy(soa_hbm.at[c], cand.at[lane], sem)
                row.start()
                row.wait()
                return 0

            jax.lax.fori_loop(0, br, fetch, 0)

            candt = cand[:].T  # [128, BR] lane-major candidate planes
            rows = [candt[k:k + 1, :] for k in range(capacity * 10)]
            ts_list, id_list = [], []
            for c in range(capacity):
                r = rows[c * 10:(c + 1) * 10]
                ts_c = _mt_rows(o, d, (r[0], r[1], r[2]), (r[3], r[4], r[5]),
                                (r[6], r[7], r[8]), t_min)
                ts_list.append(ts_c)
                id_list.append(r[9].astype(jnp.int32))
            ts_all = jnp.concatenate(ts_list, axis=0)        # [C, BR]
            ids_all = jnp.concatenate(id_list, axis=0)
            ts_all = jnp.where(active, ts_all, jnp.inf)
            tc = jnp.min(ts_all, axis=0, keepdims=True)      # [1, BR]
            ic = jnp.min(jnp.where(ts_all <= tc, ids_all, n_tris), axis=0,
                         keepdims=True)
            better = (tc < bt) | ((tc == bt) & (ic < bi))
            bt = jnp.where(better, tc, bt)
            bi = jnp.where(better, ic, bi)

            done = parked(bt, jnp.minimum(jnp.minimum(tmx, tmy), tmz))
            may = active & ~done
            # dda advance (argmin tie order x<y<z, like jnp.argmin axis=1)
            m = jnp.minimum(jnp.minimum(tmx, tmy), tmz)
            isx = tmx == m
            isy = ~isx & (tmy == m)
            isz = ~isx & ~isy
            adv = (isx.astype(jnp.int32), isy.astype(jnp.int32),
                   isz.astype(jnp.int32))
            ncell = tuple(cc + a * s for cc, a, s in zip((cx, cy, cz), adv,
                                                         step))
            ntm = tuple(tm + a.astype(tm.dtype) * t
                        for tm, a, t in zip((tmx, tmy, tmz), adv, td))
            out = ((ncell[0] < 0) | (ncell[0] >= nx)
                   | (ncell[1] < 0) | (ncell[1] >= ny)
                   | (ncell[2] < 0) | (ncell[2] >= nz))
            cell = tuple(jnp.where(may, nc, cc)
                         for nc, cc in zip(ncell, (cx, cy, cz)))
            tmax = tuple(jnp.where(may, nt, tm)
                         for nt, tm in zip(ntm, (tmx, tmy, tmz)))
            active = may & ~out
            return it + 1, cell, tmax, bt, bi, active

        state = (jnp.zeros((), jnp.int32),
                 (cx0[:], cy0[:], cz0[:]), (tmx0[:], tmy0[:], tmz0[:]),
                 bt0[:], bi0[:], act0[:] > 0)
        state = jax.lax.while_loop(cond, body, state)
        _, _, _, bt, bi, _ = state
        t_out[:] = bt
        i_out[:] = bi

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "res", "capacity", "n_tris", "t_min", "max_iters", "br", "occlusion",
    "width", "interpret"))
def _walk_call(planes, table, *, res, capacity, n_tris, t_min, max_iters,
               br, occlusion, width, interpret):
    nb = planes[0].shape[0]
    row = pl.BlockSpec((1, br), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t_out, i_out = pl.pallas_call(
        _make_walk_kernel(res, capacity, n_tris, t_min, max_iters, br,
                          occlusion, width),
        grid=(nb,),
        in_specs=[row] * len(planes) + [
            pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(row, row),
        out_shape=(jax.ShapeDtypeStruct((nb, br), jnp.float32),
                   jax.ShapeDtypeStruct((nb, br), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((br, width), jnp.float32),  # candidate rows
            pltpu.VMEM((1, br), jnp.int32),        # cid staging (scalar reads)
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*planes, table)
    return t_out, i_out


def pallas_grid_walk(grid: grid_mod.GridData, table, orig, direc, t_min,
                     occlusion_max_t=None, active=None, br: int = 512,
                     interpret: bool | None = None):
    """Drop-in twin of `accel.grid.grid_walk` (fanout=1, skip=0 semantics)
    running the whole DDA in a Pallas kernel. `table` = pack_cell_table(grid)
    (build once per tracer)."""
    interpret = _auto_interpret() if interpret is None else interpret
    n = orig.shape[0]
    best_t, best_i, cell, tmax, step, tdelta, act = grid_mod.walk_init(
        grid, orig, direc, t_min, active)
    nx, ny, nz = grid.res
    max_iters = nx + ny + nz + 2

    # wide cell rows (post r2-d cap-128 re-tune: 10×128 f32 = 5 KB/cell)
    # shrink the ray block so the candidate scratch stays ≤ ~2.6 MB VMEM
    width = table.shape[1]
    while br > 128 and br * width * 4 > (1 << 22):
        br //= 2

    np_ = _cdiv(n, br) * br
    nb = np_ // br

    def plane(a, fill):
        a = a.reshape(n, -1)
        cols = []
        for k in range(a.shape[1]):
            v = a[:, k]
            if np_ != n:
                v = jnp.concatenate(
                    [v, jnp.full((np_ - n,), fill, v.dtype)])
            cols.append(v.reshape(nb, br))
        return cols

    maxt = (occlusion_max_t if occlusion_max_t is not None
            else jnp.zeros((n,), jnp.float32))
    planes = (plane(orig, 0.0) + plane(direc, 0.0)
              + plane(cell, 0) + plane(tmax, jnp.inf)
              + plane(step, 1) + plane(tdelta, jnp.inf)
              + plane(act.astype(jnp.int32), 0)
              + plane(best_t, jnp.inf)
              + plane(best_i, grid.n_tris)
              + plane(maxt, 0.0))
    t_out, i_out = _walk_call(
        tuple(planes), table, res=grid.res, capacity=grid.capacity,
        n_tris=grid.n_tris, t_min=float(t_min), max_iters=max_iters, br=br,
        occlusion=occlusion_max_t is not None, width=width,
        interpret=interpret)
    return t_out.reshape(-1)[:n], i_out.reshape(-1)[:n]
