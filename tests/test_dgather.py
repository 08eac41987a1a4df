"""pgather (scatter-free small-table gather VJP) — ops/dgather.py.

Forward must be bitwise `table[idx]`; backward must match the native gather
VJP (a scatter-add) up to summation association over lanes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.ops.dgather import SMALL_TABLE_ROWS, pgather


@pytest.mark.parametrize("k,cols", [(3, 3), (16, 3), (5, None)])
def test_forward_bitwise(k, cols):
    rng = np.random.default_rng(0)
    shape = (k, cols) if cols else (k,)
    table = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, k, 4096, dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(pgather(table, idx)),
                                  np.asarray(table[idx]))


@pytest.mark.parametrize("k,cols", [(3, 3), (16, 3), (5, None)])
def test_grad_matches_native(k, cols):
    rng = np.random.default_rng(1)
    shape = (k, cols) if cols else (k,)
    table = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, k, 4096, dtype=np.int32))
    x = jnp.asarray(rng.standard_normal(
        (4096,) + shape[1:]).astype(np.float32))

    g_new = jax.grad(lambda t: jnp.sum((pgather(t, idx) - x) ** 2))(table)
    g_ref = jax.grad(lambda t: jnp.sum((t[idx] - x) ** 2))(table)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=2e-5, atol=1e-4)


def test_big_table_and_int_fall_back_to_native_gather():
    table = jnp.zeros((SMALL_TABLE_ROWS + 1, 3), jnp.float32)
    idx = jnp.zeros((8,), jnp.int32)
    # big table: still differentiable (native path), same values
    g = jax.grad(lambda t: pgather(t, idx).sum())(table)
    assert float(g[0, 0]) == 8.0
    itab = jnp.arange(10, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(pgather(itab, idx)),
                                  np.zeros(8, np.int32))


def test_jit_and_vmap_compose():
    table = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    idx = jnp.asarray([0, 3, 1], jnp.int32)

    @jax.jit
    def f(t):
        return pgather(t, idx).sum()

    v, g = jax.value_and_grad(f)(table)
    assert float(v) == float(table[idx].sum())
    np.testing.assert_array_equal(
        np.asarray(g), np.asarray(jax.grad(lambda t: t[idx].sum())(table)))
