"""Shared test utilities."""

import numpy as np


def assert_images_close(got, want, tol=2e-3, max_bad_frac=0.002, name=""):
    """Image comparison tolerant to fp32-vs-fp64 silhouette flips.

    A handful of pixels sit exactly on hit/shadow boundaries where float32
    rounding flips the winner; those differ by O(1). Require: the worst
    `1 - max_bad_frac` quantile within `tol`, and ≤ max_bad_frac of pixels bad.
    """
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    assert got.shape == want.shape, (got.shape, want.shape)
    diff = np.abs(got - want).max(axis=-1)
    bad = diff > tol
    frac = bad.mean()
    assert frac <= max_bad_frac, (
        f"{name}: {frac:.4%} pixels differ by >{tol} "
        f"(max {diff.max():.4f}, mean {diff.mean():.6f})")
