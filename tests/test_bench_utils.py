"""Unit tests for benchmark helpers (no device timing)."""

import dataclasses

from benchmarks.rays_per_sec import BWD_UNIT_BUDGET, _bands
from raytracer_tpu.core.types import RenderOptions


def test_bands_cover_image_exactly():
    for (w, h, d) in [(1920, 1080, 4), (1920, 1080, 2), (256, 256, 0),
                      (1024, 1024, 4), (640, 481, 3)]:
        opts = RenderOptions(width=w, height=h, max_depth=d)
        bands = _bands(opts)
        assert bands[0][0] == 0
        # contiguous, covering, positive
        r = 0
        for r0, rows in bands:
            assert r0 == r and rows > 0
            r += rows
        assert r == h
        # each band under the depth-scaled budget
        for _, rows in bands[:-1]:
            assert rows * w * (d + 1) <= BWD_UNIT_BUDGET


def test_single_band_when_small():
    opts = RenderOptions(width=128, height=128, max_depth=4)
    assert _bands(opts) == [(0, 128)]
