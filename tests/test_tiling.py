"""Tiling geometry tests, pinned to hand-computed values from the reference
semantics (/root/reference/model.py:116-179, SURVEY.md section 3.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from srgd_tpu.diffusion.base import pick_chunk
from srgd_tpu.tiling import (
    area_of, extract_tiles, grid_coords, make_geometry, pad_geometry,
    reflect_pad, scatter_tiles, space_to_tiles, tiles_to_space, zero_margin,
)


def test_pick_chunk():
    assert pick_chunk(64, 16) == 16      # exact, sublane-aligned
    assert pick_chunk(64, 9) == 8        # aligned divisor beats odd cap
    assert pick_chunk(81, 9) == 9        # no aligned divisor -> cap + pad
    assert pick_chunk(81, 8) == 8        # 81 has no even divisor -> pad
    assert pick_chunk(4, 8) == 4         # fewer tiles than cap
    assert pick_chunk(25, 8) == 8        # odd divisor 5 rejected -> pad
    assert pick_chunk(1, 8) == 1


def test_pad_geometry_small():
    coord, pad = pad_geometry(200, 180, 256)
    left, top, right, bottom = coord
    assert (right - left, bottom - top) == (180, 200)
    assert left == (256 - 180) // 2 and top == (256 - 200) // 2
    assert pad == (38, 38, 28, 28)


def test_pad_geometry_2048():
    # 512px LR -> x4 -> 2048 -> padded 2304 (SURVEY/BASELINE worked example)
    coord, pad = pad_geometry(2048, 2048, 256)
    assert pad == (128, 128, 128, 128)
    assert coord == (128, 128, 128 + 2048, 128 + 2048)


def test_pad_geometry_odd():
    coord, pad = pad_geometry(300, 500, 256)
    # new = ((d-1)//256+1)*256 + 256
    assert 300 + pad[2] + pad[3] == 768
    assert 500 + pad[0] + pad[1] == 768


def test_grid_coords_counts():
    c0 = grid_coords(2304, 2304, 256, 256, diff=0)
    assert len(c0) == 81
    assert c0[0] == (0, 256, 0, 256) and c0[-1] == (2048, 2304, 2048, 2304)
    c1 = grid_coords(2304 - 256, 2304 - 256, 256, 256, diff=128)
    assert len(c1) == 64
    assert c1[0] == (128, 384, 128, 384) and c1[-1] == (1920, 2176, 1920, 2176)


def test_area_of_matches_interior():
    c1 = grid_coords(2048, 2048, 256, 256, diff=128)
    coord, pad = area_of(c1, 2304, 2304)
    assert coord == (128, 128, 2176, 2176)
    assert pad == (128, 128, 128, 128)


def test_make_geometry_large():
    g = make_geometry(2048, 2048, 256)
    assert (g.padded_h, g.padded_w) == (2304, 2304)
    assert g.grid_even == (9, 9) and g.grid_odd == (8, 8)
    assert g.n_tiles_even == 81 and g.n_tiles_odd == 64
    assert g.interior == (128, 128, 2176, 2176)
    assert g.has_margin


def test_make_geometry_small():
    g = make_geometry(128, 200, 256)
    assert (g.padded_h, g.padded_w) == (256, 256)
    assert g.grid_even == (1, 1) and g.grid_odd == (1, 1)
    assert not g.has_margin


def test_space_to_tiles_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 512, 768, 3)).astype(np.float32))
    t = space_to_tiles(x, 256)
    assert t.shape == (2 * 2 * 3, 256, 256, 3)
    back = tiles_to_space(t, 2, 512, 768)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_tiles_match_reference_coords():
    """Tile extraction order must equal the reference's row-major coord loop."""
    rng = np.random.default_rng(1)
    x_np = rng.normal(size=(1, 768, 768, 3)).astype(np.float32)
    x = jnp.asarray(x_np)
    g = make_geometry(500, 500, 256)
    assert (g.padded_h, g.padded_w) == (768, 768)

    tiles0 = np.asarray(extract_tiles(x, g, parity=0))
    coords0 = grid_coords(768, 768, 256, 256, diff=0)
    for idx, (hs, he, ws, we) in enumerate(coords0):
        np.testing.assert_array_equal(tiles0[idx], x_np[0, hs:he, ws:we])

    tiles1 = np.asarray(extract_tiles(x, g, parity=1))
    coords1 = grid_coords(768 - 256, 768 - 256, 256, 256, diff=128)
    for idx, (hs, he, ws, we) in enumerate(coords1):
        np.testing.assert_array_equal(tiles1[idx], x_np[0, hs:he, ws:we])


def test_scatter_inverse_of_extract():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 768, 768, 3)).astype(np.float32))
    g = make_geometry(500, 500, 256)
    for parity in (0, 1):
        tiles = extract_tiles(x, g, parity)
        out = scatter_tiles(x, tiles, g, parity)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_scatter_margin_untouched():
    rng = np.random.default_rng(3)
    canvas = jnp.asarray(rng.normal(size=(1, 768, 768, 3)).astype(np.float32))
    g = make_geometry(500, 500, 256)
    tiles = jnp.zeros((g.n_tiles_odd, 256, 256, 3), jnp.float32)
    out = np.asarray(scatter_tiles(canvas, tiles, g, parity=1))
    it, il, ib, ir = g.interior
    assert np.all(out[:, it:ib, il:ir] == 0)
    np.testing.assert_array_equal(out[:, :it, :], np.asarray(canvas)[:, :it, :])
    np.testing.assert_array_equal(out[:, :, ir:], np.asarray(canvas)[:, :, ir:])


def test_reflect_pad_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 40, 50, 3)).astype(np.float32)
    pad = (10, 12, 7, 9)  # l, r, t, b
    ours = np.asarray(reflect_pad(jnp.asarray(x), pad))
    theirs = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), pad, mode='reflect')
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_zero_margin():
    g = make_geometry(500, 500, 256)
    x = jnp.ones((1, 768, 768, 3), jnp.float32)
    out = np.asarray(zero_margin(x, g))
    it, il, ib, ir = g.interior
    assert np.all(out[:, it:ib, il:ir] == 1)
    assert np.all(out[:, :it] == 0) and np.all(out[:, ib:] == 0)
    assert np.all(out[:, :, :il] == 0) and np.all(out[:, :, ir:] == 0)


def test_stride_bounds():
    with pytest.raises(ValueError):
        make_geometry(700, 700, 256, tile_stride=0)
    with pytest.raises(ValueError):
        # stride > tile_size leaves never-denoised gaps in the odd grid
        make_geometry(700, 700, 256, tile_stride=384)


def test_stride_geometry_matches_reference_coords():
    """Overlapping odd grid = reference get_coords(h-ts, w-ts, ts, stride,
    diff=ts/2) (model.py:3333), incl. the remainder tile; even grid and
    interior bounds are stride-independent (model.py:3329, get_area)."""
    for h, w, stride in [(700, 700, 128), (700, 1000, 96), (300, 300, 160)]:
        g = make_geometry(h, w, 256, tile_stride=stride)
        g_full = make_geometry(h, w, 256)
        assert g.grid_even == g_full.grid_even
        assert g.interior == g_full.interior
        expect = grid_coords(g.padded_h - 256, g.padded_w - 256, 256,
                             stride, diff=128)
        assert list(g.coords_odd) == expect
        assert g.n_tiles_odd == len(expect)
        # every coord inside the interior, far edges pinned by the remainder
        it, il, ib, ir = g.interior
        assert min(c[0] for c in g.coords_odd) == it
        assert max(c[1] for c in g.coords_odd) == ib
        assert min(c[2] for c in g.coords_odd) == il
        assert max(c[3] for c in g.coords_odd) == ir
    # stride == tile_size keeps the remainder-free reshape grid
    assert make_geometry(700, 700, 256, tile_stride=256).coords_odd is None
    # single-tile canvas: stride is irrelevant (model.py:3330-3331)
    g1 = make_geometry(200, 200, 256, tile_stride=64)
    assert g1.coords_odd is None and g1.n_tiles_odd == 1


def test_stride_scatter_inverse_of_extract():
    """With overlap, scatter(extract(x)) == x on the interior: each pixel's
    last-writing tile read it from the same canvas."""
    g = make_geometry(700, 700, 256, tile_stride=128)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, g.padded_h, g.padded_w, 3))
                    .astype(np.float32))
    tiles = extract_tiles(x, g, parity=1)
    assert tiles.shape == (2 * g.n_tiles_odd, 256, 256, 3)
    out = np.asarray(scatter_tiles(x, tiles, g, parity=1))
    np.testing.assert_array_equal(out, np.asarray(x))


def test_stride_scatter_last_write_wins():
    """Row-major ordered writes: overlap pixels hold the LATER tile's value,
    matching the reference's sequential writeback (model.py:3378-3381)."""
    g = make_geometry(700, 700, 256, tile_stride=128)
    n = g.n_tiles_odd
    canvas = jnp.full((1, g.padded_h, g.padded_w, 1), -1.0, jnp.float32)
    tiles = jnp.broadcast_to(
        jnp.arange(1, n + 1, dtype=jnp.float32)[:, None, None, None],
        (n, 256, 256, 1))
    out = np.asarray(scatter_tiles(canvas, tiles, g, parity=1))[0, :, :, 0]
    # emulate the write order on the host
    expect = np.full((g.padded_h, g.padded_w), -1.0, np.float32)
    for i, (hs, he, ws, we) in enumerate(g.coords_odd):
        expect[hs:he, ws:we] = i + 1
    np.testing.assert_array_equal(out, expect)
    # margin untouched
    it, il, ib, ir = g.interior
    assert np.all(out[:it] == -1) and np.all(out[:, :il] == -1)
