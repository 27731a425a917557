"""Tiling geometry for arbitrary-resolution sampling.

The reference samples megapixel images tile-by-tile on a padded canvas with two
alternating tile grids: an aligned grid on even steps and a half-tile-shifted
grid (interior only) on odd steps, re-noising the uncovered margin after each
odd step (/root/reference/model.py:116-179, 3327-3342, 3392-3396).

TPU-native design: all geometry is computed host-side as static Python ints so
shapes are concrete under jit, and tile gather/scatter is pure reshape/transpose
(the aligned grid is a space-to-tiles reshape; the shifted grid is the same
reshape on a statically-sliced interior). No dynamic slicing in the hot loop.

Padded canvases are always exact multiples of ``tile_size`` (see
``pad_geometry``), so with ``tile_stride == tile_size`` — the only configuration
the reference CLI ever exercises — both grids are exact and remainder-free and
tile gather/scatter is pure reshape.

``tile_stride < tile_size`` (reference library surface, model.py:3288) only
changes the ODD grid: the reference always builds the even grid with
``stride == tile_size`` (model.py:3329) and strides only the shifted interior
grid (model.py:3333), whose tiles then overlap and are written back
sequentially in row-major order — last write wins (model.py:3378-3381).
Here the overlapping grid keeps a static coordinate list in the geometry and
scatters with ordered ``.at[].set`` updates, reproducing the row-major
last-write-wins result. One deliberate divergence (docs/PARITY.md #3): the
reference gathers/scatters in ``batch_size``-sized chunks, so a tile in a
later chunk reads overlap pixels already rewritten by an earlier chunk —
output depends on ``batch_size``. We gather every tile from the step's input
canvas first (equivalent to reference ``batch_size >= n_tiles``), keeping
results chunk-invariant and the forwards batchable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def pad_geometry(height: int, width: int, tile_size: int = 256):
    """Compute the padded canvas size and crop/pad coordinates.

    Parity: ``get_coord_and_pad`` (/root/reference/model.py:116-135).
    Returns ``(coord, pad)`` with coord = (left, top, right, bottom) of the
    original region inside the padded canvas, pad = (l, r, t, b) amounts.
    """
    if height <= tile_size and width <= tile_size:
        new_height, new_width = tile_size, tile_size
    else:
        new_height = ((height - 1) // tile_size + 1) * tile_size + tile_size
        new_width = ((width - 1) // tile_size + 1) * tile_size + tile_size

    left = (new_width - width) // 2
    top = (new_height - height) // 2
    coord = (left, top, left + width, top + height)
    pad = (left, new_width - left - width, top, new_height - top - height)
    return coord, pad


def grid_coords(h: int, w: int, tile_size: int, tile_stride: int, diff: int = 0):
    """Tile coordinate list, parity with ``get_coords``
    (/root/reference/model.py:137-150). Returns [(hs, he, ws, we), ...]."""
    hi_list = list(range(0, h - tile_size + 1, tile_stride))
    if (h - tile_size) % tile_stride != 0:
        hi_list.append(h - tile_size)
    wi_list = list(range(0, w - tile_size + 1, tile_stride))
    if (w - tile_size) % tile_stride != 0:
        wi_list.append(w - tile_size)
    return [(hi + diff, hi + tile_size + diff, wi + diff, wi + tile_size + diff)
            for hi in hi_list for wi in wi_list]


def area_of(coords, height: int, width: int):
    """Bounding box + pad of a coordinate set, parity with ``get_area``
    (/root/reference/model.py:152-179). Returns ((left, top, right, bottom), pad)."""
    top = min(c[0] for c in coords)
    bottom = max(c[1] for c in coords)
    left = min(c[2] for c in coords)
    right = max(c[3] for c in coords)
    pad = (left, width - right, top, height - bottom)
    return (left, top, right, bottom), pad


@dataclass(frozen=True)
class TileGeometry:
    """Static geometry for the alternating-grid tiled sampler."""

    height: int              # input canvas height (pre-pad)
    width: int
    padded_h: int
    padded_w: int
    tile_size: int
    crop: tuple              # (left, top, right, bottom) of original region
    pad: tuple               # (l, r, t, b) reflect-pad amounts
    interior: tuple          # (top, left, bottom, right) covered by the odd grid
    grid_even: tuple         # (gh, gw) tiles on even steps
    grid_odd: tuple          # (gh, gw) tiles on odd steps (interior grid)
    # Overlapping odd grid (tile_stride < tile_size): static (hs, he, ws, we)
    # coordinates in the padded-canvas frame, row-major (= reference write
    # order). None means the stride equals the tile size and the odd grid is
    # the remainder-free reshape grid above.
    coords_odd: tuple | None = None

    @property
    def n_tiles_even(self) -> int:
        return self.grid_even[0] * self.grid_even[1]

    @property
    def n_tiles_odd(self) -> int:
        if self.coords_odd is not None:
            return len(self.coords_odd)
        return self.grid_odd[0] * self.grid_odd[1]

    @property
    def has_margin(self) -> bool:
        it, il, ib, ir = self.interior
        return not (it == 0 and il == 0 and ib == self.padded_h and ir == self.padded_w)


def make_geometry(height: int, width: int, tile_size: int = 256,
                  tile_stride: int | None = None) -> TileGeometry:
    """Build the full static geometry for an input of size (height, width).

    Mirrors the precomputation at /root/reference/model.py:3301-3342 but keeps
    everything as compile-time constants. ``tile_stride`` strides only the
    shifted interior grid (the reference builds the aligned grid with
    ``stride == tile_size`` unconditionally, model.py:3329-3333); strides
    below the tile size make that grid overlap (see module docstring).
    """
    tile_stride = tile_size if tile_stride is None else tile_stride
    if not 0 < tile_stride <= tile_size:
        # stride > tile_size leaves inter-tile gaps the odd step never
        # denoises (the reference would emit raw-noise bands); reject early.
        raise ValueError(
            f'tile_stride must be in [1, tile_size]; got {tile_stride} '
            f'(tile_size {tile_size})')

    coord, pad = pad_geometry(height, width, tile_size)
    padded_h = height + pad[2] + pad[3]
    padded_w = width + pad[0] + pad[1]

    assert padded_h % tile_size == 0 and padded_w % tile_size == 0

    gh, gw = padded_h // tile_size, padded_w // tile_size

    coords_odd = None
    if padded_h <= tile_size and padded_w <= tile_size:
        # single-tile canvas: the reference's coords1 is the same lone tile
        # for every stride (model.py:3330-3331)
        interior = (0, 0, padded_h, padded_w)
        grid_odd = (gh, gw)
    else:
        # shifted grid covers [ts/2, padded - ts/2) in each dim — the
        # remainder tile in grid_coords pins the far edge, so the interior
        # bounds are stride-independent (model.py:3333-3342 via get_area)
        half = tile_size // 2
        interior = (half, half, padded_h - half, padded_w - half)
        grid_odd = (gh - 1, gw - 1)
        if tile_stride != tile_size:
            coords_odd = tuple(grid_coords(
                padded_h - tile_size, padded_w - tile_size,
                tile_size, tile_stride, diff=half))
            # Overlap gather/scatter cost grows ~(tile_size/stride)^2 per
            # step: the gather stacks len(coords_odd) full slabs and the
            # scatter emits one .at[].set per tile, so HLO size scales with
            # the tile count. On big canvases at small strides (e.g. stride
            # 64 on a 2K padded canvas ~ 900 tiles/step) this can exceed the
            # remote-compile relay's HTTP request-size limit (CLAUDE.md)
            # even in host_loop mode — warn so a 413 is diagnosable.
            if len(coords_odd) > 256:
                import warnings
                warnings.warn(
                    f'overlapping tile grid has {len(coords_odd)} tiles/step '
                    f'(tile_size {tile_size}, stride {tile_stride}, canvas '
                    f'{padded_h}x{padded_w}); HLO size scales with the tile '
                    f'count and may exceed the remote-compile request limit '
                    f'on TPU — raise tile_stride if compiles fail (HTTP 413)',
                    stacklevel=2)

    return TileGeometry(
        height=height, width=width,
        padded_h=padded_h, padded_w=padded_w,
        tile_size=tile_size,
        crop=coord, pad=pad,
        interior=interior,
        grid_even=(gh, gw), grid_odd=grid_odd,
        coords_odd=coords_odd,
    )


# ---------------------------------------------------------------------------
# Reshape-based tile gather/scatter (jit-friendly, zero-copy where possible).
# ---------------------------------------------------------------------------

def space_to_tiles(x: jnp.ndarray, tile_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*gh*gw, ts, ts, C); H, W must be multiples of ts."""
    b, h, w, c = x.shape
    gh, gw = h // tile_size, w // tile_size
    x = x.reshape(b, gh, tile_size, gw, tile_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * gh * gw, tile_size, tile_size, c)


def tiles_to_space(tiles: jnp.ndarray, batch: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of ``space_to_tiles``."""
    n, ts, _, c = tiles.shape
    gh, gw = h // ts, w // ts
    x = tiles.reshape(batch, gh, gw, ts, ts, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(batch, h, w, c)


def extract_tiles(x: jnp.ndarray, geom: TileGeometry, parity: int) -> jnp.ndarray:
    """Gather the step's tile batch from the canvas. parity 0 = aligned grid,
    parity 1 = shifted (interior) grid. Tile order is batch-major then
    row-major over the grid — the reference's write order."""
    if parity == 0:
        return space_to_tiles(x, geom.tile_size)
    if geom.coords_odd is not None:
        # overlapping shifted grid: static coords -> plain slices; every tile
        # reads the step's INPUT canvas (chunk-invariant, see module docstring)
        b = x.shape[0]
        ts, c = geom.tile_size, x.shape[-1]
        slabs = [x[:, hs:he, ws:we, :] for hs, he, ws, we in geom.coords_odd]
        return jnp.stack(slabs, axis=1).reshape(b * len(slabs), ts, ts, c)
    it, il, ib, ir = geom.interior
    return space_to_tiles(x[:, it:ib, il:ir, :], geom.tile_size)


def scatter_tiles(canvas: jnp.ndarray, tiles: jnp.ndarray, geom: TileGeometry,
                  parity: int) -> jnp.ndarray:
    """Scatter the step's tile batch back onto the canvas (margin untouched
    for the shifted grid, as in the reference). Overlapping shifted tiles are
    written in row-major order — last write wins, matching the reference's
    sequential writeback (/root/reference/model.py:3378-3381)."""
    b = canvas.shape[0]
    if parity == 0:
        return tiles_to_space(tiles, b, geom.padded_h, geom.padded_w)
    if geom.coords_odd is not None:
        n = len(geom.coords_odd)
        ts, c = geom.tile_size, canvas.shape[-1]
        per_img = tiles.reshape(b, n, ts, ts, c)
        for i, (hs, he, ws, we) in enumerate(geom.coords_odd):
            canvas = canvas.at[:, hs:he, ws:we, :].set(per_img[:, i])
        return canvas
    it, il, ib, ir = geom.interior
    interior = tiles_to_space(tiles, b, ib - it, ir - il)
    return canvas.at[:, it:ib, il:ir, :].set(interior)


def reflect_pad(x: jnp.ndarray, pad: tuple) -> jnp.ndarray:
    """(B, H, W, C) reflect pad with (l, r, t, b), parity with torch
    F.pad(mode='reflect') (/root/reference/model.py:3303)."""
    l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode='reflect')


def zero_margin(x: jnp.ndarray, geom: TileGeometry) -> jnp.ndarray:
    """Zero everything outside the interior region, parity with the
    crop-then-constant-pad of condition_x at /root/reference/model.py:3340-3342."""
    if not geom.has_margin:
        return x
    it, il, ib, ir = geom.interior
    mask = jnp.zeros(x.shape[1:3], dtype=x.dtype)
    mask = mask.at[it:ib, il:ir].set(1.0)
    return x * mask[None, :, :, None]
