"""Dense grid helpers: neighbor shifts with zero fill and trilinear sampling.

The reference relies on out-of-bounds texel fetches returning 0 (which decodes
as CELL_SOLID, hybrid_fluid.glsl:21-24); ``shift`` reproduces exactly that
semantics for XLA arrays, so every stencil below behaves identically at the
domain border.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Offset = Tuple[int, int, int]

AXES: Tuple[Offset, ...] = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


def shift(a: jax.Array, offset: Sequence[int], fill=0) -> jax.Array:
    """out[i] = a[i + offset] where in bounds, else ``fill``.

    Implemented as pad+slice so XLA fuses it into surrounding elementwise ops.
    Works for arrays with more than 3 dims (offset applies to leading 3).
    """
    out = a
    for ax, off in enumerate(offset):
        if off == 0:
            continue
        n = out.shape[ax]
        pad = [(0, 0)] * out.ndim
        if off > 0:
            pad[ax] = (0, off)
            out = jnp.pad(out, pad, constant_values=fill)
            out = jax.lax.slice_in_dim(out, off, off + n, axis=ax)
        else:
            pad[ax] = (-off, 0)
            out = jnp.pad(out, pad, constant_values=fill)
            out = jax.lax.slice_in_dim(out, 0, n, axis=ax)
    return out


def border_mask(grid_dim: Tuple[int, int, int]) -> jax.Array:
    """bool[X,Y,Z]: True on the outermost cell ring (the reference marks it
    CELL_SOLID every step, transfer_set_boundary_marker.comp:13-15)."""
    x, y, z = grid_dim
    ix = jax.lax.broadcasted_iota(jnp.int32, grid_dim, 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, grid_dim, 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, grid_dim, 2)
    return (
        (ix == 0) | (ix == x - 1) | (iy == 0) | (iy == y - 1) | (iz == 0) | (iz == z - 1)
    )


def linear_index(idx: jax.Array, grid_dim: Tuple[int, int, int]) -> jax.Array:
    """Flatten integer cell coordinates i32[..., 3] to linear indices (row-major
    over (X, Y, Z), z fastest — matches jnp reshape order)."""
    _, y, z = grid_dim
    return (idx[..., 0] * y + idx[..., 1]) * z + idx[..., 2]


def gather_cells(grid: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather grid values at integer cell coordinates i32[..., 3] (in bounds)."""
    flat = grid.reshape(-1)
    return jnp.take(flat, linear_index(idx, grid.shape[:3]), axis=0)


def sample_trilinear_clamped(grid: jax.Array, q: jax.Array) -> jax.Array:
    """Trilinear sample at index-space positions ``q`` f32[N,3] with
    clamp-to-edge semantics (GL SamplerTrilinearClamp: value at integer index i
    is the texel centered at i; q already has the -0.5 texel-center shift
    applied by the caller)."""
    dim = jnp.asarray(grid.shape[:3], jnp.int32)
    lo = jnp.floor(q)
    f = q - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, dim - 1)
    hi_i = jnp.clip(lo.astype(jnp.int32) + 1, 0, dim - 1)

    def corner(sel):
        c = jnp.stack([jnp.where(sel[a], hi_i[..., a], lo_i[..., a]) for a in range(3)], axis=-1)
        w = 1.0
        for a in range(3):
            w = w * (f[..., a] if sel[a] else (1.0 - f[..., a]))
        return gather_cells(grid, c) * w

    out = 0.0
    for sx in (False, True):
        for sy in (False, True):
            for sz in (False, True):
                out = out + corner((sx, sy, sz))
    return out
