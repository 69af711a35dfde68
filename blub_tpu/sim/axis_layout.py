"""Internal axis permutation: put a lane-friendly grid axis last.

TPU vregs are (8 sublanes, 128 lanes); every `[.., Y, Z]`-trailing array — the
slot-major particle table AND every XLA grid op — is physically padded to
lanes of 128. At the reference's standard scale (128x64x64,
scenes/dam_halfhalf.json) z=64 pads to 128: HALF of every vector register and
half of the table's HBM bytes are wasted (PERF.md round-3 item 1).

Rather than packing (y,z) pairs into lanes inside every kernel, we simulate in
a PERMUTED coordinate system: choose the internal axis order so the last axis
has minimal 128-padding waste (dam: external (128,64,64) -> internal
(64,64,128), zero waste), permute all inputs once at scene build (positions,
gravity, solid voxelizations), and inverse-permute once at host readback.
The simulation core is axis-symmetric, so no kernel changes at all; results
differ from the identity layout only by float summation order (addition
association), not physics. Deviation: the reference has no analog — GPU
texel addressing has no lane dimension.

Constraints honored by `choose_perm`:
  - internal y (sublane axis) % 8 == 0 (Mosaic sublane alignment, the same
    requirement every Pallas kernel already imposes);
  - minimal zpad(c)/c lane waste; ties prefer the identity permutation.
"""

from __future__ import annotations

import dataclasses
from itertools import permutations
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core.types import SimParams, SolidState

Perm = Tuple[int, int, int]

IDENTITY: Perm = (0, 1, 2)


def _zpad(z: int) -> int:
    return max(128, ((z + 127) // 128) * 128)


def choose_perm(grid_dim: Tuple[int, int, int]) -> Perm:
    """Permutation p with internal dims (g[p0], g[p1], g[p2]) minimizing lane
    padding waste, subject to internal-y % 8 == 0. Identity wins ties."""
    best, best_key = IDENTITY, None
    for p in permutations(range(3)):
        a, b, c = (grid_dim[i] for i in p)
        if b % 8:
            continue
        waste = _zpad(c) / c
        # tie-breaks: fewer displaced axes, then lexicographic stability
        key = (waste, p != IDENTITY, p)
        if best_key is None or key < best_key:
            best, best_key = p, key
    return best


def inv_perm(perm: Perm) -> Perm:
    out = [0, 0, 0]
    for i, p in enumerate(perm):
        out[p] = i
    return tuple(out)


def permute_params(params: SimParams, perm: Perm) -> SimParams:
    if perm == IDENTITY:
        return params
    return dataclasses.replace(
        params,
        grid_dim=tuple(params.grid_dim[p] for p in perm),
        gravity_grid=tuple(params.gravity_grid[p] for p in perm),
    )


def permute_positions(pos, perm: Perm):
    """[N,3] position/velocity rows, external -> internal columns."""
    if perm == IDENTITY:
        return pos
    if isinstance(pos, np.ndarray):
        return np.ascontiguousarray(pos[:, list(perm)])
    return pos[:, list(perm)]


def permute_grid(g, perm: Perm):
    """[X,Y,Z] scalar grid, external -> internal axes."""
    return g if perm == IDENTITY else jnp.transpose(g, perm)


def permute_solids(solids: SolidState | None, perm: Perm) -> SolidState | None:
    if solids is None or perm == IDENTITY:
        return solids
    return SolidState(
        occupancy=jnp.transpose(solids.occupancy, perm),
        velocity=jnp.transpose(solids.velocity, perm + (3,))[..., list(perm)],
    )


def unpermute_table(table, perm: Perm):
    """ParticleTable, internal -> external layout: array axes transposed back,
    vector columns reordered, affine rows+cols reordered
    (c[i,j] = dv_i/dx_j transforms as c_ext = c_int[inv][:, inv])."""
    if perm == IDENTITY:
        return table
    inv = list(inv_perm(perm))
    ax = tuple(inv)
    return dataclasses.replace(
        table,
        pos=jnp.transpose(table.pos, ax + (3, 4))[..., inv],
        vel=jnp.transpose(table.vel, ax + (3, 4))[..., inv],
        affine=jnp.transpose(table.affine, ax + (3, 4, 5))[..., inv, :][..., inv],
        valid=jnp.transpose(table.valid, ax + (3,)),
    )
