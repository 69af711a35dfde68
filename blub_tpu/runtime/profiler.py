"""Per-phase simulation profiling + chrome-trace export.

The analog of the reference's GpuProfiler scopes around every dispatch group
(SURVEY.md §5.1): the jitted step is one fused program, so phase timing runs
each phase as its own jitted call with a forced sync — a profiling mode, not
the production path. Results export as chrome://tracing JSON like the
reference's "Write Chrometrace" button (gui/mod.rs:484-517), and
``trace(path)`` wraps jax.profiler for full XLA traces.
"""

from __future__ import annotations

import contextlib
import json
import pathlib
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> None:
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


class PhaseTimer:
    """Collects named phase durations across steps (ring of samples)."""

    def __init__(self, history: int = 100):
        self.history = history
        self.samples: Dict[str, List[float]] = {}
        self._events: List[dict] = []
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def phase(self, name: str, sync=None, scale: int = 1):
        """`scale`: the body ran the phase that many times (dispatches
        pipeline on-device, amortizing the ~ms per-call tunnel overhead);
        the recorded sample is the per-run mean."""
        start = time.perf_counter()
        yield
        if sync is not None:
            _sync(sync)
        dur = (time.perf_counter() - start) / max(scale, 1)
        self.samples.setdefault(name, [])
        buf = self.samples[name]
        buf.append(dur)
        if len(buf) > self.history:
            del buf[0]
        self._events.append(
            {
                "name": name,
                "ph": "X",
                "ts": (start - self._t0) * 1e6,
                "dur": dur * 1e6,
                "pid": 0,
                "tid": 0,
            }
        )

    def mean_ms(self) -> Dict[str, float]:
        return {k: 1000.0 * float(np.mean(v)) for k, v in self.samples.items()}

    def report(self) -> str:
        rows = sorted(self.mean_ms().items(), key=lambda kv: -kv[1])
        total = sum(v for _, v in rows)
        lines = [f"{'phase':<28}{'ms':>9}  {'%':>5}"]
        for k, v in rows:
            lines.append(f"{k:<28}{v:9.2f}  {100*v/max(total,1e-9):5.1f}")
        lines.append(f"{'total':<28}{total:9.2f}")
        return "\n".join(lines)

    def write_chrometrace(self, path) -> pathlib.Path:
        """Chrome-trace JSON (load via chrome://tracing or Perfetto)."""
        path = pathlib.Path(path)
        path.write_text(json.dumps({"traceEvents": self._events}))
        return path


def profile_step(params, state, solids=None, repeats: int = 3) -> Dict[str, float]:
    """Phase-by-phase timing of one dense simulation step. Returns mean ms per
    phase. Each phase is jitted separately, so totals exceed the fused
    production step — use for *relative* cost attribution."""
    from ..sim.dense_advect import advect_dense, correct_particles_dense
    from ..sim.dense_transfer import (
        density_rhs_from_raw,
        marker_from_table,
        p2g_density_dense,
        p2g_velocity_dense,
    )
    from ..sim.density import position_change_field
    from ..sim.divergence import compute_divergence_rhs, remove_divergence
    from ..sim.extrapolate import extrapolate_velocity
    from ..sim.pressure import solve_pressure
    from ..sim.table import rebin

    occupancy = solids.occupancy if solids is not None else None
    solid_vel = solids.velocity if solids is not None else None
    dt = params.dt

    f_marker = jax.jit(lambda t: marker_from_table(t, occupancy))
    f_p2g = jax.jit(lambda t, m: p2g_velocity_dense(t, m, params.gravity_grid, dt))
    f_div = jax.jit(lambda v, m: compute_divergence_rhs(v, m, solid_vel))
    f_solve = jax.jit(lambda p0, r, m: solve_pressure(p0, r, m, params.solver_vel, dt).pressure)
    f_remove = jax.jit(lambda v, p, m: remove_divergence(v, p, m, solid_vel))
    f_extrap = jax.jit(extrapolate_velocity)
    f_advect = jax.jit(lambda t, v: advect_dense(t, v, occupancy, solid_vel, dt))
    f_rebin2 = jax.jit(lambda t: rebin(t, max_shift=2))
    f_rho = jax.jit(p2g_density_dense)
    f_rho_rhs = jax.jit(lambda d, m: density_rhs_from_raw(d, m, dt))
    f_change = jax.jit(lambda p, m: extrapolate_velocity(position_change_field(p, m, dt), m))
    f_correct = jax.jit(correct_particles_dense)
    f_rebin1 = jax.jit(lambda t: rebin(t, max_shift=1))

    timer = PhaseTimer()
    for _ in range(repeats + 1):  # first pass compiles
        table = state.table
        with timer.phase("marker", sync=None):
            marker = f_marker(table)
            _sync(marker)
        with timer.phase("p2g velocity"):
            vel = f_p2g(table, marker)
            _sync(vel)
        with timer.phase("divergence rhs"):
            rhs = f_div(vel, marker)
            _sync(rhs)
        with timer.phase("pcg velocity"):
            p = f_solve(state.pressure_vel, rhs, marker)
            _sync(p)
        with timer.phase("divergence remove"):
            vel = f_remove(vel, p, marker)
            _sync(vel)
        with timer.phase("extrapolate"):
            vel = f_extrap(vel, marker)
            _sync(vel)
        with timer.phase("advect (g2p+rk4)"):
            table = f_advect(table, vel)
            _sync(table)
        with timer.phase("rebin +-2"):
            table = f_rebin2(table)
            _sync(table)
        with timer.phase("marker 2"):
            marker2 = f_marker(table)
            _sync(marker2)
        with timer.phase("density gather"):
            rho = f_rho(table)
            _sync(rho)
        with timer.phase("density rhs"):
            drhs = f_rho_rhs(rho, marker2)
            _sync(drhs)
        with timer.phase("pcg density"):
            pd = f_solve(state.pressure_den, drhs, marker2)
            _sync(pd)
        with timer.phase("position change"):
            change = f_change(pd, marker2)
            _sync(change)
        with timer.phase("correct particles"):
            table = f_correct(table, change, marker2)
            _sync(table)
        with timer.phase("rebin +-1"):
            table = f_rebin1(table)
            _sync(table)
        if _ == 0:
            timer.samples.clear()  # drop compile pass
    return timer.mean_ms(), timer


def profile_step_sm(params, state, solids=None, repeats: int = 3, inner: int = 8):
    """Phase-by-phase timing of the slot-major (Pallas kernel) step path."""
    from ..ops.pallas_advect import advect_sm_pallas, correct_sm_pallas
    from ..ops.pallas_p2g import p2g_density_pallas, p2g_velocity_density_pallas
    from ..ops.pallas_rebin import rebin_slot_major
    from ..sim.dense_transfer import density_rhs_from_raw
    from ..sim.density import position_change_field
    from ..sim.divergence import compute_divergence_rhs, remove_divergence
    from ..sim.extrapolate import extrapolate_velocity
    from ..sim.pressure import solve_pressure
    from ..sim.sm_phases import marker_from_slot_major

    occupancy = solids.occupancy if solids is not None else None
    solid_vel = solids.velocity if solids is not None else None
    dt = params.dt

    f_marker = jax.jit(lambda t: marker_from_slot_major(t, occupancy))
    f_p2g = jax.jit(
        lambda t, m: p2g_velocity_density_pallas(
            t, m, params.gravity_grid, dt, with_density=False
        )[0]
    )
    f_div = jax.jit(lambda v, m: compute_divergence_rhs(v, m, solid_vel))
    f_solve = jax.jit(lambda p0, r, m: solve_pressure(p0, r, m, params.solver_vel, dt).pressure)
    f_remove = jax.jit(lambda v, p, m: remove_divergence(v, p, m, solid_vel))
    f_extrap = jax.jit(extrapolate_velocity)
    f_advect = jax.jit(lambda t, v: advect_sm_pallas(t, v, occupancy, solid_vel, dt))
    f_rebin2 = jax.jit(lambda t: rebin_slot_major(t, max_shift=2))
    f_rho = jax.jit(p2g_density_pallas)
    f_rho_rhs = jax.jit(lambda d, m: density_rhs_from_raw(d, m, dt))
    f_change = jax.jit(lambda p, m: extrapolate_velocity(position_change_field(p, m, dt), m))
    f_correct = jax.jit(correct_sm_pallas)
    f_rebin1 = jax.jit(lambda t: rebin_slot_major(t, max_shift=1))

    timer = PhaseTimer()
    inner = max(1, int(inner))

    for r in range(repeats + 1):  # first pass compiles (and warms, inner=1)
        n = 1 if r == 0 else inner

        def timed(name, fn, *args):
            # `n` identical dispatches pipeline on-device, amortizing the
            # per-call tunnel overhead (~ms) that would otherwise swamp
            # the cheap grid phases; sync once at the end.
            with timer.phase(name, scale=n):
                for _ in range(n):
                    out = fn(*args)
                _sync(out)
            return out

        table = state.table
        marker = timed("marker", f_marker, table)
        vel = timed("p2g velocity [pallas]", f_p2g, table, marker)
        rhs = timed("divergence rhs", f_div, vel, marker)
        p = timed("pcg velocity", f_solve, state.pressure_vel, rhs, marker)
        vel = timed("divergence remove", f_remove, vel, p, marker)
        vel = timed("extrapolate", f_extrap, vel, marker)
        table = timed("advect (g2p+rk4)", f_advect, table, vel)
        table = timed("rebin +-2 [pallas]", f_rebin2, table)
        marker2 = timed("marker 2", f_marker, table)
        rho = timed("density gather [pallas]", f_rho, table)
        drhs = timed("density rhs", f_rho_rhs, rho, marker2)
        pd = timed("pcg density", f_solve, state.pressure_den, drhs, marker2)
        change = timed("position change", f_change, pd, marker2)
        table = timed("correct particles", f_correct, table, change, marker2)
        table = timed("rebin +-1 [pallas]", f_rebin1, table)
        if r == 0:
            timer.samples.clear()  # drop compile pass
    return timer.mean_ms(), timer


@contextlib.contextmanager
def trace(log_dir: str):
    """Full XLA profiler trace (TensorBoard/Perfetto-compatible)."""
    with jax.profiler.trace(log_dir):
        yield
