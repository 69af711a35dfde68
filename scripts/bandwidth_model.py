"""Analytic HBM-traffic model of one raw fixed-dt slot-major dam step.

VERDICT.md r2 item 4 asked for an achieved-bandwidth figure: bytes moved per
step / measured step time vs the chip's ~819 GB/s HBM peak (TPU v5e), so
"fast" is measurable rather than asserted. This script counts the HBM bytes
each phase of the fused slot-major step (sim/step_dense.py::_step_sm) must
move, assuming perfect VMEM reuse inside each Pallas kernel (each operand
read once from HBM per kernel, each output written once) and XLA fusion of
elementwise chains between kernels (one read per input, one write per rooted
output). That is the program's speed-of-light; dividing by a measured step
time gives achieved bandwidth.

Usage: python scripts/bandwidth_model.py [X Y Z K] [occ_hi]
  X Y Z  internal (post-permutation) grid dims; default dam 64 64 128
  K      slot capacity (default 16)
  occ_hi fraction of blocks where the gated upper slot groups [8, K) actually
         move (occupancy gating, ops/pallas_rebin.py module docstring);
         default 0.10 measured on the dam flow at rest/mid-collapse.

The phase list mirrors step_dense._step_sm's named scopes (fused path):
  ph_advect   advect+x-pack fused kernel: table in (gated windows) +
              3 staggered velocity grids (+4 solid grids when solids ride,
              dam has none) in, k_out-slot mid table out
  ph_rebin2   fused y+z pack: mid table in (gated windows), table out
  ph_p2g      table in (gated windows), 3 vel + 3 weight-count grids out,
              marker by-product (i8-as-f32)
  ph_grid     divergence RHS: 3 vel + marker in, rhs out
  ph_pcg_vel  whole-solve VMEM kernel: grids resident — r/z/s/As + masks in
              once, pressure out once (ops/pallas_pcg.py); per-iteration
              traffic is VMEM, not HBM
  ph_fix      fused remove+extrapolate: 3 vel + marker + pressure in,
              3 vel out
  ph_density  density gather from table windows (gated) + marker in, rhs out
  ph_pcg_den  as ph_pcg_vel
  ph_change   change+extrapolate fused: pressure + marker in, 3 change out
  ph_correct  correct+x-pack fused: table in (gated windows) + 3 change +
              marker in, mid out
  ph_rebin1   fused y+z pack: mid in (gated windows), table out

Grid arrays are f32[X, Y, Zp]; the table is posq f32[K,2,X,Y,Zp] (rel16
cell-relative positions + valid, round 5) + dyn f32[K,6,X,Y,Zp] (vel+affine
bf16-packed into 6 f32 channels) — 32 B/slot.
Windowed kernels re-read halo rows; halos are <=2 of 64-256 rows, so the
model folds them into a 3% overhead factor rather than tracking per-kernel.
"""

import sys

argv = sys.argv[1:]
X, Y, Z = (int(v) for v in (argv[:3] or (64, 64, 128)))
K = int(argv[3]) if len(argv) > 3 else 16
OCC_HI = float(argv[4]) if len(argv) > 4 else 0.10

Zp = (Z + 127) // 128 * 128
cells = X * Y * Zp
G = 4 * cells                       # one f32 grid array, bytes
# gated table bytes: slots [0,8) always move; upper groups move in OCC_HI of
# blocks (ops/pallas_rebin.py::block_group_mask)
k_eff = min(K, 8) + max(K - 8, 0) * OCC_HI


def table(k=None):
    k = k_eff if k is None else k
    return (2 + 6) * G * k          # posq + dyn channels (rel16, round 5)


HALO_OVERHEAD = 1.03

phases = {
    # fused advect + x pack: table in, 3 vel grids in, mid table out (k_out
    # = K + slack margin absorbed by gating on the way back out; use k_eff)
    "ph_advect": table() + 3 * G + table(),
    "ph_rebin2": table() + table(),
    "ph_p2g": table() + 7 * G,       # 3 vel + 3 cnt + marker out
    "ph_grid": 4 * G + G,            # 3 vel + marker in, rhs out
    "ph_pcg_vel": 8 * G,             # resident whole-solve: in once + p out
    "ph_fix": 5 * G + 3 * G,
    "ph_density": table() + G + G,   # table windows + marker in, rhs out
    "ph_pcg_den": 8 * G,
    "ph_change": 2 * G + 3 * G,
    "ph_correct": table() + 4 * G + table(),
    "ph_rebin1": table() + table(),
}

total = sum(phases.values()) * HALO_OVERHEAD
print(f"grid {X}x{Y}x{Zp} K={K} k_eff={k_eff:.1f} "
      f"(upper-group occupancy {OCC_HI:.0%})")
print(f"one f32 grid array: {G / 1e6:.1f} MB; table (gated): "
      f"{table() / 1e6:.1f} MB")
for name, b in phases.items():
    print(f"  {name:12s} {b / 1e6:8.1f} MB")
print(f"total HBM traffic/step: {total / 1e9:.3f} GB (incl. {HALO_OVERHEAD:.0%} halo)")
for ms in (24.5, 15.0, 10.0):
    bw = total / (ms / 1e3) / 1e9
    print(f"  at {ms:5.1f} ms/step: {bw:6.1f} GB/s "
          f"({bw / 819 * 100:4.1f}% of 819 GB/s peak)")
