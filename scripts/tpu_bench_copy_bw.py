"""Measure achievable table-roundtrip bandwidth three ways on TPU.

The yz-floor bench (tpu_bench_yz_floor.py) shows one rebin stage ~4.2 ms at
dam scale while its byte count (~650 MB in+out) is ~0.8 ms at peak HBM BW —
and gating the window DMA changes nothing, so the manual double-buffered
window machinery itself is the overhead. This bench asks: what does the SAME
table roundtrip cost via
  xla     a fused XLA elementwise op (p+1) — the compiler's best pipelining
  pallas  an identity pallas kernel with AUTO-pipelined in/out BlockSpecs
  halo    the same plus lead/trail y-halo blocks as EXTRA auto-pipelined
          inputs (8-row blocks via index_map arithmetic, clamped at edges) —
          the proposed replacement for the manual window DMA
If pallas/halo land near the xla number, the rebin stages should move to
auto-pipelined windows.

Usage: [X Y Z K]  (defaults: dam internal 64 64 128 16; k_in = K+4)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.sim import table as T
from blub_tpu.sim.slot_major import NUM_DYN, NUM_POSQ, from_table

argv = sys.argv[1:]
G = tuple(int(v) for v in (argv[:3] or (64, 64, 128)))
K = int(argv[3]) if len(argv) > 3 else 16
N = 20

pos = add_fluid_cube(G, (1, 1, 1), (G[0] // 2, G[1] // 2, G[2] - 1), 10**9)
sm0 = from_table(T.from_positions(pos, G, K))
pad = 4
posq0 = jnp.concatenate(
    [sm0.posq, jnp.zeros((pad,) + sm0.posq.shape[1:], jnp.float32)]
)
dyn0 = jnp.concatenate(
    [sm0.dyn, jnp.zeros((pad,) + sm0.dyn.shape[1:], jnp.float32)]
)
k_in, _, X, Y, Zp = posq0.shape
bx, by = 2, 32
nb = by // 8
gbytes = 2 * (posq0.size + dyn0.size) * 4 / 1e9  # read + write per roundtrip
print(f"grid={G} k_in={k_in} blocks=({bx},{by}) roundtrip GB={gbytes:.3f}",
      flush=True)


def chain(step):
    def run(p, d):
        out, _ = jax.lax.scan(lambda c, _: (step(c[0], c[1]), None), (p, d),
                              None, length=N)
        return out
    return jax.jit(run)


def xla_step(p, d):
    return p + 1.0, d + 1.0


def _id_kernel(pin, din, pout, dout):
    pout[...] = pin[...] + 1.0
    dout[...] = din[...] + 1.0


def pallas_step(p, d):
    return tuple(pl.pallas_call(
        _id_kernel,
        grid=(X // bx, Y // by),
        in_specs=[
            pl.BlockSpec((k_in, NUM_POSQ, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)),
            pl.BlockSpec((k_in, NUM_DYN, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((k_in, NUM_POSQ, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)),
            pl.BlockSpec((k_in, NUM_DYN, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, jnp.float32),
            jax.ShapeDtypeStruct(d.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(p, d))


def _halo_kernel(pin, din, plead, ptrail, pout, dout):
    # consume the halo blocks so their fetches can't be elided; the real
    # pack would read them as the window's lead/trail rows
    pout[...] = pin[...] + plead[:, :, :, :1] * 0.0 + ptrail[:, :, :, :1] * 0.0
    dout[...] = din[...] + 1.0


def halo_step(p, d):
    # lead/trail 8-row y-halo blocks as separate auto-pipelined inputs,
    # clamped into range at the edges (the pack masks duplicate rows)
    lead = lambda i, j: (0, 0, i, jnp.maximum(j * nb - 1, 0), 0)
    trail = lambda i, j: (0, 0, i, jnp.minimum(j * nb + nb, Y // 8 - 1), 0)
    return tuple(pl.pallas_call(
        _halo_kernel,
        grid=(X // bx, Y // by),
        in_specs=[
            pl.BlockSpec((k_in, NUM_POSQ, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)),
            pl.BlockSpec((k_in, NUM_DYN, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)),
            pl.BlockSpec((k_in, NUM_POSQ, bx, 8, Zp), lead),
            pl.BlockSpec((k_in, NUM_POSQ, bx, 8, Zp), trail),
        ],
        out_specs=[
            pl.BlockSpec((k_in, NUM_POSQ, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)),
            pl.BlockSpec((k_in, NUM_DYN, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, jnp.float32),
            jax.ShapeDtypeStruct(d.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(p, d, p, p))


def timeit(fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    cs = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.time() - t0) / N * 1e3
    return ms, cs


for name, step in (("xla", xla_step), ("pallas", pallas_step),
                   ("halo", halo_step)):
    ms, cs = timeit(chain(step), posq0, dyn0)
    print(f"{name:7s}: {ms:6.2f} ms  {gbytes / ms * 1e3:6.0f} GB/s"
          f"  (compile {cs:.0f}s)", flush=True)
print("done", flush=True)
