"""Rebin cost breakdown on the real TPU at dam internal scale.

Times chained (lax.scan) rebin+jiggle programs so per-call dispatch overhead
amortizes away; subtracts the jiggle-only chain. Movement amplitude sweeps
from 0 (pure copy-through = the DMA + copy floor) to 1.9 (worst case, every
particle a mover). Usage: [X Y Z K] [quick]

`quick` sweeps only the production config (s=2, slack=4) at amps 0/0.3/1.9 —
3 compiles instead of 17, for kernel-edit iteration.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.ops.pallas_rebin import rebin_slot_major, supports
from blub_tpu.sim import table as T
from blub_tpu.sim.slot_major import (
    CH_XY,
    CH_ZV,
    from_table,
    pack_posq,
    pos_to_rel,
    quantize_pos,
    rel_to_pos,
    unpack_posq,
)

QUICK = "quick" in sys.argv
argv = [a for a in sys.argv[1:] if a != "quick"]
G = tuple(int(v) for v in (argv[:3] or (64, 64, 128)))
K = int(argv[3]) if len(argv) > 3 else 16
N = 20  # chain length

print(f"grid={G} K={K} supports={supports(G, K, 2)}", flush=True)

pos = add_fluid_cube(G, (1, 1, 1), (G[0] // 2, G[1] // 2, G[2] - 1), 10**9)
sm0 = from_table(T.from_positions(pos, G, K))
print(f"particles={pos.shape[0]}", flush=True)


def jiggle(sm, i, amp):
    """Deterministic pseudo-random position delta, |delta| <= amp per axis
    (rel16 decode -> move -> quantize -> re-encode)."""
    posq = sm.posq
    rx, ry, rz, vbit = unpack_posq(posq[:, CH_XY], posq[:, CH_ZV])
    validb = vbit == 1
    shape = vbit.shape
    rels = []
    for a, r in enumerate((rx, ry, rz)):
        cell = jax.lax.broadcasted_iota(jnp.float32, shape, 1 + a)
        p = rel_to_pos(r, cell)
        d = amp * jnp.sin(p * 17.17 + 3.7 * p * p + i.astype(jnp.float32))
        pq = quantize_pos(jnp.clip(p + d, 1.001, G[a] - 1.001))
        rels.append(jnp.where(validb, pos_to_rel(pq, cell), 0))
    ch0, ch1 = pack_posq(rels[0], rels[1], rels[2], vbit)
    posq = jnp.stack([ch0, ch1], axis=1)
    import dataclasses

    return dataclasses.replace(sm, posq=posq)


def chain(amp, s, slack, with_rebin=True):
    def body(sm, i):
        sm = jiggle(sm, i, amp)
        if with_rebin:
            sm = rebin_slot_major(sm, s, slack=slack)
        return sm, None

    def run(sm):
        out, _ = jax.lax.scan(body, sm, jnp.arange(N))
        return out

    return jax.jit(run)


def timeit(fn, sm):
    t0 = time.time()
    out = fn(sm)
    lost = int(jax.device_get(out.lost))
    compile_s = time.time() - t0
    t0 = time.time()
    out = fn(sm)
    lost = int(jax.device_get(out.lost))
    wall = (time.time() - t0) / N
    return wall * 1e3, compile_s, lost


results = {}
for amp in (0.3,):
    ms, cs, _ = timeit(chain(amp, 2, None, with_rebin=False), sm0)
    results[f"jiggle_only amp={amp}"] = ms
    print(f"jiggle_only amp={amp}: {ms:.2f} ms (compile {cs:.0f}s)", flush=True)
jig = results["jiggle_only amp=0.3"]

for s, slack in ((2, 4),) if QUICK else ((2, 4), (2, 2), (1, 4), (1, 2)):
    for amp in (0.0, 0.3, 1.9) if QUICK else (0.0, 0.3, 1.0, 1.9):
        ms, cs, lost = timeit(chain(amp, s, slack), sm0)
        net = ms - (jig if amp > 0 else 0.0)
        print(
            f"rebin s={s} slack={slack} amp={amp}: {net:.2f} ms net"
            f" ({ms:.2f} gross, compile {cs:.0f}s, lost {lost})",
            flush=True,
        )

print("done", flush=True)
