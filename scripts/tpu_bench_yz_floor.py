"""Decompose the fused y+z rebin kernel's copy-through floor on TPU.

The round-3 trace profile puts the two rebins at ~11 ms of a 21 ms raw dam
step, and round-2 microbenches showed the COPY-THROUGH (no movers) is ~95% of
a rebin's cost — so the floor, not the pack arithmetic, is what must break.
This bench isolates the floor's layers with three purpose-built kernels that
reuse pallas_rebin's own window machinery (same block geometry, same gated
double-buffered DMA):

  dma_only   windows stream in (gated, double-buffered), output written as
             zeros -> DMA-in cost + mandatory output stores
  copy       windows stream in, core slice copy-through stores (the kernel's
             _copy_through branch, no flags) -> + VMEM copy cost
  full amp=0 the real rebin_yz on unmoved particles -> + flag/rank overhead

Usage: [X Y Z K]   (defaults: dam internal 64 64 128 16)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.ops import pallas_rebin as R
from blub_tpu.sim import table as T
from blub_tpu.sim.slot_major import NUM_DYN, NUM_POSQ, from_table

argv = sys.argv[1:]
G = tuple(int(v) for v in (argv[:3] or (64, 64, 128)))
K = int(argv[3]) if len(argv) > 3 else 16
N = 20

pos = add_fluid_cube(G, (1, 1, 1), (G[0] // 2, G[1] // 2, G[2] - 1), 10**9)
sm0 = from_table(T.from_positions(pos, G, K))
# mimic the production yz stage: its input is the K+slack-slot mid buffer
# from the fused advect/correct+pack kernels (slack slots empty -> gated)
pad = 4
posq0 = jnp.concatenate(
    [sm0.posq, jnp.zeros((pad,) + sm0.posq.shape[1:], jnp.float32)]
)
dyn0 = jnp.concatenate(
    [sm0.dyn, jnp.zeros((pad,) + sm0.dyn.shape[1:], jnp.float32)]
)
k_in, _, X, Y, Zp = posq0.shape
s = 2
k_out = K
bx, by = R._pick_blocks_yz(k_in, k_in, k_out, X, Y, s, Zp, R._BUDGET_YZ)
print(f"grid={G} K={K} particles={pos.shape[0]} blocks=({bx},{by})", flush=True)


def _variant_kernel(*refs, mode, with_gmask):
    bias_ref = None
    if mode == "dma_in":
        bias_ref, *refs = refs
    gmask = None
    if with_gmask:
        gmask, *refs = refs
    if mode == "dma_in":
        posq_hbm, dyn_hbm, out_ref, winp, wind, sems = refs
    else:
        posq_hbm, dyn_hbm, outp_ref, outd_ref, winp, wind, sems = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    if mode == "dma_1":
        # single whole-window copy per table (2 DMA issues/block vs 6/24):
        # isolates DMA-issue-count cost. Start clamped into bounds — edge
        # blocks read shifted rows, fine for a floor measurement.
        it = i * pl.num_programs(1) + j
        slot = jax.lax.rem(it, 2)

        def parts(ii, jj, sl):
            y0 = jnp.clip(jj * by - R._YH, 0, Y - by - 2 * R._YH)
            return [
                pltpu.make_async_copy(
                    posq_hbm.at[:, :, pl.ds(ii * bx, bx), pl.ds(y0, by + 2 * R._YH), :],
                    winp.at[sl],
                    sems.at[sl, 0],
                ),
                pltpu.make_async_copy(
                    dyn_hbm.at[:, :, pl.ds(ii * bx, bx), pl.ds(y0, by + 2 * R._YH), :],
                    wind.at[sl],
                    sems.at[sl, 1],
                ),
            ]

        @pl.when(it == 0)
        def _warm():
            for c in parts(i, j, slot):
                c.start()

        nxt = it + 1

        @pl.when(nxt < pl.num_programs(0) * pl.num_programs(1))
        def _pre():
            for c in parts(nxt // pl.num_programs(1), jax.lax.rem(nxt, pl.num_programs(1)), 1 - slot):
                c.start()

        for c in parts(i, j, slot):
            c.wait()
        winp_v, wind_v = winp.at[slot], wind.at[slot]
    else:
        winp_v, wind_v = R._pipelined_window(
            posq_hbm, dyn_hbm, winp, wind, sems, 1, s=s, bx=bx, by=by, X=X, Y=Y,
            gmask=gmask,
        )
    core = (slice(None), slice(R._YH, R._YH + by), slice(None))
    if mode == "dma_in":
        # tiny output: isolates window-DMA cost from the table-sized output.
        # bias chains successive calls (prevents loop-invariant hoisting).
        out_ref[0, 0] = (
            winp_v[0][0, 0, R._YH : R._YH + 8, :128] * 0.0 + bias_ref[0]
        )
        return
    for q in range(k_out):
        if mode in ("dma_only", "dma_1"):
            outp_ref[q] = jnp.zeros((NUM_POSQ, bx, by, Zp), jnp.float32)
            outd_ref[q] = jnp.zeros((NUM_DYN, bx, by, Zp), jnp.float32)
        else:  # copy
            outp_ref[q] = winp_v[q][(slice(None),) + core]
            outd_ref[q] = wind_v[q][(slice(None),) + core]


def variant(mode, gate=True):
    # gate=False isolates DMA-issue-count cost: the UNGATED window is 6
    # copies/block vs 6*nranges gated — more bytes, 4x fewer DMA issues.
    # dma_1 goes further: ONE whole-window copy per table (2 issues/block).
    # dma_in replaces the table-sized output with a tiny tile, isolating
    # window-in cost from output-out cost.
    nranges = len(R.group_ranges(k_in)) if gate and mode != "dma_1" else 1
    with_gmask = nranges > 1
    kern = functools.partial(_variant_kernel, mode=mode, with_gmask=with_gmask)
    ni, nj = X // bx, Y // by

    def call(posq, dyn, bias=None):
        inputs = [posq, dyn]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        if with_gmask:
            gm = R.block_group_mask(R.cell_group_any(posq), bx, by, 0, R._YH)
            inputs = [gm] + inputs
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        if mode == "dma_in":
            inputs = [jnp.reshape(bias, (1,))] + inputs
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        if mode == "dma_in":
            out_specs = [
                pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0)),
            ]
            out_shape = [jax.ShapeDtypeStruct((ni, nj, 8, 128), jnp.float32)]
        else:
            out_specs = [
                pl.BlockSpec(
                    (k_out, NUM_POSQ, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)
                ),
                pl.BlockSpec(
                    (k_out, NUM_DYN, bx, by, Zp), lambda i, j: (0, 0, i, j, 0)
                ),
            ]
            out_shape = [
                jax.ShapeDtypeStruct((k_out, NUM_POSQ, X, Y, Zp), jnp.float32),
                jax.ShapeDtypeStruct((k_out, NUM_DYN, X, Y, Zp), jnp.float32),
            ]
        return pl.pallas_call(
            kern,
            grid=(ni, nj),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, k_in, NUM_POSQ, bx, by + 2 * R._YH, Zp), jnp.float32),
                pltpu.VMEM((2, k_in, NUM_DYN, bx, by + 2 * R._YH, Zp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 6 * nranges)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(*inputs)

    def chain(posq, dyn):
        if mode == "dma_in":
            # chain iterations through the tiny output's [0,0,0,0] scalar so
            # the loop-invariant pallas_call can't be hoisted out of the scan
            def body_in(bias, _):
                (out,) = call(posq, dyn, bias=bias)
                return out[0, 0, 0, 0], None

            out, _ = jax.lax.scan(body_in, jnp.float32(0), None, length=N)
            return out

        def body(c, _):
            out = call(c[0], c[1])
            p, d = out
            # re-pad k_out -> k_in so the scan carry type is stable
            p = jnp.concatenate(
                [p, jnp.zeros((pad,) + p.shape[1:], jnp.float32)]
            )
            d = jnp.concatenate(
                [d, jnp.zeros((pad,) + d.shape[1:], jnp.float32)]
            )
            return (p, d), None

        out, _ = jax.lax.scan(body, (posq, dyn), None, length=N)
        return out

    return jax.jit(chain)


def full_chain():
    n0 = jnp.int32(pos.shape[0])

    def body(c, _):
        posq, dyn = c
        out = R.rebin_yz_slot_major(
            posq, dyn, G, s, k_out=k_out, lost=jnp.int32(0), before_count=n0
        )
        # feed the k_out-slot output back through the pad so the chain reuses
        # the same k_in-slot program
        p = jnp.concatenate(
            [out.posq, jnp.zeros((pad,) + out.posq.shape[1:], jnp.float32)]
        )
        d = jnp.concatenate(
            [out.dyn, jnp.zeros((pad,) + out.dyn.shape[1:], jnp.float32)]
        )
        return (p, d), None

    def run(posq, dyn):
        out, _ = jax.lax.scan(body, (posq, dyn), None, length=N)
        return out

    return jax.jit(run)


def timeit(fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / N * 1e3, compile_s


MODES = os.environ.get(
    "BLUB_FLOOR_MODES", "dma_only,dma_only!g,copy,full"
).split(",")
for tag in MODES:
    if tag == "full":
        ms, cs = timeit(full_chain(), posq0, dyn0)
        print(f"{'full amp=0':10s}: {ms:6.2f} ms  (compile {cs:.0f}s)", flush=True)
        continue
    gate = not tag.endswith("!g")
    mode = tag.removesuffix("!g")
    ms, cs = timeit(variant(mode, gate), posq0, dyn0)
    print(f"{tag:10s}: {ms:6.2f} ms  (compile {cs:.0f}s)", flush=True)
print("done", flush=True)
