#!/usr/bin/env python
"""Time-to-compile probe for one fused-kernel variant (run under timeout).

argv: B NPREF GRID1D [C]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1])
NPREF = int(sys.argv[2])
GRID1D = int(sys.argv[3])
C = int(sys.argv[4]) if len(sys.argv) > 4 else 64
KC = 8
T = 390625
NCH = B * KC

# tiny matrix: compile time should not depend on T
tiles_fat = jax.ShapeDtypeStruct((T * 8, 128), jnp.uint32)


def kernel(*refs):
    prefetch = refs[:NPREF]
    tiles_hbm = refs[NPREF]
    out_ref = refs[NPREF + 1]
    scratch = refs[NPREF + 2]
    sems = refs[NPREF + 3]
    nu_ref = prefetch[0]
    ut_ref = prefetch[1 % NPREF]
    us_ref = prefetch[2 % NPREF]
    si_ref = prefetch[3 % NPREF]

    if GRID1D:
        g = pl.program_id(0)
        cc = g  # unused distinction
        nch = pl.num_programs(0)
        first = g == 0
    else:
        b, cc = pl.program_id(0), pl.program_id(1)
        g = b * pl.num_programs(1) + cc
        nch = pl.num_programs(0) * pl.num_programs(1)
        first = g == 0

    def issue(ci):
        def body(j, _):
            t = ut_ref[(ci * C + j) % (NCH * C)]
            s = us_ref[(ci * C + j) % (NCH * C)] if NPREF >= 3 else (
                (ci % 2) * C + j)
            pltpu.make_async_copy(
                tiles_hbm.at[pl.ds(t * 8, 8), :], scratch.at[s], sems.at[s]
            ).start()
            return 0

        jax.lax.fori_loop(0, nu_ref[ci], body, 0)

    @pl.when(first)
    def _():
        issue(0)

    @pl.when(g + 1 < nch)
    def _():
        issue(g + 1)

    @pl.when(cc % KC == 0 if GRID1D else cc == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def wait_body(j, _):
        s = us_ref[(g * C + j) % (NCH * C)] if NPREF >= 3 else ((g % 2) * C + j)
        pltpu.make_async_copy(
            tiles_hbm.at[pl.ds(0, 8), :], scratch.at[s], sems.at[s]
        ).wait()
        return 0

    jax.lax.fori_loop(0, nu_ref[g], wait_body, 0)

    def consume(c, acc):
        s = si_ref[(g * C + c) % (NCH * C)] if NPREF >= 4 else ((g % 2) * C + c)
        return acc ^ scratch[s]

    acc = jax.lax.fori_loop(0, C, consume, jnp.zeros((8, 128), jnp.uint32))
    out_ref[0] ^= acc


prefetch_shapes = [
    jax.ShapeDtypeStruct((NCH,), jnp.int32),
    jax.ShapeDtypeStruct((NCH * C,), jnp.int32),
    jax.ShapeDtypeStruct((NCH * C,), jnp.int32),
    jax.ShapeDtypeStruct((NCH * C,), jnp.int32),
    jax.ShapeDtypeStruct((NCH * C,), jnp.uint32),
][:NPREF]

grid = (NCH,) if GRID1D else (B, KC)
if GRID1D:
    ospec = pl.BlockSpec((1, 8, 128), lambda g, *_: (g // KC, 0, 0))
else:
    ospec = pl.BlockSpec((1, 8, 128), lambda i, j, *_: (i, 0, 0))


def fn(tiles_fat, *pref):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=NPREF,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=ospec,
            scratch_shapes=[
                pltpu.VMEM((2 * C, 8, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((2 * C,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.uint32),
    )(*pref, tiles_fat)


t0 = time.perf_counter()
lowered = jax.jit(fn).lower(tiles_fat, *prefetch_shapes)
compiled = lowered.compile()
print("COMPILED B=%d NPREF=%d GRID1D=%d C=%d in %.1fs"
      % (B, NPREF, GRID1D, C, time.perf_counter() - t0))
