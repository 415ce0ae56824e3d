#!/usr/bin/env python
"""Find the scalar-prefetch size threshold for the fused kernel."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64
T = 390625
tiles_fat = jax.jit(lambda k: jax.random.bits(k, (T * 8, 128), jnp.uint32))(
    jax.random.PRNGKey(0)
)


def k1(nu_ref, ut_ref, us_ref, sm_ref, si_ref, tiles_hbm, out_ref, scratch, sems):
    b, cc = pl.program_id(0), pl.program_id(1)
    g = b * pl.num_programs(1) + cc
    nch = pl.num_programs(0) * pl.num_programs(1)

    def issue(ci):
        def body(j, _):
            t = ut_ref[ci * C + j]
            s = us_ref[ci * C + j]
            pltpu.make_async_copy(
                tiles_hbm.at[pl.ds(t * 8, 8), :], scratch.at[s], sems.at[s]
            ).start()
            return 0
        jax.lax.fori_loop(0, nu_ref[ci], body, 0)

    @pl.when(g == 0)
    def _():
        issue(0)

    @pl.when(g + 1 < nch)
    def _():
        issue(g + 1)

    @pl.when(cc == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def wait_body(j, _):
        s = us_ref[g * C + j]
        pltpu.make_async_copy(
            tiles_hbm.at[pl.ds(0, 8), :], scratch.at[s], sems.at[s]
        ).wait()
        return 0
    jax.lax.fori_loop(0, nu_ref[g], wait_body, 0)

    def consume(c, acc):
        return acc ^ scratch[si_ref[g * C + c]]
    acc = jax.lax.fori_loop(0, C, consume, jnp.zeros((8, 128), jnp.uint32))
    out_ref[0] ^= acc


for B in [int(x) for x in sys.argv[1:]] or (64, 128):
    NCH = B * 8
    rng = np.random.default_rng(1)
    nu = jnp.full((NCH,), C, jnp.int32)
    ut = jnp.asarray(rng.integers(0, T, NCH * C).astype(np.int32))
    us = jnp.asarray(
        ((np.arange(NCH)[:, None] % 2) * C + np.arange(C)[None, :])
        .astype(np.int32).reshape(-1)
    )
    sm = jnp.asarray(np.full(NCH * C, 7, np.uint32))
    si = us

    def fn(tiles_fat, nu, ut, us, sm, si, B=B):
        return pl.pallas_call(
            k1,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(B, 8),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i, j, *_: (i, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((2 * C, 8, 128), jnp.uint32),
                    pltpu.SemaphoreType.DMA((2 * C,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.uint32),
        )(nu, ut, us, sm, si, tiles_fat)

    kb = (NCH + 4 * NCH * C) * 4 / 1024
    try:
        out = jax.jit(fn)(tiles_fat, nu, ut, us, sm, si)
        np.asarray(out).reshape(-1)[0]
        print("B=%d OK (prefetch %.0f KB)" % (B, kb))
    except Exception as e:
        print("B=%d FAIL (prefetch %.0f KB): %s" % (B, kb, type(e).__name__))
