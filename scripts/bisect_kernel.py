#!/usr/bin/env python
"""Bisect which kernel feature crashes the TPU compiler."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B, KC, C = 390625, 256, 8, 64
tiles_fat = jnp.asarray(
    np.random.default_rng(0).integers(0, 2 ** 32, size=(T * 8, 128), dtype=np.uint32)
)
NCH = B * KC
nu = jnp.full((NCH,), C, jnp.int32)
ut = jnp.asarray(np.random.default_rng(1).integers(0, T, NCH * C).astype(np.int32))
us = jnp.asarray(
    ((np.arange(NCH)[:, None] % 2) * C + np.arange(C)[None, :])
    .astype(np.int32).reshape(-1)
)
sm = jnp.asarray(np.full(NCH * C, 7, np.uint32))
si = jnp.asarray(us)


def try_case(name, fn):
    try:
        out = jax.jit(fn)(tiles_fat, nu, ut, us, sm, si)
        jax.block_until_ready(out)
        np.asarray(out[0] if isinstance(out, tuple) else out).reshape(-1)[0]
        print("OK  :", name)
    except Exception as e:
        print("FAIL:", name, "--", type(e).__name__, str(e)[:150].replace("\n", " "))


def call(kernel, n_out=1, n_pref=5, grid=(B, KC)):
    outs = (
        jax.ShapeDtypeStruct((B, 8, 128), jnp.uint32),
        jax.ShapeDtypeStruct((B, 1, 128), jnp.uint32),
    )[:n_out]
    ospecs = (
        pl.BlockSpec((1, 8, 128), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((1, 1, 128), lambda i, j, *_: (i, 0, 0)),
    )[:n_out]

    def fn(tiles_fat, nu, ut, us, sm, si):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_pref,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=ospecs if n_out > 1 else ospecs[0],
                scratch_shapes=[
                    pltpu.VMEM((2 * C, 8, 128), jnp.uint32),
                    pltpu.SemaphoreType.DMA((2 * C,)),
                ],
            ),
            out_shape=outs if n_out > 1 else outs[0],
        )(*( (nu, ut, us, sm, si)[:n_pref] ), tiles_fat)

    return fn


# case 1: 2D grid + 5 prefetch + issue-next + wait + trivial consume, 1 output
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


try_case("double-buffer issue-next + 5 prefetch + 2D grid", call(k1))


# case 2: + roll and variable shifts in consume
def k2(nu_ref, ut_ref, us_ref, sm_ref, si_ref, tiles_hbm, out_ref, scratch, sems):
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

    sub = jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 1)
    riot = 4 * sub + lane // 32
    shiftg = sub + 8 * (lane // 32)
    ones = jnp.uint32(0xFFFFFFFF)

    def consume(c, acc):
        i = g * C + c
        smv = sm_ref[i]
        tile = scratch[si_ref[i]]
        sel = ((smv >> riot) & jnp.uint32(1)) != 0
        masked = jnp.where(sel, tile, ones)
        red = masked[0:1, :]
        for j in range(1, 8):
            red = red & masked[j:j + 1, :]
        red = red & pltpu.roll(red, 32, axis=1)
        red = red & pltpu.roll(red, 64, axis=1)
        valid = jnp.where(smv != 0, ones, jnp.uint32(0))
        bits = (jnp.broadcast_to(red, (8, 128)) >> shiftg) & jnp.uint32(1) & valid
        return acc + bits
    acc = jax.lax.fori_loop(0, C, consume, jnp.zeros((8, 128), jnp.uint32))
    out_ref[0] += acc


try_case("+ full consume math (roll, var shifts)", call(k2))


# case 3: + second output (exact)
def k3(nu_ref, ut_ref, us_ref, sm_ref, si_ref, tiles_hbm, out_ref, ex_ref, scratch, sems):
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
        ex_ref[:] = jnp.full_like(ex_ref, 0xFFFFFFFF)

    def wait_body(j, _):
        s = us_ref[g * C + j]
        pltpu.make_async_copy(
            tiles_hbm.at[pl.ds(0, 8), :], scratch.at[s], sems.at[s]
        ).wait()
        return 0
    jax.lax.fori_loop(0, nu_ref[g], wait_body, 0)

    sub = jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 1)
    riot = 4 * sub + lane // 32
    shiftg = sub + 8 * (lane // 32)
    ones = jnp.uint32(0xFFFFFFFF)

    def consume(c, carry):
        acc, eacc = carry
        i = g * C + c
        smv = sm_ref[i]
        tile = scratch[si_ref[i]]
        sel = ((smv >> riot) & jnp.uint32(1)) != 0
        masked = jnp.where(sel, tile, ones)
        red = masked[0:1, :]
        for j in range(1, 8):
            red = red & masked[j:j + 1, :]
        red = red & pltpu.roll(red, 32, axis=1)
        red = red & pltpu.roll(red, 64, axis=1)
        valid = jnp.where(smv != 0, ones, jnp.uint32(0))
        bits = (jnp.broadcast_to(red, (8, 128)) >> shiftg) & jnp.uint32(1) & valid
        eacc = eacc & jnp.where(smv != 0, red, ones)
        return acc + bits, eacc
    acc, eacc = jax.lax.fori_loop(
        0, C, consume,
        (jnp.zeros((8, 128), jnp.uint32), jnp.full((1, 128), ones, jnp.uint32)),
    )
    out_ref[0] += acc
    ex_ref[0] &= eacc


try_case("+ second (exact) output", call(k3, n_out=2))
