#!/usr/bin/env python
"""Clean incremental ablation of the grouped Pallas kernel cost.

Variants build up from a floor:
  floor    — kernel reads g block, XORs the block into [8,128] (1 pass)
  mask1    — + per-slot sel/or mask (r passes over block, no reduce)
  rolltree — + sublane AND via 3D roll tree (no slicing) + quadrants
  rollpack — rolltree + emit packed presence rows to HBM (no unpack),
             csa + exact done in XLA outside
  gather0  — XLA gather + trivial XOR reduce, no pallas (reference)

All at B=256, K=512, RUN=6 (U=96), m=25e6, W=32.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bigsi_tpu.ops.lookup import build_grouped_streams, csa_counts
from bigsi_tpu.ops.pallas_lookup import SUBLANES, LANES

M, W, TR = 25_000_000, 32, 32
T = M // TR
B, K, H, RUN = 256, 512, 3, 6
CHAIN, REPEATS = 16, 4


def timed(fn, args):
    out = fn(*args)
    np.asarray(out)[0]
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(mk):
    t1 = timed(*mk(1))
    tn = timed(*mk(CHAIN))
    return max((tn - t1) / (CHAIN - 1), 1e-9)


def report(name, dt, extra=""):
    rows = B * K * H
    print("%-12s %9.3f ms  %8.1f Mrows/s  %s"
          % (name, dt * 1e3, rows / dt / 1e6, extra), flush=True)


def kern_floor(gm_ref, g_ref, out_ref, *, r, u):
    g = g_ref[0]
    acc = g[0]
    for i in range(1, u):
        acc = acc ^ g[i]
    out_ref[0] = acc.astype(jnp.int32)


def kern_mask1(gm_ref, g_ref, out_ref, *, r, u):
    g = g_ref[0]
    sub = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 2)
    riot = 4 * sub + lane // 32
    acc = jnp.zeros((u, SUBLANES, LANES), jnp.uint32)
    for slot in range(r):
        gm = gm_ref[0, :, slot]
        sel = (gm[:, None, None] >> riot) & jnp.uint32(1)
        acc = acc ^ (g | (sel - jnp.uint32(1)))
    red = acc[0]
    for i in range(1, u):
        red = red ^ acc[i]
    out_ref[0] = red.astype(jnp.int32)


def kern_rolltree(gm_ref, g_ref, out_ref, *, r, u):
    g = g_ref[0]
    sub = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 2)
    riot = 4 * sub + lane // 32
    acc = jnp.zeros((u, SUBLANES, LANES), jnp.uint32)
    for slot in range(r):
        gm = gm_ref[0, :, slot]
        sel = (gm[:, None, None] >> riot) & jnp.uint32(1)
        m = g | (sel - jnp.uint32(1))
        m = m & pltpu.roll(m, 4, axis=1)
        m = m & pltpu.roll(m, 2, axis=1)
        m = m & pltpu.roll(m, 1, axis=1)   # every sublane = AND of all 8
        m = m & pltpu.roll(m, 32, axis=2)
        m = m & pltpu.roll(m, 64, axis=2)  # every quadrant = full AND
        acc = acc ^ m
    red = acc[0]
    for i in range(1, u):
        red = red ^ acc[i]
    out_ref[0] = red.astype(jnp.int32)


def kern_rollpack(gm_ref, g_ref, pres_ref, *, r, u):
    """Emit packed presence rows [U, R, 128] (quadrant-replicated)."""
    g = g_ref[0]
    sub = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 2)
    riot = 4 * sub + lane // 32
    for slot in range(r):
        gm = gm_ref[0, :, slot]
        sel = (gm[:, None, None] >> riot) & jnp.uint32(1)
        m = g | (sel - jnp.uint32(1))
        m = m & pltpu.roll(m, 4, axis=1)
        m = m & pltpu.roll(m, 2, axis=1)
        m = m & pltpu.roll(m, 1, axis=1)
        m = m & pltpu.roll(m, 32, axis=2)
        m = m & pltpu.roll(m, 64, axis=2)
        valid = jnp.where(gm != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        pres_ref[0, :, slot, :] = m[:, 0, :] & valid[:, None]


def run_kernel(name, kern, tiles, ut, gm, u, r, packed_out=False):
    def mk(nsteps):
        @jax.jit
        def f(tiles, ut, gm):
            def body(carry, _):
                utile = (ut + carry) % T
                g = jnp.take(tiles, utile.reshape(-1), axis=0)
                g = g.reshape(B, u, SUBLANES, LANES)
                if packed_out:
                    pres = pl.pallas_call(
                        functools.partial(kern, r=r, u=u),
                        grid=(B,),
                        in_specs=[
                            pl.BlockSpec((1, u, r), lambda i: (i, 0, 0)),
                            pl.BlockSpec((1, u, SUBLANES, LANES),
                                         lambda i: (i, 0, 0, 0)),
                        ],
                        out_specs=pl.BlockSpec((1, u, r, LANES),
                                               lambda i: (i, 0, 0, 0)),
                        out_shape=jax.ShapeDtypeStruct(
                            (B, u, r, LANES), jnp.uint32),
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("parallel",)),
                    )(gm, g)
                    rows = pres[..., :32].reshape(B, u * r, 32)
                    c = csa_counts(rows, axis=1)
                    return (c[0, 0] & jnp.int32(7)) + 1, ()
                out = pl.pallas_call(
                    functools.partial(kern, r=r, u=u),
                    grid=(B,),
                    in_specs=[
                        pl.BlockSpec((1, u, r), lambda i: (i, 0, 0)),
                        pl.BlockSpec((1, u, SUBLANES, LANES),
                                     lambda i: (i, 0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, SUBLANES, LANES),
                                           lambda i: (i, 0, 0)),
                    out_shape=jax.ShapeDtypeStruct(
                        (B, SUBLANES, LANES), jnp.int32),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel",)),
                )(gm, g)
                return (out[0, 0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (tiles, ut, gm)

    try:
        report(name, marginal(mk))
    except Exception as e:
        print("%s FAILED: %s %s" % (name, type(e).__name__, str(e)[:200]),
              flush=True)


def main():
    which = set(sys.argv[1:]) or {"gather0", "floor", "mask1", "rolltree",
                                  "rollpack"}
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    tiles = jax.jit(
        lambda k: jax.random.bits(k, (T, TR * W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    nt = (B * K + RUN - 1) // RUN
    base = rng.integers(0, T, size=nt).astype(np.int32)
    tile_ids = np.repeat(base, RUN)[: B * K].reshape(B, K)
    slots = rng.integers(0, TR, size=(B, K, H)).astype(np.uint32)
    smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
    utile, gmask = build_grouped_streams(tile_ids, smask, r=RUN)
    u = utile.shape[1]
    ut, gm = jnp.asarray(utile), jnp.asarray(gmask)
    print("U=%d fetches=%d" % (u, B * u), flush=True)

    if "gather0" in which:
        def mk(nsteps):
            @jax.jit
            def f(tiles, ut, gm):
                def body(carry, _):
                    g = jnp.take(tiles, ((ut + carry) % T).reshape(-1),
                                 axis=0)
                    rr = jax.lax.reduce(g, jnp.uint32(0),
                                        jax.lax.bitwise_xor, (0, 1))
                    return (rr & jnp.uint32(7)).astype(jnp.int32) + 1, ()
                carry, _ = jax.lax.scan(body, jnp.int32(0), None,
                                        length=nsteps)
                return carry.reshape(1)
            return f, (tiles, ut, gm)
        report("gather0", marginal(mk))

    if "floor" in which:
        run_kernel("floor", kern_floor, tiles, ut, gm, u, RUN)
    if "mask1" in which:
        run_kernel("mask1", kern_mask1, tiles, ut, gm, u, RUN)
    if "rolltree" in which:
        run_kernel("rolltree", kern_rolltree, tiles, ut, gm, u, RUN)
    if "rollpack" in which:
        run_kernel("rollpack", kern_rollpack, tiles, ut, gm, u, RUN,
                   packed_out=True)


if __name__ == "__main__":
    main()
