#!/usr/bin/env python
"""Ablate the grouped_fused Pallas kernel to find its hot part.

Variants (same gather + grid + blocks, kernel body differs):
  presence — masked reduce + rolls only, XOR-accumulate (no unpack)
  unpack   — presence + unpack-accumulate (no exact tree)
  exact    — presence + exact AND tree (no unpack)
  full     — everything (== grouped_fused)
  flat     — full, but all ops on [U*8, 128] 2D shapes
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

from bigsi_tpu.ops.lookup import build_grouped_streams
from bigsi_tpu.ops.pallas_lookup import SUBLANES, LANES

M, W, TR = 25_000_000, 32, 32
T = M // TR
B, K, H, RUN = 256, 512, 3, 6
CHAIN, REPEATS = 9, 3


def make_kernel(mode, r, u):
    def kernel(gmask_ref, g_ref, counts_ref, exact_ref):
        g = g_ref[0]
        sub = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 1)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 2)
        riot = 4 * sub + lane // 32
        shiftg = (sub + 8 * (lane // 32))[0]
        ones = jnp.uint32(0xFFFFFFFF)
        acc = jnp.zeros((SUBLANES, LANES), jnp.int32)
        xacc = jnp.zeros((1, LANES), jnp.uint32)
        eacc = jnp.full((1, LANES), ones, jnp.uint32)
        for slot in range(r):
            gm = gmask_ref[0, :, slot]
            sel = (gm[:, None, None] >> riot) & jnp.uint32(1)
            masked = g | (sel - jnp.uint32(1))
            red = masked[:, 0, :]
            for j in range(1, SUBLANES):
                red = red & masked[:, j, :]
            red = red & pltpu.roll(red, 32, axis=1)
            red = red & pltpu.roll(red, 64, axis=1)
            valid = jnp.where(gm != 0, ones, jnp.uint32(0))
            if mode in ("unpack", "full"):
                bits = (red[:, None, :] >> shiftg[None]) & jnp.uint32(1)
                acc = acc + jnp.sum(
                    (bits & valid[:, None, None]).astype(jnp.int32), axis=0
                )
            else:
                xr = red ^ valid[:, None]
                x2 = xr[0:1]
                for j in range(1, u):
                    x2 = x2 ^ xr[j:j + 1]
                xacc = xacc ^ x2
            if mode in ("exact", "full"):
                ev = jnp.where(valid[:, None] != 0, red, ones)
                n = 1
                while n < u:
                    n *= 2
                if n != u:
                    ev = jnp.concatenate(
                        [ev, jnp.full((n - u, LANES), ones, jnp.uint32)],
                        axis=0,
                    )
                while n > 1:
                    ev = ev[: n // 2] & ev[n // 2:]
                    n //= 2
                eacc = eacc & ev
        counts_ref[0] = acc + xacc.astype(jnp.int32)
        exact_ref[0] = eacc

    def kernel_flat(gmask_ref, g_ref, counts_ref, exact_ref):
        g = g_ref[0].reshape(u * SUBLANES, LANES)
        subf = jax.lax.broadcasted_iota(jnp.uint32, (u * SUBLANES, LANES), 0) % SUBLANES
        lanef = jax.lax.broadcasted_iota(jnp.uint32, (u * SUBLANES, LANES), 1)
        riotf = 4 * subf + lanef // 32
        sub = jax.lax.broadcasted_iota(jnp.uint32, (SUBLANES, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (SUBLANES, LANES), 1)
        shiftg = sub + 8 * (lane // 32)
        ones = jnp.uint32(0xFFFFFFFF)
        acc = jnp.zeros((SUBLANES, LANES), jnp.int32)
        eacc = jnp.full((1, LANES), ones, jnp.uint32)
        for slot in range(r):
            gm = gmask_ref[0, :, slot]
            gmf = jnp.repeat(gm, SUBLANES)[:, None]  # [U*8, 1]
            sel = (gmf >> riotf) & jnp.uint32(1)
            masked = g | (sel - jnp.uint32(1))
            m3 = masked.reshape(u, SUBLANES, LANES)
            red = m3[:, 0, :]
            for j in range(1, SUBLANES):
                red = red & m3[:, j, :]
            red = red & pltpu.roll(red, 32, axis=1)
            red = red & pltpu.roll(red, 64, axis=1)
            valid = jnp.where(gm != 0, ones, jnp.uint32(0))
            bits = (red[:, None, :] >> shiftg[None]) & jnp.uint32(1)
            acc = acc + jnp.sum(
                (bits & valid[:, None, None]).astype(jnp.int32), axis=0
            )
            ev = jnp.where(valid[:, None] != 0, red, ones)
            n = 1
            while n < u:
                n *= 2
            if n != u:
                ev = jnp.concatenate(
                    [ev, jnp.full((n - u, LANES), ones, jnp.uint32)], axis=0
                )
            while n > 1:
                ev = ev[: n // 2] & ev[n // 2:]
                n //= 2
            eacc = eacc & ev
        counts_ref[0] = acc
        exact_ref[0] = eacc

    return kernel_flat if mode == "flat" else kernel


def run_variant(mode, tiles, ut, gm, u, r):
    kern = make_kernel(mode, r, u)

    @jax.jit
    def step(tiles, ut, gm):
        def body(carry, _):
            utile = (ut + carry) % T
            g = jnp.take(tiles, utile.reshape(-1), axis=0)
            g = g.reshape(B, u, SUBLANES, LANES)
            counts, exact = pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, u, r), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, u, SUBLANES, LANES),
                                 lambda i: (i, 0, 0, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((B, SUBLANES, LANES), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1, LANES), jnp.uint32),
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                ),
            )(gm, g)
            return (counts[0, 0, 0] & jnp.int32(7)) + 1, ()

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=step.nsteps)
        return carry.reshape(1)

    def make(nsteps):
        step.nsteps = nsteps
        f = jax.jit(step._fun) if False else None
        # rebuild closure per nsteps
        @jax.jit
        def f2(tiles, ut, gm):
            def body(carry, _):
                utile = (ut + carry) % T
                g = jnp.take(tiles, utile.reshape(-1), axis=0)
                g = g.reshape(B, u, SUBLANES, LANES)
                counts, exact = pl.pallas_call(
                    kern,
                    grid=(B,),
                    in_specs=[
                        pl.BlockSpec((1, u, r), lambda i: (i, 0, 0)),
                        pl.BlockSpec((1, u, SUBLANES, LANES),
                                     lambda i: (i, 0, 0, 0)),
                    ],
                    out_specs=(
                        pl.BlockSpec((1, SUBLANES, LANES),
                                     lambda i: (i, 0, 0)),
                        pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct((B, SUBLANES, LANES), jnp.int32),
                        jax.ShapeDtypeStruct((B, 1, LANES), jnp.uint32),
                    ),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel",),
                    ),
                )(gm, g)
                return (counts[0, 0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f2, (tiles, ut, gm)

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

    t1 = timed(*make(1))
    tn = timed(*make(CHAIN))
    dt = max((tn - t1) / (CHAIN - 1), 1e-9)
    rows = B * K * H
    print("%-10s %9.3f ms  %8.1f Mrows/s" % (mode, dt * 1e3, rows / dt / 1e6),
          flush=True)


def main():
    which = sys.argv[1:] or ["presence", "unpack", "exact", "full", "flat"]
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
    for mode in which:
        try:
            run_variant(mode, tiles, ut, gm, u, RUN)
        except Exception as e:
            print("%s FAILED: %s %s" % (mode, type(e).__name__, str(e)[:200]),
                  flush=True)


if __name__ == "__main__":
    main()
