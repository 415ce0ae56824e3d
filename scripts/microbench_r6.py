#!/usr/bin/env python
"""Grid-granularity test: floor kernel with BQ queries per grid step.

Usage: python scripts/microbench_r6.py BQ [mode]
mode: floor (default) | work (adds the full per-slot masked passes +
sublane roll-free reduction via slice tree + unpack-acc)
"""
import functools, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bigsi_tpu.ops.lookup import build_grouped_streams

M, W, TR = 25_000_000, 32, 32
T = M // TR
B, K, H, RUN = 256, 512, 3, 6
CHAIN, REPEATS = 9, 3
BQ = int(sys.argv[1]) if len(sys.argv) > 1 else 8
MODE = sys.argv[2] if len(sys.argv) > 2 else "floor"

def kern_floor(gm_ref, g_ref, out_ref, *, r, u, bq):
    g = g_ref[...]  # [BQ, U, 8, 128]
    acc = g[:, 0]
    for i in range(1, u):
        acc = acc ^ g[:, i]
    out_ref[...] = acc.astype(jnp.int32)


def kern_floor_ref(gm_ref, g_ref, out_ref, *, r, u, bq):
    acc = g_ref[:, 0]
    for i in range(1, u):
        acc = acc ^ g_ref[:, i]
    out_ref[...] = acc.astype(jnp.int32)

def kern_work(gm_ref, g_ref, out_ref, *, r, u, bq):
    g = g_ref[...]  # [BQ, U, 8, 128]
    sub = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 8, 128), 2)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 8, 128), 3)
    riot = 4 * sub + lane // 32
    shiftg = sub + 8 * (lane // 32)
    acc = jnp.zeros((bq, 8, 128), jnp.int32)
    for slot in range(r):
        gm = gm_ref[:, :, slot]  # [BQ, U]
        sel = (gm[:, :, None, None] >> riot) & jnp.uint32(1)
        m = g | (sel - jnp.uint32(1))  # [BQ, U, 8, 128]
        red = m[:, :, 0, :]
        for j in range(1, 8):
            red = red & m[:, :, j, :]   # [BQ, U, 128]
        red = red & pltpu.roll(red, 32, axis=2)
        red = red & pltpu.roll(red, 64, axis=2)
        valid = jnp.where(gm != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        bits = (red[:, :, None, :] >> shiftg) & jnp.uint32(1)
        acc = acc + jnp.sum(
            (bits & valid[:, :, None, None]).astype(jnp.int32), axis=1
        )
    out_ref[...] = acc

def main():
    dev = jax.devices()[0]
    tiles = jax.jit(lambda k: jax.random.bits(k, (T, TR * W), jnp.uint32), device=dev)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    nt = (B * K + RUN - 1) // RUN
    base = rng.integers(0, T, size=nt).astype(np.int32)
    tile_ids = np.repeat(base, RUN)[: B * K].reshape(B, K)
    slots = rng.integers(0, TR, size=(B, K, H)).astype(np.uint32)
    smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
    utile, gmask = build_grouped_streams(tile_ids, smask, r=RUN)
    u = utile.shape[1]
    ut, gm = jnp.asarray(utile), jnp.asarray(gmask)
    kern = {"floor": kern_floor, "floor_ref": kern_floor_ref, "work": kern_work}[MODE]

    def mk(nsteps):
        @jax.jit
        def f(tiles, ut, gm):
            def body(carry, _):
                g = jnp.take(tiles, ((ut + carry) % T).reshape(-1), axis=0)
                g = g.reshape(B, u, 8, 128)
                out = pl.pallas_call(
                    functools.partial(kern, r=RUN, u=u, bq=BQ),
                    grid=(B // BQ,),
                    in_specs=[
                        pl.BlockSpec((BQ, u, RUN), lambda i: (i, 0, 0)),
                        pl.BlockSpec((BQ, u, 8, 128), lambda i: (i, 0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((BQ, 8, 128), lambda i: (i, 0, 0)),
                    out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel",),
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(gm, g)
                return (out[0, 0, 0] & jnp.int32(7)) + 1, ()
            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)
        return f, (tiles, ut, gm)

    def timed(fn, args):
        out = fn(*args); np.asarray(out)[0]
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter(); out = fn(*args); np.asarray(out)[0]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = timed(*mk(1)); tn = timed(*mk(CHAIN))
    dt = max((tn - t1) / (CHAIN - 1), 1e-9)
    rows = B * K * H
    print("%s BQ=%d: %.3f ms  %.1f Mrows/s" % (MODE, BQ, dt * 1e3, rows / dt / 1e6), flush=True)

main()
