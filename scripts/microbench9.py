#!/usr/bin/env python
"""Isolate the grouped path's tile-gather cost and probe cheap levers.

microbench8 showed the expansion (masked AND) is NOT dominant: fat
layout only bought 13%.  Estimate from the blocked path says the XLA
tile gather (~25M issues/s) eats ~60% of the grouped step.  Probes:

  * gather-only (R6 / R12 data): take + trivial XOR reduce;
  * sorted vs unsorted tile ids (counts are order-invariant, so the
    host can sort utile per query for free — HBM page locality);
  * full fat kernel at genuine run lengths 6 / 9 / 12 (r matching),
    i.e. what a minimizer window of w=11/17/21 would produce.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.lookup import TILE_ROWS, build_grouped_streams
from scripts.microbench8 import grouped_fatcsa, to_fat, marginal

B, K, H = 256, 512, 3
M = 25_000_000
N = 1024
W = N // 32
T = M // TILE_ROWS


def make_inputs(rng, RUN, r, sort=False):
    run_tiles = rng.integers(0, T, size=(B, (K + RUN - 1) // RUN)).astype(
        np.int32
    )
    tidx = np.repeat(run_tiles, RUN, axis=1)[:, :K]
    slots = rng.integers(0, TILE_ROWS, size=(B, K, H)).astype(np.int32)
    sm = np.bitwise_or.reduce(np.uint32(1) << slots.astype(np.uint32), axis=2)
    utile, gmask = build_grouped_streams(tidx, sm, r=r)
    if sort:
        order = np.argsort(utile, axis=1, kind="stable")
        utile = np.take_along_axis(utile, order, axis=1)
        gmask = np.take_along_axis(gmask, order[:, :, None], axis=1)
    return utile, gmask


def bench(name, fn, args, rows):
    def make(nsteps):
        @jax.jit
        def f(*a):
            def body(carry, _):
                u2 = (a[1] + carry) % T
                out = fn(a[0], u2, *a[2:])
                return (out.reshape(-1)[0] & jnp.int32(7)) + 1, ()

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return c.reshape(1)

        return f, args

    dt = marginal(make)
    print(
        "%-14s %8.3f ms/step  %8.1f Mrows/s"
        % (name, dt * 1e3, rows / dt / 1e6),
        flush=True,
    )


def gather_only(tiles, utile):
    g = jnp.take(tiles, utile.reshape(-1), axis=0)
    return jax.lax.reduce(
        g, jnp.uint32(0), jax.lax.bitwise_xor, (0, 1)
    ).astype(jnp.int32)[None]


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    rng = np.random.default_rng(0)
    tiles = jax.jit(
        lambda k: jax.random.bits(k, (T, TILE_ROWS * W), jnp.uint32),
        device=dev,
    )(jax.random.PRNGKey(0))
    tiles_fat = jax.jit(to_fat, device=dev)(tiles)
    rows = B * K * H

    u6, g6 = make_inputs(np.random.default_rng(1), 6, 6)
    u6s, g6s = make_inputs(np.random.default_rng(1), 6, 6, sort=True)
    u9, g9 = make_inputs(np.random.default_rng(2), 9, 9)
    u12, g12 = make_inputs(np.random.default_rng(3), 12, 12)
    u12s, g12s = make_inputs(np.random.default_rng(3), 12, 12, sort=True)
    print(
        "U sizes: r6=%d r9=%d r12=%d" % (u6.shape[1], u9.shape[1], u12.shape[1]),
        flush=True,
    )
    put = lambda *a: [jax.device_put(x, dev) for x in a]

    bench("gatheronly r6", gather_only, put(tiles, u6), rows)
    bench("gatheronly s6", gather_only, put(tiles, u6s), rows)
    bench("gatheronly r12", gather_only, put(tiles, u12), rows)
    fc = lambda t, u, g: grouped_fatcsa(t, u, g, W)
    bench("fat r6", fc, put(tiles_fat, u6, g6), rows)
    bench("fat r6 sorted", fc, put(tiles_fat, u6s, g6s), rows)
    bench("fat r9", fc, put(tiles_fat, u9, g9), rows)
    bench("fat r12", fc, put(tiles_fat, u12, g12), rows)
    bench("fat r12 sort", fc, put(tiles_fat, u12s, g12s), rows)


if __name__ == "__main__":
    main()
