#!/usr/bin/env python
"""Probe: grouped-path expansion formulations (docs/DESIGN.md round-2
"grouped-path ceiling": gather 0.66 + expansion 0.62 + csa 0.16 ms).

The expansion term is HBM re-read: XLA reads the gathered [BU, 32, W]
tiles once per k-mer slot (R x 100 MB).  Variants probed here:

  v0  production grouped_counts (broadcast + one big reduce)
  v1  r-unrolled sibling reduces over the same gathered input — if
      XLA multi-output-fuses them, the input is read ONCE
  v2  v1 with RUN=12 synthetic runs (half the fetches; needs w=23
      minimizer windows in product)
  v3  v1 at TILE_ROWS=16 (half the expansion bytes; FPR trade)

Each case prints marginal ms/step over a lax.scan chain (relay-safe,
same methodology as bench.py).  Run one case per invocation to bound
chip risk: `python scripts/probe_expansion.py v1`.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.lookup import build_grouped_streams, csa_counts, grouped_counts

B, K, H, N = 256, 512, 3, 1024
W = N // 32
M = 25_000_000
CHAIN, REPEATS = 9, 3


def grouped_counts_unrolled(tiles, utile, gmask, tile_rows=32):
    """Same math as grouped_counts but with the R expansion reduces as
    SIBLING ops over one gathered input (XLA multi-output fusion)."""
    b, u = utile.shape
    r = gmask.shape[2]
    w = tiles.shape[1] // tile_rows
    g = jnp.take(tiles, utile.reshape(-1), axis=0).reshape(b, u, tile_rows, w)
    rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, tile_rows, 1), 2)
    pres = []
    for j in range(r):
        sel = (gmask[:, :, j, None, None] >> rowbit) & jnp.uint32(1)
        masked = g | (sel - jnp.uint32(1))
        p = jax.lax.reduce(
            masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (2,)
        )  # [B, U, W]
        valid = (gmask[:, :, j] != 0)[..., None]
        pres.append(jnp.where(valid, p, jnp.uint32(0)))
    rows = jnp.stack(pres, axis=2).reshape(b, u * r, w)
    return csa_counts(rows, axis=1)


def make_inputs(run, tile_rows, rng):
    t = M // tile_rows
    dev = jax.devices()[0]
    tiles = jax.jit(
        lambda k: jax.random.bits(k, (t, tile_rows * W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    nruns = (K + run - 1) // run
    run_tiles = rng.integers(0, t, size=(B, nruns)).astype(np.int32)
    tidx = np.repeat(run_tiles, run, axis=1)[:, :K]
    slots = rng.integers(0, tile_rows, size=(B, K, H)).astype(np.uint32)
    sm = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
    utile_np, gmask_np = build_grouped_streams(tidx, sm, r=run)
    utile = jax.device_put(utile_np, dev)
    gmask = jax.device_put(gmask_np, dev)
    return tiles, utile, gmask, t


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
    f1, a1 = mk(1)
    fn, an = mk(CHAIN)
    t1 = timed(f1, a1)
    tn = timed(fn, an)
    return max((tn - t1) / (CHAIN - 1), 1e-9)


def chain(counts_fn, tiles, utile, gmask, t):
    def mk(nsteps):
        @jax.jit
        def f(tiles, utile, gmask):
            def body(carry, _):
                u2 = (utile + carry) % t
                counts = counts_fn(tiles, u2, gmask)
                return (counts[0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (tiles, utile, gmask)

    return mk


CASES = {
    "v0": ("production grouped (RUN=6, T32)", grouped_counts, 6, 32),
    "v1": ("unrolled sibling reduces (RUN=6, T32)", grouped_counts_unrolled, 6, 32),
    "v2": ("unrolled (RUN=12, T32)", grouped_counts_unrolled, 12, 32),
    "v3": (
        "unrolled (RUN=6, T16)",
        lambda t_, u_, g_: grouped_counts_unrolled(t_, u_, g_, tile_rows=16),
        6,
        16,
    ),
    "v4": ("unrolled (RUN=12, T16)",
           lambda t_, u_, g_: grouped_counts_unrolled(t_, u_, g_, tile_rows=16),
           12, 16),
}


def main():
    names = sys.argv[1:] or list(CASES)
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    for name in names:
        label, fn, run, tile_rows = CASES[name]
        tiles, utile, gmask, t = make_inputs(run, tile_rows, rng)
        # parity vs production on the RUN=6/T32 structure
        if name == "v1":
            ref = np.asarray(jax.jit(grouped_counts)(tiles, utile, gmask))
            got = np.asarray(jax.jit(grouped_counts_unrolled)(tiles, utile, gmask))
            assert (ref == got).all(), "v1 parity mismatch"
            print("v1 parity ok", flush=True)
        dt = marginal(chain(fn, tiles, utile, gmask, t))
        rows = B * K * H
        print(
            "%s  %-40s %7.3f ms/step  %7.1f Mrows/s  (U=%d)"
            % (name, label, dt * 1e3, rows / dt / 1e6, utile.shape[1]),
            flush=True,
        )


if __name__ == "__main__":
    main()
