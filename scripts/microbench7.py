#!/usr/bin/env python
"""A/B-tune the grouped (minimizer tile-dedup) query path on chip.

Variants:
  * R ∈ {6, 8, 12} — k-mers per distinct-tile entry (spill granularity);
  * mask formulation: bool-where vs arithmetic ``g | (sel-1)``;
  * reduce order: reduce rows then expand, vs current expand-then-reduce.

Each variant computes the same counts; timing methodology matches
bench.py (chained lax.scan steps, marginal per-step time).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.lookup import TILE_ROWS, build_grouped_streams, csa_counts

REPEATS = 3
CHAIN = 9


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


def marginal(make):
    f1, a1 = make(1)
    fn, an = make(CHAIN)
    return max((timed(fn, an) - timed(f1, a1)) / (CHAIN - 1), 1e-9)


def grouped_where(tiles, utile, gmask, T):
    """Current formulation (ops/lookup.py:grouped_counts)."""
    b, u = utile.shape
    r = gmask.shape[2]
    w = tiles.shape[1] // TILE_ROWS
    g = jnp.take(tiles, utile.reshape(-1), axis=0).reshape(b, u, TILE_ROWS, w)
    rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, TILE_ROWS, 1), 3)
    sel = ((gmask[:, :, :, None, None] >> rowbit) & jnp.uint32(1)).astype(bool)
    masked = jnp.where(sel, g[:, :, None, :, :], jnp.uint32(0xFFFFFFFF))
    presence = jax.lax.reduce(
        masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (3,)
    )
    valid = (gmask != 0)[..., None]
    rows = jnp.where(valid, presence, jnp.uint32(0)).reshape(b, u * r, w)
    return csa_counts(rows, axis=1)


def grouped_arith(tiles, utile, gmask, T):
    """Arithmetic mask: g | (sel-1); avoids bool cast + select."""
    b, u = utile.shape
    r = gmask.shape[2]
    w = tiles.shape[1] // TILE_ROWS
    g = jnp.take(tiles, utile.reshape(-1), axis=0).reshape(b, u, TILE_ROWS, w)
    rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, TILE_ROWS, 1), 3)
    sel = (gmask[:, :, :, None, None] >> rowbit) & jnp.uint32(1)
    masked = g[:, :, None, :, :] | (sel - jnp.uint32(1))
    presence = jax.lax.reduce(
        masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (3,)
    )
    valid = (gmask != 0)[..., None]
    rows = jnp.where(valid, presence, jnp.uint32(0)).reshape(b, u * r, w)
    return csa_counts(rows, axis=1)


def grouped_unrolled(tiles, utile, gmask, T):
    """Unrolled log-tree AND over rows with masking folded into level 0."""
    b, u = utile.shape
    r = gmask.shape[2]
    w = tiles.shape[1] // TILE_ROWS
    g = jnp.take(tiles, utile.reshape(-1), axis=0).reshape(b, u, TILE_ROWS, w)
    rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, TILE_ROWS, 1), 3)
    sel = (gmask[:, :, :, None, None] >> rowbit) & jnp.uint32(1)
    masked = g[:, :, None, :, :] | (sel - jnp.uint32(1))  # [b,u,r,32,w]
    x = masked
    while x.shape[3] > 1:
        half = x.shape[3] // 2
        x = x[:, :, :, :half, :] & x[:, :, :, half:, :]
    presence = x[:, :, :, 0, :]
    valid = (gmask != 0)[..., None]
    rows = jnp.where(valid, presence, jnp.uint32(0)).reshape(b, u * r, w)
    return csa_counts(rows, axis=1)


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    M = 25_000_000 if on_tpu else 512_000
    N = 1024
    W = N // 32
    B = 256 if on_tpu else 4
    K = 512 if on_tpu else 32
    T = M // TILE_ROWS
    RUN = 6

    rng = np.random.default_rng(0)
    tiles = jax.jit(
        lambda k: jax.random.bits(k, (T, TILE_ROWS * W), jnp.uint32),
        device=dev,
    )(jax.random.PRNGKey(0))
    slots = rng.integers(0, TILE_ROWS, size=(B, K, 3)).astype(np.uint32)
    sm = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
    nruns = (K + RUN - 1) // RUN
    run_tiles = rng.integers(0, T, size=(B, nruns)).astype(np.int32)
    tidx_runs = np.repeat(run_tiles, RUN, axis=1)[:, :K]

    base = None
    for rname, r in (("R=6", 6), ("R=8", 8), ("R=12", 12)):
        utile_np, gmask_np = build_grouped_streams(tidx_runs, sm, r=r)
        utile = jax.device_put(utile_np, dev)
        gmask = jax.device_put(gmask_np, dev)
        for fname, fn in (
            ("where", grouped_where),
            ("arith", grouped_arith),
            ("unrolled", grouped_unrolled),
        ):
            if r != 6 and fname == "unrolled":
                continue

            def make(nsteps, fn=fn):
                @jax.jit
                def f(tiles, utile, gmask):
                    def body(carry, _):
                        u2 = (utile + carry) % T
                        counts = fn(tiles, u2, gmask, T)
                        return (counts[0, 0] & jnp.int32(7)) + 1, ()

                    carry, _ = jax.lax.scan(
                        body, jnp.int32(0), None, length=nsteps
                    )
                    return carry.reshape(1)

                return f, (tiles, utile, gmask)

            # correctness cross-check at step 0
            ref = grouped_where(tiles, utile, gmask, T)
            got = fn(tiles, utile, gmask, T)
            ok = bool(jnp.all(ref == got))
            dt = marginal(make)
            rows = B * K * 3
            qps = B / dt
            line = "%-5s %-9s U=%-4d %8.3f ms/step -> %7.1f Mrows/s, %6.0f q/s %s" % (
                rname, fname, utile_np.shape[1], dt * 1e3,
                rows / dt / 1e6, qps, "" if ok else "MISMATCH",
            )
            print(line, flush=True)


if __name__ == "__main__":
    main()
