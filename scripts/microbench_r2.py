#!/usr/bin/env python
"""Round-2 on-chip measurements that decide the query-path redesign.

Methodology (same as bench.py): the relay costs ~26-100 ms per program
execution, so steps are chained INSIDE one compiled program with
lax.scan (data-dependent perturbation so XLA cannot collapse the
chain); marginal per-step time = (t_n - t_1)/(n - 1), min over repeats.

Cases:
  stages   — grouped path split: gather-only vs full (compute share)
  fetchsz  — random-fetch rate vs fetch SIZE at constant total bytes
             (is the 33 M/s issue wall size-independent past 4 KB?)
  sorted   — random vs sorted gather indices
  localsel — take_along_axis row select from a materialized [F, TR, W]
             vs the 32-row masked reduce on the same input

Usage: python scripts/microbench_r2.py [case ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.lookup import build_grouped_streams, grouped_counts, csa_counts

M = 25_000_000
W = 32          # 1024 samples
TR = 32
T = M // TR
B, K, H, RUN = 256, 512, 3, 6
CHAIN = 9
REPEATS = 3


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
    t1 = timed(f1, a1)
    tn = timed(fn, an)
    return max((tn - t1) / (CHAIN - 1), 1e-9)


def scan_chain(body_fn):
    """body_fn(carry_int32) -> int32 perturbation for next step."""
    def make(nsteps):
        @jax.jit
        def f(*args):
            def body(carry, _):
                return body_fn(carry, *args), ()
            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)
        return f
    return make


def report(name, dt, extra=""):
    rows = B * K * H
    print("%-30s %9.3f ms  %8.1f Mrows/s  %s"
          % (name, dt * 1e3, rows / dt / 1e6, extra), flush=True)


def main():
    cases = set(sys.argv[1:]) or {"stages", "fetchsz", "sorted", "localsel"}
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    tiles = jax.jit(
        lambda key: jax.random.bits(key, (T, TR * W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    nt = (B * K + RUN - 1) // RUN
    base = rng.integers(0, T, size=nt).astype(np.int32)
    tile_ids = np.repeat(base, RUN)[: B * K].reshape(B, K)
    slots = rng.integers(0, TR, size=(B, K, H)).astype(np.uint32)
    smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
    t0 = time.perf_counter()
    utile, gmask = build_grouped_streams(tile_ids, smask, r=RUN)
    host_ms = (time.perf_counter() - t0) * 1e3
    u = utile.shape[1]
    nfetch = B * u
    utile_d, gmask_d = jnp.asarray(utile), jnp.asarray(gmask)
    print("host prep build_grouped_streams: %.2f ms  (U=%d, fetches=%d)"
          % (host_ms, u, nfetch), flush=True)

    if "stages" in cases:
        def full_body(carry, tiles, ut, gm):
            c = grouped_counts(tiles, (ut + carry) % T, gm)
            return (c[0, 0] & jnp.int32(7)) + 1

        def gather_body(carry, tiles, ut, gm):
            g = jnp.take(tiles, ((ut + carry) % T).reshape(-1), axis=0)
            r = jax.lax.reduce(g, jnp.uint32(0), jax.lax.bitwise_xor, (0, 1))
            return (r & jnp.uint32(7)).astype(jnp.int32) + 1

        mk = scan_chain(full_body)
        report("grouped full",
               marginal(lambda n: (mk(n), (tiles, utile_d, gmask_d))),
               "fetches=%d" % nfetch)
        mk = scan_chain(gather_body)
        report("grouped gather-only",
               marginal(lambda n: (mk(n), (tiles, utile_d, gmask_d))),
               "fetches=%d" % nfetch)

    if "fetchsz" in cases:
        total_words = nfetch * TR * W
        for rows_per in (32, 64, 128, 256):
            rw = rows_per * W
            tmax = (T * TR) // rows_per
            big = tiles.reshape(-1)[: tmax * rw].reshape(tmax, rw)
            f = total_words // rw
            idx = jnp.asarray(rng.integers(0, tmax, size=f).astype(np.int32))

            def g_body(carry, big, idx, tmax=tmax):
                g = jnp.take(big, (idx + carry) % tmax, axis=0)
                r = jax.lax.reduce(g, jnp.uint32(0), jax.lax.bitwise_xor,
                                   (0, 1))
                return (r & jnp.uint32(7)).astype(jnp.int32) + 1

            mk = scan_chain(g_body)
            dt = marginal(lambda n: (mk(n), (big, idx)))
            print("%-30s %9.3f ms  %6.1f Mfetch/s  %6.1f GB/s"
                  % ("gather %5dB x %d" % (rw * 4, f), dt * 1e3,
                     f / dt / 1e6, total_words * 4 / dt / 1e9), flush=True)

    if "sorted" in cases:
        f = B * K
        ridx = rng.integers(0, T, size=f).astype(np.int32)
        for name, idx in (("random", ridx), ("sorted", np.sort(ridx))):
            idx_d = jnp.asarray(idx)

            def g_body(carry, tiles, idx):
                g = jnp.take(tiles, (idx + carry) % T, axis=0)
                r = jax.lax.reduce(g, jnp.uint32(0), jax.lax.bitwise_xor,
                                   (0, 1))
                return (r & jnp.uint32(7)).astype(jnp.int32) + 1

            mk = scan_chain(g_body)
            dt = marginal(lambda n: (mk(n), (tiles, idx_d)))
            print("%-30s %9.3f ms  %6.1f Mfetch/s"
                  % ("gather 4KB %s x %d" % (name, f), dt * 1e3,
                     f / dt / 1e6), flush=True)

    if "localsel" in cases:
        f = nfetch
        g0 = jax.jit(
            lambda key: jax.random.bits(key, (f, TR, W), jnp.uint32),
            device=dev,
        )(jax.random.PRNGKey(1))
        sl = jnp.asarray(rng.integers(0, TR, size=(f, H, 1)).astype(np.int32))
        sm = jnp.asarray(smask.reshape(-1)[:f])

        def local_body(carry, g0, sl):
            idx = (sl + carry) % TR
            rows = jnp.take_along_axis(
                g0, jnp.broadcast_to(idx, (f, H, W)), axis=1
            )
            p = rows[:, 0, :]
            for j in range(1, H):
                p = p & rows[:, j, :]
            c = csa_counts(p.reshape(B, -1, W), axis=1)
            return (c[0, 0] & jnp.int32(7)) + 1

        mk = scan_chain(local_body)
        report("localsel take_along_axis",
               marginal(lambda n: (mk(n), (g0, sl))), "F=%d" % f)

        def masked_body(carry, g0, sm):
            rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, TR, 1), 1)
            sel = (((sm + jnp.uint32(carry)) [:, None, None] >> rowbit)
                   & jnp.uint32(1))
            masked = g0 | (sel - jnp.uint32(1))
            p = jax.lax.reduce(
                masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (1,)
            )
            c = csa_counts(p.reshape(B, -1, W), axis=1)
            return (c[0, 0] & jnp.int32(7)) + 1

        mk = scan_chain(masked_body)
        report("masked reduce (same input)",
               marginal(lambda n: (mk(n), (g0, sm))), "F=%d" % f)


if __name__ == "__main__":
    main()


def compute_split():
    """presence-expansion vs csa cost inside grouped_counts."""
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    tiles = jax.jit(
        lambda key: jax.random.bits(key, (T, TR * W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    nt = (B * K + RUN - 1) // RUN
    base = rng.integers(0, T, size=nt).astype(np.int32)
    tile_ids = np.repeat(base, RUN)[: B * K].reshape(B, K)
    slots = rng.integers(0, TR, size=(B, K, H)).astype(np.uint32)
    smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
    utile, gmask = build_grouped_streams(tile_ids, smask, r=RUN)
    u = utile.shape[1]
    utile_d, gmask_d = jnp.asarray(utile), jnp.asarray(gmask)

    def presence_body(carry, tiles, ut, gm):
        g = jnp.take(tiles, ((ut + carry) % T).reshape(-1), axis=0)
        g = g.reshape(B, u, TR, W)
        rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, TR, 1), 3)
        sel = (gm[:, :, :, None, None] >> rowbit) & jnp.uint32(1)
        masked = g[:, :, None, :, :] | (sel - jnp.uint32(1))
        presence = jax.lax.reduce(
            masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (3,)
        )
        r = jax.lax.reduce(presence, jnp.uint32(0), jax.lax.bitwise_xor,
                           (0, 1, 2, 3))
        return (r & jnp.uint32(7)).astype(jnp.int32) + 1

    mk = scan_chain(presence_body)
    report("gather+presence (no csa)",
           marginal(lambda n: (mk(n), (tiles, utile_d, gmask_d))))

    rows = jax.jit(
        lambda key: jax.random.bits(key, (B, u * RUN, W), jnp.uint32),
        device=dev,
    )(jax.random.PRNGKey(2))

    def csa_body(carry, rows):
        r2 = rows ^ jnp.uint32(carry)
        c = csa_counts(r2, axis=1)
        return (c[0, 0] & jnp.int32(7)) + 1

    mk = scan_chain(csa_body)
    report("csa_counts only [B,%d,W]" % (u * RUN),
           marginal(lambda n: (mk(n), (rows,))))


if "split" in set(sys.argv[1:]):
    compute_split()
