#!/usr/bin/env python
"""THE parameterized on-chip microbenchmark (consolidates the round-1/2
microbench* scripts; findings live in docs/DESIGN.md's measured-facts
tables).

Methodology: the relay costs ~26-100 ms per program execution, so steps
chain INSIDE one compiled program (lax.scan with a data-dependent
carry); marginal per-step time = (t_n - t_1)/(n - 1), min over repeats.

Cases (python scripts/microbench.py CASE [CASE ...]):

  gather-size    random-gather rate vs fetch size at constant bytes
  gather-sorted  sorted vs random gather indices
  grouped-split  grouped path: full / gather-only / +presence / csa-only
  pallas-floor   XLA gather -> pallas block XOR (pallas baseline cost)
  pallas-work    XLA gather -> pallas presence+unpack kernel
  fused          round-1 manual-DMA fused kernel (random vs run~6 dedup)
  fused-v2       prefetch-gather + packed-CSA kernel (pallas_grouped)

Shape knobs: --b --k --run (defaults: the bench.py headline config).
WEDGE SAFETY (docs/DESIGN.md): run ONE pallas case per process, under
`timeout`, and probe the chip with a trivial op after failures.
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

M = 25_000_000
W, TR = 32, 32
T = M // TR
CHAIN, REPEATS = 9, 3


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


def scan_chain(body_fn, args):
    def mk(nsteps):
        @jax.jit
        def f(*a):
            def body(carry, _):
                return body_fn(carry, *a), ()
            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)
        return f, args
    return mk


class Ctx:
    """Shared device matrix + grouped streams for the chosen shape."""

    def __init__(self, b, k, h, run):
        self.b, self.k, self.h, self.run = b, k, h, run
        dev = jax.devices()[0]
        print("device:", dev, flush=True)
        self.tiles = jax.jit(
            lambda key: jax.random.bits(key, (T, TR * W), jnp.uint32),
            device=dev,
        )(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        nt = (b * k + run - 1) // run
        base = rng.integers(0, T, size=nt).astype(np.int32)
        self.tile_ids = np.repeat(base, run)[: b * k].reshape(b, k)
        slots = rng.integers(0, TR, size=(b, k, h)).astype(np.uint32)
        self.smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
        from bigsi_tpu.ops.lookup import build_grouped_streams

        t0 = time.perf_counter()
        self.utile, self.gmask = build_grouped_streams(
            self.tile_ids, self.smask, r=run
        )
        self.host_prep_ms = (time.perf_counter() - t0) * 1e3
        self.u = self.utile.shape[1]
        self.ut = jnp.asarray(self.utile)
        self.gm = jnp.asarray(self.gmask)
        self.rng = rng
        print("B=%d K=%d h=%d run=%d U=%d fetches=%d host_prep=%.1fms"
              % (b, k, h, run, self.u, b * self.u, self.host_prep_ms),
              flush=True)

    def report(self, name, dt, extra=""):
        rows = self.b * self.k * self.h
        print("%-28s %9.3f ms  %8.1f Mrows/s  %s"
              % (name, dt * 1e3, rows / dt / 1e6, extra), flush=True)


def case_gather_size(ctx):
    total_words = ctx.b * ctx.u * TR * W
    for rows_per in (32, 64, 128, 256):
        rw = rows_per * W
        tmax = (T * TR) // rows_per
        big = ctx.tiles.reshape(-1)[: tmax * rw].reshape(tmax, rw)
        f = total_words // rw
        idx = jnp.asarray(
            ctx.rng.integers(0, tmax, size=f).astype(np.int32)
        )

        def body(carry, big, idx, tmax=tmax):
            g = jnp.take(big, (idx + carry) % tmax, axis=0)
            r = jax.lax.reduce(g, jnp.uint32(0), jax.lax.bitwise_xor, (0, 1))
            return (r & jnp.uint32(7)).astype(jnp.int32) + 1

        dt = marginal(scan_chain(body, (big, idx)))
        print("%-28s %9.3f ms  %6.1f Mfetch/s  %6.1f GB/s"
              % ("gather %5dB x %d" % (rw * 4, f), dt * 1e3,
                 f / dt / 1e6, total_words * 4 / dt / 1e9), flush=True)


def case_gather_sorted(ctx):
    f = ctx.b * ctx.k
    ridx = ctx.rng.integers(0, T, size=f).astype(np.int32)
    for name, idx in (("random", ridx), ("sorted", np.sort(ridx))):
        idx_d = jnp.asarray(idx)

        def body(carry, tiles, idx):
            g = jnp.take(tiles, (idx + carry) % T, axis=0)
            r = jax.lax.reduce(g, jnp.uint32(0), jax.lax.bitwise_xor, (0, 1))
            return (r & jnp.uint32(7)).astype(jnp.int32) + 1

        dt = marginal(scan_chain(body, (ctx.tiles, idx_d)))
        print("%-28s %9.3f ms  %6.1f Mfetch/s"
              % ("gather 4KB %s" % name, dt * 1e3, f / dt / 1e6), flush=True)


def case_grouped_split(ctx):
    from bigsi_tpu.ops.lookup import csa_counts, grouped_counts

    b, u, run = ctx.b, ctx.u, ctx.run

    def full(carry, tiles, ut, gm):
        c = grouped_counts(tiles, (ut + carry) % T, gm)
        return (c[0, 0] & jnp.int32(7)) + 1

    def gather_only(carry, tiles, ut, gm):
        g = jnp.take(tiles, ((ut + carry) % T).reshape(-1), axis=0)
        r = jax.lax.reduce(g, jnp.uint32(0), jax.lax.bitwise_xor, (0, 1))
        return (r & jnp.uint32(7)).astype(jnp.int32) + 1

    def gather_presence(carry, tiles, ut, gm):
        g = jnp.take(tiles, ((ut + carry) % T).reshape(-1), axis=0)
        g = g.reshape(b, u, TR, W)
        rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, TR, 1), 3)
        sel = (gm[:, :, :, None, None] >> rowbit) & jnp.uint32(1)
        masked = g[:, :, None, :, :] | (sel - jnp.uint32(1))
        p = jax.lax.reduce(
            masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (3,)
        )
        r = jax.lax.reduce(p, jnp.uint32(0), jax.lax.bitwise_xor,
                           (0, 1, 2, 3))
        return (r & jnp.uint32(7)).astype(jnp.int32) + 1

    args = (ctx.tiles, ctx.ut, ctx.gm)
    ctx.report("grouped full", marginal(scan_chain(full, args)))
    ctx.report("grouped gather-only", marginal(scan_chain(gather_only, args)))
    ctx.report("gather+presence (no csa)",
               marginal(scan_chain(gather_presence, args)))

    rows = jax.jit(
        lambda key: jax.random.bits(key, (b, u * run, W), jnp.uint32),
    )(jax.random.PRNGKey(2))

    def csa_only(carry, rows):
        c = csa_counts(rows ^ jnp.uint32(carry), axis=1)
        return (c[0, 0] & jnp.int32(7)) + 1

    ctx.report("csa only", marginal(scan_chain(csa_only, (rows,))))


def _pallas_grouped(ctx, kern_name):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, u, run = ctx.b, ctx.u, ctx.run
    S, L = 8, 128

    def kern_floor(gm_ref, g_ref, out_ref):
        g = g_ref[...]
        acc = g[:, 0]
        for i in range(1, u):
            acc = acc ^ g[:, i]
        out_ref[...] = acc.astype(jnp.int32)

    def kern_work(gm_ref, g_ref, out_ref):
        g = g_ref[...]
        sub = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, S, L), 2)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, S, L), 3)
        riot = 4 * sub + lane // 32
        shiftg = sub + 8 * (lane // 32)
        bq = g.shape[0]
        acc = jnp.zeros((bq, S, L), jnp.int32)
        for slot in range(run):
            gm = gm_ref[:, :, slot]
            sel = (gm[:, :, None, None] >> riot) & jnp.uint32(1)
            m = g | (sel - jnp.uint32(1))
            red = m[:, :, 0, :]
            for j in range(1, S):
                red = red & m[:, :, j, :]
            red = red & pltpu.roll(red, 32, axis=2)
            red = red & pltpu.roll(red, 64, axis=2)
            valid = jnp.where(gm != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
            bits = (red[:, :, None, :] >> shiftg) & jnp.uint32(1)
            acc = acc + jnp.sum(
                (bits & valid[:, :, None, None]).astype(jnp.int32), axis=1
            )
        out_ref[...] = acc

    kern = {"floor": kern_floor, "work": kern_work}[kern_name]
    BQ = 8

    def body(carry, tiles, ut, gm):
        g = jnp.take(tiles, ((ut + carry) % T).reshape(-1), axis=0)
        g = g.reshape(b, u, S, L)
        out = pl.pallas_call(
            kern,
            grid=(b // BQ,),
            in_specs=[
                pl.BlockSpec((BQ, u, run), lambda i: (i, 0, 0)),
                pl.BlockSpec((BQ, u, S, L), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((BQ, S, L), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, S, L), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(gm, g)
        return (out[0, 0, 0] & jnp.int32(7)) + 1

    ctx.report("pallas-" + kern_name,
               marginal(scan_chain(body, (ctx.tiles, ctx.ut, ctx.gm))))


def case_fused(ctx):
    from bigsi_tpu.ops.pallas_lookup import build_chunk_streams, fused_query

    b, k = ctx.b, ctx.k
    n_unique, utile, uslot, slotidx = build_chunk_streams(
        ctx.tile_ids, ctx.smask
    )
    args0 = [jnp.asarray(x) for x in
             (n_unique, utile, uslot, ctx.smask.reshape(-1), slotidx)]

    def body(carry, tiles_fat, nu, ut2, us, sm, si):
        c, e = fused_query(tiles_fat, nu, (ut2 + carry) % T, us, sm, si,
                           b=b, k=k)
        return (c[0, 0, 0] & jnp.int32(7)) + 1

    tiles_fat = ctx.tiles.reshape(-1, 128)
    ctx.report("fused (manual DMA)",
               marginal(scan_chain(body, (tiles_fat, *args0))))


def case_fused_v2(ctx):
    from bigsi_tpu.ops.pallas_grouped import grouped_fused_v2

    def body(carry, tiles, ut, gm):
        c, e = grouped_fused_v2(tiles, (ut + carry) % T, gm)
        return (c[0, 0] & jnp.int32(7)) + 1

    ctx.report("fused-v2 (prefetch+csa)",
               marginal(scan_chain(body, (ctx.tiles, ctx.ut, ctx.gm))))


CASES = {
    "gather-size": case_gather_size,
    "gather-sorted": case_gather_sorted,
    "grouped-split": case_grouped_split,
    "pallas-floor": lambda ctx: _pallas_grouped(ctx, "floor"),
    "pallas-work": lambda ctx: _pallas_grouped(ctx, "work"),
    "fused": case_fused,
    "fused-v2": case_fused_v2,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cases", nargs="+", choices=sorted(CASES))
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--h", type=int, default=3)
    ap.add_argument("--run", type=int, default=6)
    args = ap.parse_args()
    ctx = Ctx(args.b, args.k, args.h, args.run)
    for case in args.cases:
        CASES[case](ctx)


if __name__ == "__main__":
    main()
