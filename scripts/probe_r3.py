#!/usr/bin/env python
"""Round-3 probes: where is the grouped16 step's remaining time, and do
longer minimizer runs (RUN=8/10 via w=15/19 windows) pay?

Current headline (bench.py): grouped16 0.624 ms/step = 630 Mrows/s at
B=256, K=512, H=3, RUN=6, tile_rows=16.  Target 0.393 ms (1e9 rows/s).

Cases (all pure XLA — no Mosaic risk):
  floor16 / floor24 / floor32 — gather of the grouped step's tile set
      fused into ONE XOR-reduce (no materialize): the fetch-wall floor.
  nocsa16 — grouped presence expansion without the csa tree (isolates
      the counts cost).
  g16r6 (production), g16r8, g24r8, g24r10, g32r10, g32r12 — density-
      matched (RUN, tile_rows) ladder: RUN=8 needs w=15 (s=17) minimizer
      windows, RUN=10 needs w=19 (s=13); both keep 4^s >> dataset k-mer
      counts (the s=9 collapse in hashing/scheme.py does NOT apply).
  split16 — two parallel half-gathers (does XLA overlap gather issue?).

Usage: python scripts/probe_r3.py [case ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.lookup import build_grouped_streams, grouped_counts

B, K, H, N = 256, 512, 3, 1024
W = N // 32
M = 25_000_000
CHAIN, REPEATS = 9, 3


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
                return (counts.reshape(-1)[0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (tiles, utile, gmask)

    return mk


def gather_floor(tiles, utile, gmask):
    """Fetch-wall floor: the same gather, ONE fused XOR reduce."""
    b, u = utile.shape
    g = jnp.take(tiles, utile.reshape(-1), axis=0)
    return jax.lax.reduce(
        g, jnp.uint32(0), jax.lax.bitwise_xor, (0, 1)
    ).astype(jnp.int32)[None]


def grouped_nocsa(tiles, utile, gmask, tile_rows):
    """Presence expansion only: XOR-fold the presence rows (no csa)."""
    b, u = utile.shape
    r = gmask.shape[2]
    w = tiles.shape[1] // tile_rows
    g = jnp.take(tiles, utile.reshape(-1), axis=0).reshape(b, u, tile_rows, w)
    rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, tile_rows, 1), 2)
    acc = jnp.zeros((b, u, w), jnp.uint32)
    for j in range(r):
        sel = (gmask[:, :, j, None, None] >> rowbit) & jnp.uint32(1)
        masked = g | (sel - jnp.uint32(1))
        p = jax.lax.reduce(
            masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (2,)
        )
        valid = (gmask[:, :, j] != 0)[..., None]
        acc = acc ^ jnp.where(valid, p, jnp.uint32(0))
    return acc.astype(jnp.int32).reshape(b, -1)


def grouped_split(tiles, utile, gmask, tile_rows):
    """Production math, gather split in two (issue-overlap probe)."""
    b, u = utile.shape
    h = u // 2
    from bigsi_tpu.ops.lookup import csa_counts

    r = gmask.shape[2]
    w = tiles.shape[1] // tile_rows
    parts = []
    for sl in (slice(0, h), slice(h, u)):
        ut = utile[:, sl]
        gm = gmask[:, sl]
        uu = ut.shape[1]
        g = jnp.take(tiles, ut.reshape(-1), axis=0).reshape(b, uu, tile_rows, w)
        rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, tile_rows, 1), 2)
        for j in range(r):
            sel = (gm[:, :, j, None, None] >> rowbit) & jnp.uint32(1)
            masked = g | (sel - jnp.uint32(1))
            p = jax.lax.reduce(
                masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (2,)
            )
            valid = (gm[:, :, j] != 0)[..., None]
            parts.append(jnp.where(valid, p, jnp.uint32(0)))
    rows = jnp.concatenate(
        [p[:, :, None, :] for p in parts], axis=2
    ).reshape(b, -1, w)
    return csa_counts(rows, axis=1)


def grouped_counts_inline_csa(tiles, utile, gmask, tile_rows):
    """Production sibling reduces, but presence PAIRS combine into
    bit-sliced count planes inside the same fusion (csa level 1 before
    anything hits HBM): materialized bytes drop from [B, U*R, W] to
    ~2 planes of [B, U*ceil(R/2), W]."""
    from bigsi_tpu.ops.lookup import csa_counts_planes

    b, u = utile.shape
    r = gmask.shape[2]
    w = tiles.shape[1] // tile_rows
    g = jnp.take(tiles, utile.reshape(-1), axis=0).reshape(b, u, tile_rows, w)
    rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, tile_rows, 1), 2)

    def pres(j):
        sel = (gmask[:, :, j, None, None] >> rowbit) & jnp.uint32(1)
        masked = g | (sel - jnp.uint32(1))
        p = jax.lax.reduce(
            masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (2,)
        )
        valid = (gmask[:, :, j] != 0)[..., None]
        return jnp.where(valid, p, jnp.uint32(0))

    s_planes, c_planes = [], []
    for j in range(0, r - 1, 2):
        a, bb = pres(j), pres(j + 1)
        s_planes.append(a ^ bb)
        c_planes.append(a & bb)
    if r % 2:
        s_planes.append(pres(r - 1))
        c_planes.append(jnp.zeros_like(s_planes[-1]))
    p0 = jnp.stack(s_planes, axis=2).reshape(b, -1, w)
    p1 = jnp.stack(c_planes, axis=2).reshape(b, -1, w)
    return csa_counts_planes([p0, p1], axis=1)


CASES = {
    "floor16": ("gather floor (RUN=6, T16)", gather_floor, 6, 16),
    "floor24": ("gather floor (RUN=8, T24)", gather_floor, 8, 24),
    "floor32": ("gather floor (RUN=10, T32)", gather_floor, 10, 32),
    "nocsa16": (
        "presence only, no csa (RUN=6, T16)",
        lambda t_, u_, g_: grouped_nocsa(t_, u_, g_, 16), 6, 16),
    "g16r6": (
        "production grouped (RUN=6, T16)",
        lambda t_, u_, g_: grouped_counts(t_, u_, g_, 16), 6, 16),
    "g16r8": (
        "grouped (RUN=8, T16) dense",
        lambda t_, u_, g_: grouped_counts(t_, u_, g_, 16), 8, 16),
    "g24r8": (
        "grouped (RUN=8, T24)",
        lambda t_, u_, g_: grouped_counts(t_, u_, g_, 24), 8, 24),
    "g24r10": (
        "grouped (RUN=10, T24) dense",
        lambda t_, u_, g_: grouped_counts(t_, u_, g_, 24), 10, 24),
    "g32r10": (
        "grouped (RUN=10, T32)",
        lambda t_, u_, g_: grouped_counts(t_, u_, g_, 32), 10, 32),
    "g32r12": (
        "grouped (RUN=12, T32) dense",
        lambda t_, u_, g_: grouped_counts(t_, u_, g_, 32), 12, 32),
    "split16": (
        "split gather x2 (RUN=6, T16)",
        lambda t_, u_, g_: grouped_split(t_, u_, g_, 16), 6, 16),
    "inline16": (
        "inline csa level-1 (RUN=6, T16)",
        lambda t_, u_, g_: grouped_counts_inline_csa(t_, u_, g_, 16), 6, 16),
    "inline32r10": (
        "inline csa level-1 (RUN=10, T32)",
        lambda t_, u_, g_: grouped_counts_inline_csa(t_, u_, g_, 32), 10, 32),
}


# Column-major tile layout (round 3): presence = (col & gmask) == gmask,
# ONE compare per sample — no masked AND-reduce, no csa tree.  The whole
# step is a single fused XLA gather -> compare -> sum reduction.
COLS_CASES = {
    "cols16": ("cols layout (RUN=6, T16)", 6, 16),
    "cols16r8": ("cols layout (RUN=8, T16) dense", 8, 16),
    "cols32r10": ("cols layout (RUN=10, T32) dense", 10, 32),
    "cols8r6": ("cols layout (RUN=6, T8)", 6, 8),
}


def _cols_compare_parts(g, gmask):
    """Per-entry int32 partial counts: sum of the r presence compares."""
    import jax.numpy as jnp

    r = gmask.shape[2]
    gm = gmask.astype(g.dtype)
    part = None
    for j in range(r):
        gmj = gm[:, :, j][:, :, None]
        pj = ((g & gmj) == gmj).astype(jnp.int32)
        part = pj if part is None else part + pj
    return part


def make_cols_variant(kind):
    import jax.numpy as jnp

    def fn(cols, utile, gmask):
        b, u = utile.shape
        g = jnp.take(cols, utile.reshape(-1), axis=0).reshape(b, u, -1)
        if kind == "floor":  # gather read floor: fused XOR fold
            return jax.lax.reduce(
                g.astype(jnp.uint32), jnp.uint32(0), jax.lax.bitwise_xor, (0, 1)
            ).astype(jnp.int32)[None]
        if kind == "nosum":  # compares, XOR-folded (isolates sum cost)
            part = _cols_compare_parts(g, gmask)
            return jax.lax.reduce(
                part.astype(jnp.uint32), jnp.uint32(0), jax.lax.bitwise_xor, (1,)
            ).astype(jnp.int32)
        if kind == "split2":  # two independent half-U chains
            h = u // 2
            out = None
            for sl in (slice(0, h), slice(h, u)):
                part = _cols_compare_parts(g[:, sl], gmask[:, sl])
                s = part.sum(axis=1, dtype=jnp.int32)
                out = s if out is None else out + s
            return out
        if kind == "split4":
            q = u // 4
            out = None
            for i in range(4):
                sl = slice(i * q, (i + 1) * q)
                part = _cols_compare_parts(g[:, sl], gmask[:, sl])
                s = part.sum(axis=1, dtype=jnp.int32)
                out = s if out is None else out + s
            return out
        if kind == "mxu":  # U-sum as a bf16 matvec on the MXU
            part = _cols_compare_parts(g, gmask).astype(jnp.bfloat16)
            ones = jnp.ones((u,), jnp.bfloat16)
            return jnp.einsum(
                "bun,u->bn", part, ones,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
        raise ValueError(kind)

    return fn


COLS_VARIANTS = {
    "colsfloor16r8": ("cols gather floor (RUN=8, T16)", "floor", 8, 16),
    "colsnosum16r8": ("cols compares no-sum (RUN=8, T16)", "nosum", 8, 16),
    "colssplit2_16r8": ("cols split2 (RUN=8, T16)", "split2", 8, 16),
    "colssplit4_16r8": ("cols split4 (RUN=8, T16)", "split4", 8, 16),
    "colsmxu16r8": ("cols MXU matvec sum (RUN=8, T16)", "mxu", 8, 16),
    "colssplit2_16r6": ("cols split2 (RUN=6, T16)", "split2", 6, 16),
    "colsmxu16r6": ("cols MXU matvec sum (RUN=6, T16)", "mxu", 6, 16),
}


def main():
    names = sys.argv[1:] or (
        list(CASES) + list(COLS_CASES) + list(COLS_VARIANTS)
    )
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    for name in names:
        if name in COLS_CASES or name in COLS_VARIANTS:
            from bigsi_tpu.ops.lookup import grouped_counts_cols, pack_tile_cols

            if name in COLS_CASES:
                label, run, tile_rows = COLS_CASES[name]
                n_valid = jax.device_put(np.full(B, K, dtype=np.int32), dev)

                def cols_fn(c_, u_, g_):
                    return grouped_counts_cols(c_, u_, g_, n_valid)
            else:
                label, kind, run, tile_rows = COLS_VARIANTS[name]
                cols_fn = make_cols_variant(kind)
            tiles, utile, gmask, t = make_inputs(run, tile_rows, rng)
            cols = jax.jit(pack_tile_cols, static_argnums=1)(tiles, tile_rows)
            cols.block_until_ready()
            del tiles
            dt = marginal(chain(cols_fn, cols, utile, gmask, t))
            rows = B * K * H
            print(
                "%-8s %-38s %7.3f ms/step  %7.1f Mrows/s  (U=%d)"
                % (name, label, dt * 1e3, rows / dt / 1e6, utile.shape[1]),
                flush=True,
            )
            del cols
            continue
        label, fn, run, tile_rows = CASES[name]
        tiles, utile, gmask, t = make_inputs(run, tile_rows, rng)
        dt = marginal(chain(fn, tiles, utile, gmask, t))
        rows = B * K * H
        print(
            "%-8s %-38s %7.3f ms/step  %7.1f Mrows/s  (U=%d)"
            % (name, label, dt * 1e3, rows / dt / 1e6, utile.shape[1]),
            flush=True,
        )
        del tiles


if __name__ == "__main__":
    main()
