"""Fused Pallas query kernel for the blocked/minimizer layouts.

The north-star kernel of the TPU rebuild (replaces the reference's
storage row fetches + bitarray AND + numpy unpack_and_sum,
``bigsi/graph/index.py:72-80`` and ``bigsi/graph/bigsi.py:35-56``):

    per k-mer: DMA its 32-row tile HBM->VMEM, AND its h hash rows via a
    selection mask, accumulate per-sample hit counts and the exact
    (all-kmers) AND — all inside one kernel, nothing materialized in HBM.

Measured facts driving the design (TPU v5e, this environment):

* random fetches issue at ~33 M/s regardless of size (128 B..4 KB) —
  both XLA gather and manual Pallas DMA;  => performance scales with
  the number of *distinct* fetches, not bytes;
* streaming bandwidth is ~970 GB/s — tiles are small change;
* XLA's fused unpack+sum costs ~10x its VPU roofline.

So the kernel consumes a **deduplicated tile stream**: the host groups
each query's k-mers by tile (consecutive runs suffice — the minimizer
layout produces runs), DMAs each distinct tile once, and every k-mer
reads its tile from a VMEM slot via a precomputed slot index.  With the
minimizer layout (~6 k-mers per distinct tile) the DMA issue count
drops ~6x below the issue-rate wall.

Data layout inside the kernel (per tile, W = 32 words = 1024 samples):

* a tile is ``uint32[TILE_ROWS=32, W=32]`` stored as a fat ``[8, 128]``
  block: lane l of sublane j holds tile row ``4j + l//32``, word
  ``l % 32``;
* the AND over a k-mer's h rows replaces non-selected rows with the
  AND identity and reduces the whole tile: sublane reduce + two
  lane rolls (32, 64) => ``p[l] = presence word l % 32`` (x4 quadrants);
* counts unpack: position (j, l) accumulates sample bit
  ``n = 32*(l % 32) + j + 8*(l // 32)`` — the "twisted" order; callers
  apply :func:`untwist_permutation` once per batch.

Only indexes with exactly W == 32 words (<= 1024 samples per shard) hit
this kernel; wider shards use the jnp path (gathers there carry
proportionally more payload per fetch and are not issue-rate-bound).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 32
W = 32  # words per bitslice row handled by this kernel (1024 samples)
LANES = 128
SUBLANES = 8
CHUNK = 64  # k-mers per grid step; scratch = 2 banks x CHUNK tiles


def untwist_permutation() -> np.ndarray:
    """perm such that counts_linear = counts_twisted.reshape(-1, 1024)[:, perm].

    Twisted position (j, l) holds sample n = 32*(l % 32) + j + 8*(l // 32);
    perm[n] = flat twisted index 128*j + l.
    """
    perm = np.zeros(SUBLANES * LANES, dtype=np.int32)
    for j in range(SUBLANES):
        for l in range(LANES):
            n = 32 * (l % 32) + j + 8 * (l // 32)
            perm[n] = j * LANES + l
    return perm


def build_chunk_streams(tile: np.ndarray, smask: np.ndarray, chunk: int = CHUNK):
    """Host-side stream prep for the fused kernel.

    tile int32[B, K] (tile id per k-mer; K % chunk == 0), smask
    uint32[B, K] (0 = padding k-mer) ->

    * n_unique int32[NC] — distinct tiles per chunk,
    * utile    int32[NC, chunk] — the distinct tiles (padded 0),
    * uslot    int32[NC, chunk] — destination scratch slot per distinct
      tile (bank-alternated: (chunk_idx % 2) * chunk + j),
    * slotidx  int32[B, K] — scratch slot each k-mer reads.

    Deduplication is run-length (consecutive equal tiles merge) — exact
    for the minimizer layout, identity for random tiles.
    """
    b, k = tile.shape
    assert k % chunk == 0
    pad_flat = smask.reshape(-1) == 0
    # pads get a sentinel tile so a real k-mer after a pad never looks
    # like a duplicate of the (unfetched) pad run
    flat = np.where(pad_flat, np.int32(-1), tile.reshape(-1).astype(np.int32))
    nc = flat.shape[0] // chunk
    ch = flat.reshape(nc, chunk)
    new = np.ones((nc, chunk), dtype=bool)
    new[:, 1:] = ch[:, 1:] != ch[:, :-1]
    pad = pad_flat.reshape(nc, chunk)
    new &= ~pad
    local = np.cumsum(new, axis=1) - 1  # slot within chunk (-1 if leading pad)
    local = np.maximum(local, 0)
    n_unique = new.sum(axis=1).astype(np.int32)
    utile = np.zeros((nc, chunk), dtype=np.int32)
    uslot = np.zeros((nc, chunk), dtype=np.int32)
    bank = (np.arange(nc, dtype=np.int32) % 2)[:, None] * chunk
    rows, cols = np.nonzero(new)
    utile[rows, local[rows, cols]] = ch[rows, cols].astype(np.int32)
    uslot[rows, local[rows, cols]] = (bank[rows, 0] + local[rows, cols]).astype(
        np.int32
    )
    slotidx = (bank + local).astype(np.int32).reshape(b, k)
    return n_unique, utile.reshape(-1), uslot.reshape(-1), slotidx.reshape(-1)


def _kernel(nu_ref, utile_ref, uslot_ref, smask_ref, slotidx_ref,
            tiles_hbm, counts_ref, exact_ref, scratch, sems):
    b = pl.program_id(0)
    cc = pl.program_id(1)
    kc = pl.num_programs(1)
    g = b * kc + cc

    # Burst-issue ALL of this chunk's distinct-tile DMAs, then wait and
    # consume — issue and wait stay within ONE grid step (the pattern
    # the Mosaic pipeline model guarantees; an earlier revision issued
    # chunk g+1's DMAs from step g and hung real chips: cross-step
    # in-flight DMAs are not ordered with grid-step revisiting).  Later
    # DMAs of the burst still overlap the wait/consume of earlier ones;
    # only the first tile's HBM latency is exposed per 64-kmer chunk.
    def issue_body(j, _):
        t = utile_ref[g * CHUNK + j]
        s = uslot_ref[g * CHUNK + j]
        pltpu.make_async_copy(
            tiles_hbm.at[pl.ds(t * SUBLANES, SUBLANES), :],
            scratch.at[s],
            sems.at[s],
        ).start()
        return 0

    jax.lax.fori_loop(0, nu_ref[g], issue_body, 0)

    @pl.when(cc == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        exact_ref[:] = jnp.full_like(exact_ref, 0xFFFFFFFF)

    # wait for this chunk's DMAs
    def wait_body(j, _):
        s = uslot_ref[g * CHUNK + j]
        pltpu.make_async_copy(
            tiles_hbm.at[pl.ds(0, SUBLANES), :], scratch.at[s], sems.at[s]
        ).wait()
        return 0

    jax.lax.fori_loop(0, nu_ref[g], wait_body, 0)

    sub = jax.lax.broadcasted_iota(jnp.uint32, (SUBLANES, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (SUBLANES, LANES), 1)
    riot = 4 * sub + lane // 32          # tile row living at (j, l)
    shiftg = sub + 8 * (lane // 32)      # sample bit unpacked at (j, l)
    ones = jnp.uint32(0xFFFFFFFF)

    def consume(c, carry):
        acc, eacc = carry
        i = g * CHUNK + c
        slot = slotidx_ref[i]
        sm = smask_ref[i]
        tile = scratch[slot]  # [8, 128]
        sel = ((sm >> riot) & jnp.uint32(1)) != 0
        masked = jnp.where(sel, tile, ones)
        # AND over the 8 sublanes (jax.lax.reduce has no Pallas TPU
        # lowering; a static unrolled tree does)
        red = masked[0:1, :]
        for j in range(1, SUBLANES):
            red = red & masked[j:j + 1, :]
        red = red & pltpu.roll(red, 32, axis=1)
        red = red & pltpu.roll(red, 64, axis=1)  # p[l] = word l%32, x4
        valid = jnp.where(sm != 0, ones, jnp.uint32(0))
        bits = ((jnp.broadcast_to(red, (SUBLANES, LANES)) >> shiftg)
                & jnp.uint32(1) & valid)
        acc = acc + bits
        eacc = eacc & jnp.where(sm != 0, red, ones)
        return acc, eacc

    acc, eacc = jax.lax.fori_loop(
        0, CHUNK, consume,
        (jnp.zeros((SUBLANES, LANES), jnp.uint32),
         jnp.full((1, LANES), ones, jnp.uint32)),
    )
    counts_ref[0] += acc
    exact_ref[0] &= eacc


# The TPU compiler caps total scalar-prefetch SMEM around ~0.5 MB
# (measured: 5 int32 streams for 64 queries x 512 kmers compile; 128+
# queries crash the compiler).  fused_query slices the batch so each
# pallas_call stays under the cap; slices still pipeline internally.
MAX_KMERS_PER_CALL = 32768


@functools.partial(jax.jit, static_argnames=("b", "k"))
def fused_query(tiles_fat, n_unique, utile, uslot, smask, slotidx, *, b, k):
    """tiles_fat uint32[T*8, 128] + streams -> (counts uint32[b, 8, 128]
    twisted, exact uint32[b, 1, 128])."""
    bsub = max(1, MAX_KMERS_PER_CALL // k)
    kc = k // CHUNK
    if kc % 2 == 1 and bsub > 1:
        bsub -= bsub % 2  # keep slice starts on even chunks (bank parity)
    if b > bsub:
        outs = [
            fused_query(
                tiles_fat,
                n_unique[i * kc:(i + s) * kc],
                utile[i * k:(i + s) * k],
                uslot[i * k:(i + s) * k],
                smask[i * k:(i + s) * k],
                slotidx[i * k:(i + s) * k],
                b=s,
                k=k,
            )
            for i, s in _slices(b, bsub)
        ]
        return (
            jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
        )
    # interpret only on CPU (NB: a TPU reached through a relay may
    # report a platform name that is not "tpu" — test for cpu instead)
    interpret = jax.devices()[0].platform == "cpu"
    counts, exact = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(b, kc),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec((1, SUBLANES, LANES), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, LANES), lambda i, j, *_: (i, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * CHUNK, SUBLANES, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((2 * CHUNK,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, SUBLANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((b, 1, LANES), jnp.uint32),
        ),
        # grid steps carry cross-step state (output accumulation and
        # manual DMA semaphores): force strictly sequential execution
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(n_unique, utile, uslot, smask, slotidx, tiles_fat)
    return counts, exact


def _slices(b, bsub):
    out = []
    i = 0
    while i < b:
        out.append((i, min(bsub, b - i)))
        i += bsub
    return out


def _grouped_kernel(gmask_ref, g_ref, counts_ref, exact_ref, *, r):
    """Per grid step: one query's U gathered tiles (VMEM block) ->
    twisted counts [8, 128] + twisted exact [1, 128].

    Each tile is read from VMEM once per k-mer slot — the whole point:
    the XLA masked-reduce formulation re-reads every tile from HBM once
    per k-mer (~R x more HBM traffic), which round-2 microbenches
    showed is 60% of the grouped step (scripts/microbench_r3.py).
    """
    u = g_ref.shape[1]
    g = g_ref[0]  # [U, 8, 128] fat tiles: row(j,l) = 4j + l//32
    sub = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 2)
    riot = 4 * sub + lane // 32          # tile row living at (j, l)
    shiftg = (sub + 8 * (lane // 32))[0]  # sample bit unpacked at (j, l)
    ones = jnp.uint32(0xFFFFFFFF)

    acc = jnp.zeros((SUBLANES, LANES), jnp.int32)
    eacc = jnp.full((1, LANES), ones, jnp.uint32)
    for slot in range(r):
        gm = gmask_ref[0, :, slot]  # [U]
        sel = (gm[:, None, None] >> riot) & jnp.uint32(1)
        masked = g | (sel - jnp.uint32(1))  # [U, 8, 128]
        red = masked[:, 0, :]
        for j in range(1, SUBLANES):
            red = red & masked[:, j, :]  # [U, 128]
        red = red & pltpu.roll(red, 32, axis=1)
        red = red & pltpu.roll(red, 64, axis=1)  # all 4 quadrants = p[l%32]
        valid = jnp.where(gm != 0, ones, jnp.uint32(0))  # [U]
        bits = (red[:, None, :] >> shiftg[None]) & jnp.uint32(1)
        acc = acc + jnp.sum(
            (bits & valid[:, None, None]).astype(jnp.int32), axis=0
        )
        # exact: AND over valid slots; pad U to a power of two with ones
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouped_fused(tiles, utile, gmask, interpret=None):
    """Grouped (tile-dedup) query step, Pallas-fused presence+counts.

    tiles uint32[T, TILE_ROWS * 32] (W == 32 only), utile int32[B, U],
    gmask uint32[B, U, R] (0 = pad) -> (counts int32[B, 1024] sample
    order, exact_words uint32[B, 32]).

    Drop-in replacement for ops.lookup.grouped_counts that also returns
    the exact-filter AND.  The gather stays in XLA (it runs at HBM
    bandwidth for 4 KB tiles); only the presence expansion + popcount
    accumulate move into the kernel, reading each gathered tile from
    VMEM instead of R times from HBM.
    """
    b, u = utile.shape
    r = gmask.shape[2]
    g = jnp.take(tiles, utile.reshape(-1), axis=0)
    g = g.reshape(b, u, SUBLANES, LANES)  # fat view, no data movement
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    counts_t, exact_t = pl.pallas_call(
        functools.partial(_grouped_kernel, r=r),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, u, r), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, u, SUBLANES, LANES), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, LANES), jnp.uint32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(gmask, g)
    perm = jnp.asarray(untwist_permutation())
    counts = jnp.take(counts_t.reshape(b, SUBLANES * LANES), perm, axis=1)
    exact_words = exact_t[:, 0, :32]
    return counts, exact_words


def query_counts_exact(tiles_fat, tile, smask, chunk: int = CHUNK):
    """High-level wrapper: numpy streams in, untwisted numpy out.

    tiles_fat uint32[T*8, 128] (device), tile int32[B, K],
    smask uint32[B, K] -> (counts int64[B, 1024], exact_words
    uint32[B, 32]).
    """
    b, k = tile.shape
    n_unique, utile, uslot, slotidx = build_chunk_streams(tile, smask, chunk)
    counts_t, exact = fused_query(
        tiles_fat,
        jnp.asarray(n_unique), jnp.asarray(utile), jnp.asarray(uslot),
        jnp.asarray(smask.reshape(-1)), jnp.asarray(slotidx),
        b=b, k=k,
    )
    perm = untwist_permutation()
    counts = np.asarray(counts_t).reshape(b, -1)[:, perm].astype(np.int64)
    exact_words = np.asarray(exact)[:, 0, :32]
    return counts, exact_words
