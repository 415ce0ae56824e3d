"""Device query ops (pure jnp / XLA).

The query pipeline over the packed bitslice matrix ``uint32[m, W]``:

1. gather the ``h`` hash rows of each k-mer (``jnp.take``),
2. AND over ``h`` -> per-kmer presence ``uint32[K, W]``,
3. either AND over k-mers (exact filter) or unpack + sum (hit counts).

Replaces the reference's storage row fetches + bitarray ops
(``bigsi/graph/index.py:72-80``, ``bigsi/graph/bigsi.py:35-56``).
These are the XLA-fused reference kernels; the Pallas versions in
:mod:`bigsi_tpu.ops.pallas_lookup` fuse the gather with the
AND/popcount accumulation to avoid materializing ``[K*h, W]`` in HBM.

All shapes are static: callers bucket ``K`` (pad row indices with 0)
and pass a validity mask.  Padding k-mers contribute the AND identity
(all-ones) to the exact filter and zero to the counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def _bit_shifts():
    # fresh per trace — caching a jnp array globally would leak tracers
    # when first materialized inside a jit trace
    return jnp.arange(32, dtype=jnp.uint32)


def and_rows_jnp(matrix: jax.Array, row_idx: jax.Array) -> jax.Array:
    """matrix uint32[m, W], row_idx int32[K, h] -> uint32[K, W]."""
    rows = jnp.take(matrix, row_idx.reshape(-1), axis=0)
    rows = rows.reshape(row_idx.shape[0], row_idx.shape[1], -1)
    # unrolled AND over the (small, static) h axis
    out = rows[:, 0, :]
    for j in range(1, row_idx.shape[1]):
        out = out & rows[:, j, :]
    return out


def unpack_words(packed: jax.Array) -> jax.Array:
    """uint32[..., W] -> uint8 bits [..., W*32] (sample-ordered)."""
    bits = (packed[..., None] >> _bit_shifts()) & jnp.uint32(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 32).astype(jnp.uint8)


def counts_from_packed(packed: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-sample hit counts: uint32[K, W], bool[K] -> int32[W*32].

    Equivalent of ``unpack_and_sum`` (``bigsi.py:35-44``), fused by XLA:
    the [K, W, 32] unpack never materializes.
    """
    bits = (packed[:, :, None] >> _bit_shifts()[None, None, :]) & jnp.uint32(1)
    bits = bits.astype(jnp.int32) * mask[:, None, None].astype(jnp.int32)
    counts = bits.sum(axis=0)  # [W, 32]
    return counts.reshape(-1)


def exact_and_reduce(packed: jax.Array, mask: jax.Array) -> jax.Array:
    """AND over all valid k-mers: uint32[K, W], bool[K] -> uint32[W]."""
    ones = jnp.uint32(0xFFFFFFFF)
    masked = jnp.where(mask[:, None], packed, ones)
    return jax.lax.reduce(
        masked, ones, jax.lax.bitwise_and, dimensions=(0,)
    )


def query_counts_jnp(
    matrix: jax.Array, row_idx: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Full single-query step: -> (counts int32[N_padded], exact uint32[W]).

    One fused jit region: gather + AND over h + (count, exact-AND).
    """
    packed = and_rows_jnp(matrix, row_idx)
    return counts_from_packed(packed, mask), exact_and_reduce(packed, mask)


def batched_counts_jnp(matrix, row_idx, mask):
    """Batched hit counts: row_idx int32[B, K, h], mask bool[B, K]
    -> counts int32[B, W*32]."""
    b, k, h = row_idx.shape
    packed = and_rows_jnp(matrix, row_idx.reshape(b * k, h)).reshape(b, k, -1)
    bits = (packed[..., None] >> _bit_shifts()) & jnp.uint32(1)
    bits = bits.astype(jnp.int32) * mask[:, :, None, None].astype(jnp.int32)
    return bits.sum(axis=1).reshape(b, -1)


TILE_ROWS = 32


def blocked_presence(
    tiles: jax.Array, tile_idx: jax.Array, slot_mask: jax.Array
) -> jax.Array:
    """Blocked-layout lookup: one tile fetch per k-mer, no row gather.

    ``tiles`` uint32[T, TILE_ROWS*W]; ``tile_idx`` int32[K] (which tile
    holds each k-mer's h rows); ``slot_mask`` uint32[K] (bit s set if
    tile row s is one of the k-mer's hash rows) -> presence uint32[K, W].

    The per-kmer AND over its h tile rows is computed WITHOUT selecting
    them: every non-selected row is replaced by the AND identity
    (all-ones) and the whole 32-row tile is AND-reduced.  That turns a
    second (issue-rate-bound) gather into pure fused VPU work.
    """
    k = tile_idx.shape[0]
    w = tiles.shape[1] // TILE_ROWS
    g = jnp.take(tiles, tile_idx, axis=0).reshape(k, TILE_ROWS, w)
    r = jax.lax.broadcasted_iota(jnp.uint32, (1, TILE_ROWS, 1), 1)
    sel = ((slot_mask[:, None, None] >> r) & jnp.uint32(1)).astype(bool)
    masked = jnp.where(sel, g, jnp.uint32(0xFFFFFFFF))
    return jax.lax.reduce(
        masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (1,)
    )


def blocked_counts(tiles, tile_idx, slot_mask, mask):
    """Batched blocked-layout hit counts.

    tile_idx int32[B, K], slot_mask uint32[B, K], mask bool[B, K]
    -> counts int32[B, W*32].
    """
    b, k = tile_idx.shape
    packed = blocked_presence(
        tiles, tile_idx.reshape(-1), slot_mask.reshape(-1)
    ).reshape(b, k, -1)
    bits = (packed[..., None] >> _bit_shifts()) & jnp.uint32(1)
    bits = bits.astype(jnp.int32) * mask[:, :, None, None].astype(jnp.int32)
    return bits.sum(axis=1).reshape(b, -1)


def make_full_query_step(m: int, h: int):
    """ONE-program serving step: raw ASCII k-mers in, hit counts out.

    step(words, kmers, mask) with words uint32[m, W], kmers
    uint8[B, K, klen], mask bool[B, K] -> counts int32[B, W*32].

    Everything runs on device — canonicalization, murmur3 hashing, row
    gather, AND over h, masked unpack-sum — so the host's only job is
    padding the query batch (SURVEY §5.8's small-dispatch design).
    Classic layout.
    """
    from bigsi_tpu.ops.hash_jax import canonicalize_jax, row_indices_jax

    @jax.jit
    def step(words, kmers, mask):
        b, k, klen = kmers.shape
        canon = canonicalize_jax(kmers.reshape(b * k, klen))
        idx = row_indices_jax(canon, h, m).reshape(b, k, h)
        return batched_counts_jnp(words, idx, mask)

    return step


def best_query_step(m: int, b: int, k: int, h: int):
    """Currently-best jitted batched step for the bench/serving loop.

    step(words, idx, mask, salt) -> (counts, salt'): the salt chains
    steps into a dependency sequence (benchmarking) and perturbs the
    row indices so identical dispatches can't be coalesced.
    """

    @jax.jit
    def step(words, idx, mask, salt):
        idx = (idx + salt) % m
        counts = batched_counts_jnp(words, idx, mask)
        return counts, (counts[0, 0] & jnp.int32(7))

    return step
