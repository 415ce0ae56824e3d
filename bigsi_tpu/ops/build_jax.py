"""On-device index construction: Bloom scatter + bit transpose.

SURVEY §7.3(c): the build path's two hot ops as device programs —

* :func:`device_bloom` — one sample's Bloom filter from its ASCII
  k-mer matrix: canonicalize + murmur3 (ops/hash_jax.py) + bit scatter,
  all on device.  The scatter uses ``.at[].add`` on a byte-per-bit
  vector (scatter-OR is not a native XLA combiner) and repacks with a
  32-bit weighted reduction.
* :func:`device_transpose` — N packed Bloom columns -> the packed
  bitslice matrix, as chunked unpack/transpose/repack device programs
  (the host oracle is ``matrix.bitmatrix.transpose_blooms``).

Both produce bit-identical results to the host build pipeline (tested
against it), so hosts can freely mix: e.g. build shards on device while
streaming blooms from disk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bigsi_tpu.ops.hash_jax import canonicalize_jax, murmur3_32_jax, row_indices_jax

TILE_ROWS = 32


def _pack_bits(bits: jax.Array) -> jax.Array:
    """uint8/bool bits [..., 32*W] (LSB-first) -> uint32 [..., W]."""
    *lead, n = bits.shape
    w = n // 32
    b = bits.reshape(*lead, w, 32).astype(jnp.uint32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    return (b * weights).sum(axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("m", "h", "layout", "tile_rows"))
def device_bloom(
    kmers: jax.Array, *, m: int, h: int, layout: str = "classic",
    tile_rows: int = TILE_ROWS,
):
    """ASCII k-mer matrix uint8[K, klen] -> packed bloom uint32[ceil(m/32)].

    Matches ``BIGSI.bloom`` (canonicalize, hash with seeds 0..h-1,
    floor-mod m) for the classic and blocked layouts; minimizer tiles
    need host s-mer windows and stay host-side.
    """
    canon = canonicalize_jax(kmers)
    if layout == "classic":
        rows = row_indices_jax(canon, h, m)  # [K, h]
    elif layout == "blocked":
        num_tiles = max(1, m // tile_rows)
        seeds = jnp.arange(h + 1, dtype=jnp.uint32)
        hs = murmur3_32_jax(canon, seeds)  # int32 [K, h+1]
        tile = _floor_mod(hs[:, :1], num_tiles)
        slots = _floor_mod(hs[:, 1:], tile_rows)
        rows = tile * tile_rows + slots
    else:
        raise ValueError("device_bloom supports classic/blocked, not %r" % layout)
    mw = (m + 31) // 32
    # scatter-max (not add): duplicate k-mers are common in real
    # sequence and an additive uint8 accumulator would wrap at 256
    # hits, silently CLEARING the bit
    hits = jnp.zeros((mw * 32,), jnp.uint8).at[rows.reshape(-1)].max(
        jnp.uint8(1), mode="drop"
    )
    return _pack_bits(hits > 0)


def _floor_mod(x: jax.Array, m: int) -> jax.Array:
    r = x % jnp.int32(m)
    return jnp.where(r < 0, r + jnp.int32(m), r)


def device_transpose(blooms: jax.Array, m: int, rows_chunk: int = 4096):
    """Packed blooms uint32[N, MW] -> packed bitslice matrix uint32[m, W].

    W = ceil(N/32) padded to 4-word lanes like the host path
    (``transpose_blooms`` pads to LANE multiples via _padded_words; this
    returns exact ceil(N/32) words — callers pad for device layouts).
    Processes ``rows_chunk`` bitslice rows (bloom bit positions) per
    compiled step to bound memory at N x rows_chunk bytes.
    """
    n, mw = blooms.shape
    w = (n + 31) // 32
    wc = max(1, rows_chunk // 32)

    @jax.jit
    def step(bl_words):
        # bl_words uint32[N, wc] -> bitslice rows uint32[wc*32, W]
        bits = (bl_words[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
        bits = bits.reshape(n, wc * 32).astype(jnp.uint8)  # [N, rows]
        bt = bits.T  # [rows, N]
        pad = w * 32 - n
        if pad:
            bt = jnp.pad(bt, ((0, 0), (0, pad)))
        return _pack_bits(bt)

    chunks = []
    for c0 in range(0, mw, wc):
        c1 = min(c0 + wc, mw)
        sl = blooms[:, c0:c1]
        if c1 - c0 < wc:
            sl = jnp.pad(sl, ((0, 0), (0, wc - (c1 - c0))))
        chunks.append(step(sl))
    full = jnp.concatenate(chunks, axis=0)
    return full[:m]
