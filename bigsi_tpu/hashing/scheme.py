"""Hash schemes: where a k-mer's h Bloom rows live.

* ``classic`` — reference parity (``bigsi/bloom/bloomfilter.py:5-13``):
  h independent murmur3 hashes mod m.  Rows land anywhere in [0, m), so
  a query k-mer costs h random row fetches.

* ``blocked`` — TPU-native blocked-Bloom layout: the first hash picks a
  *tile* of ``TILE_ROWS`` consecutive rows; the h row hashes land
  inside that tile.  A query k-mer then costs ONE tile fetch (the tile
  maps to whole 128-lane fat rows in HBM), cutting random-access issue
  count by h and making every fetch lane-aligned.  The standard
  blocked-Bloom trade-off applies: slightly higher false-positive rate
  at equal m/h (same order; see Putze, Sanders & Singler 2009).

The scheme is an index-wide property chosen at build time
(``config["layout"]``, default classic), persisted in the manifest;
``.bloom`` files built with different layouts are not interchangeable.
"""

from __future__ import annotations

import numpy as np

from bigsi_tpu.hashing.murmur3 import murmur3_32_batch

CLASSIC = "classic"
BLOCKED = "blocked"
LAYOUTS = (CLASSIC, BLOCKED)

# Tile height in bitslice rows.  32 rows x 32-bit words means a tile is
# a whole number of (8, 128) uint32 device tiles for any fat-packing
# factor G in {1, 2, 4, ..., 128//8}.
TILE_ROWS = 32


def _hashes(kmers: np.ndarray, seeds) -> np.ndarray:
    return murmur3_32_batch(kmers, np.asarray(seeds, dtype=np.uint32)).astype(np.int64)


def row_indices(
    kmers: np.ndarray, h: int, m: int, layout: str = CLASSIC
) -> np.ndarray:
    """Canonical ASCII k-mer matrix [K, k] -> bloom row indices int64 [K, h]."""
    if layout == CLASSIC:
        # native fast path handles classic (bit-identical); see murmur3.py
        from bigsi_tpu.hashing.murmur3 import hash_kmer_matrix

        return hash_kmer_matrix(kmers, h, m)
    if layout != BLOCKED:
        raise ValueError("unknown layout %r" % layout)
    num_tiles = max(1, m // TILE_ROWS)
    hs = _hashes(kmers, range(h + 1))  # [K, h+1]
    tile = np.mod(hs[:, :1], num_tiles)  # [K, 1]
    slots = np.mod(hs[:, 1:], TILE_ROWS)  # [K, h]
    return tile * TILE_ROWS + slots


def tile_and_slots(kmers: np.ndarray, h: int, m: int):
    """Blocked layout: -> (tile int64 [K], slots int64 [K, h])."""
    num_tiles = max(1, m // TILE_ROWS)
    hs = _hashes(kmers, range(h + 1))
    return np.mod(hs[:, 0], num_tiles), np.mod(hs[:, 1:], TILE_ROWS)
