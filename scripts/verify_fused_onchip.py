#!/usr/bin/env python
"""On-chip bit-exactness check of the fused Pallas kernel vs a numpy oracle.

Builds a small random tile matrix, random (tile, smask) streams with
minimizer-style runs, and asserts counts + exact words match the direct
numpy computation of: per k-mer, AND the selected rows of its tile.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.pallas_lookup import (
    SUBLANES, LANES, W, TILE_ROWS, query_counts_exact,
)


def fat_from_tiles(tiles: np.ndarray) -> np.ndarray:
    """tiles uint32[T, 32, 32] -> fat uint32[T*8, 128] per kernel layout:
    lane l of sublane j holds tile row 4j + l//32, word l % 32."""
    T = tiles.shape[0]
    fat = np.zeros((T, SUBLANES, LANES), dtype=np.uint32)
    for j in range(SUBLANES):
        for l in range(LANES):
            fat[:, j, l] = tiles[:, 4 * j + l // 32, l % 32]
    return fat.reshape(T * SUBLANES, LANES)


def oracle(tiles, tile_idx, smask):
    b, k = tile_idx.shape
    n = W * 32
    counts = np.zeros((b, n), dtype=np.int64)
    exact = np.full((b, W), 0xFFFFFFFF, dtype=np.uint32)
    for i in range(b):
        for j in range(k):
            sm = int(smask[i, j])
            if sm == 0:
                continue
            t = tiles[tile_idx[i, j]]
            red = np.full(W, 0xFFFFFFFF, dtype=np.uint32)
            for r in range(TILE_ROWS):
                if (sm >> r) & 1:
                    red &= t[r]
            exact[i] &= red
            bits = (
                (red[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
            ).reshape(-1)
            counts[i] += bits
    return counts, exact


def main():
    rng = np.random.default_rng(7)
    T, B, K, RUN = 512, 8, 256, 6
    # sparse-ish tiles so ANDs have survivors sometimes
    tiles = (
        rng.integers(0, 2 ** 32, size=(T, TILE_ROWS, W), dtype=np.uint64)
        & rng.integers(0, 2 ** 32, size=(T, TILE_ROWS, W), dtype=np.uint64)
    ).astype(np.uint32) | 0x1  # keep sample 0 always present
    nt = (B * K + RUN - 1) // RUN
    runs = rng.integers(0, T, size=nt).astype(np.int32)
    tile_idx = np.repeat(runs, RUN)[: B * K].reshape(B, K)
    smask = rng.integers(1, 2 ** 32, size=(B, K), dtype=np.uint64).astype(np.uint32)
    smask |= 0x7  # a few low rows always selected
    smask[:, -3:] = 0  # trailing pads
    smask[2, :] = 0  # an all-pad query row

    fat = jnp.asarray(fat_from_tiles(tiles))
    counts, exact = query_counts_exact(fat, tile_idx, smask)
    ec, ee = oracle(tiles, tile_idx, smask)
    assert np.array_equal(counts, ec), (
        "counts mismatch: %d cells" % int((counts != ec).sum())
    )
    assert np.array_equal(exact, ee), "exact mismatch"
    print("device:", jax.devices()[0])
    print("fused kernel BIT-EXACT on", jax.devices()[0].platform,
          "B=%d K=%d T=%d" % (B, K, T))


if __name__ == "__main__":
    main()
