"""Fused Pallas query kernel vs the host oracle.

Runs in Pallas interpret mode on the CPU backend (tests/conftest.py);
the identical kernel compiles for TPU (see scripts/microbench4.py and
bench.py for on-chip validation/timing).
"""

import numpy as np
import pytest

from bigsi_tpu.index.host_engine import HostEngine
from bigsi_tpu.matrix.bitmatrix import BitSliceMatrix
from bigsi_tpu.ops.pallas_lookup import (
    CHUNK,
    TILE_ROWS,
    build_chunk_streams,
    query_counts_exact,
    untwist_permutation,
)

N = 1024  # the fused kernel handles exactly W=32 words


def make_matrix(rng, T):
    m = T * TILE_ROWS
    words = rng.integers(0, 2 ** 32, size=(m, N // 32), dtype=np.uint32)
    return BitSliceMatrix(words, num_cols=N), words


def oracle_counts_exact(words, tile, slots, smask):
    """Reference: per-kmer AND of selected tile rows; counts + exact."""
    b, k = tile.shape
    m = words.shape[0]
    mat = BitSliceMatrix(words, num_cols=N)
    eng = HostEngine(mat)
    counts = np.zeros((b, N), dtype=np.int64)
    exact = np.full((b, N // 32), 0xFFFFFFFF, dtype=np.uint32)
    for i in range(b):
        valid = smask[i] != 0
        if valid.sum() == 0:
            continue
        row_idx = tile[i][valid][:, None] * TILE_ROWS + slots[i][valid]
        packed = eng.and_rows(row_idx)
        counts[i] = eng.counts(packed, N)
        exact[i] = np.bitwise_and.reduce(packed, axis=0)
    return counts, exact


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("b,k,h", [(2, CHUNK, 3), (1, 2 * CHUNK, 1), (3, CHUNK, 3)])
def test_fused_query_matches_oracle(seed, b, k, h):
    rng = np.random.default_rng(seed)
    T = 37
    mat, words = make_matrix(rng, T)
    tile = rng.integers(0, T, size=(b, k)).astype(np.int32)
    # runs of duplicate tiles (minimizer-style) for some kmers
    tile[:, 1::3] = tile[:, 0::3][:, : tile[:, 1::3].shape[1]]
    slots = rng.integers(0, TILE_ROWS, size=(b, k, h))
    smask = np.bitwise_or.reduce(
        np.uint32(1) << slots.astype(np.uint32), axis=2
    )
    # sprinkle padding kmers
    padmask = rng.random((b, k)) < 0.15
    smask[padmask] = 0

    tiles_fat = np.ascontiguousarray(words.reshape(T * 8, 128))
    counts, exact_words = query_counts_exact(tiles_fat, tile, smask)
    want_counts, want_exact = oracle_counts_exact(words, tile, slots, smask)

    np.testing.assert_array_equal(counts, want_counts)
    # queries with zero valid kmers keep the all-ones identity; oracle
    # skips them too
    np.testing.assert_array_equal(exact_words, want_exact)


def test_untwist_permutation_is_permutation():
    perm = untwist_permutation()
    assert sorted(perm.tolist()) == list(range(1024))


def test_build_chunk_streams_dedup():
    tile = np.array([[5, 5, 5, 2, 2, 9] + [0] * (CHUNK - 6)], dtype=np.int32)
    smask = np.ones((1, CHUNK), dtype=np.uint32)
    smask[0, 6:] = 0  # padding
    n_unique, utile, uslot, slotidx = build_chunk_streams(tile, smask)
    assert n_unique.tolist() == [3]
    assert utile[:3].tolist() == [5, 2, 9]
    assert slotidx[:6].tolist() == [0, 0, 0, 1, 1, 2]


def test_pad_after_run_not_merged():
    # real kmer with tile 0 right after padding must get its own fetch
    tile = np.zeros((1, CHUNK), dtype=np.int32)
    smask = np.zeros((1, CHUNK), dtype=np.uint32)
    smask[0, 3] = 7  # only kmer 3 is real, tile 0
    n_unique, utile, uslot, slotidx = build_chunk_streams(tile, smask)
    assert n_unique.tolist() == [1]
    assert utile[0] == 0
    assert slotidx[0, 3] if slotidx.ndim > 1 else slotidx[3] == 0
