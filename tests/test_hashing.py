"""Hash parity anchors.

Golden values from the reference suite
(``bigsi/tests/bloom/test_create_bloomfilter.py:5-8``): these pin our
from-scratch MurmurHash3_x86_32 to mmh3's signed-int32 + Python
floor-mod semantics.
"""

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from bigsi_tpu.hashing import generate_hashes, hash_kmer_matrix, murmur3_32
from bigsi_tpu.hashing.murmur3 import murmur3_32_batch


def test_generate_hashes_golden():
    assert generate_hashes("ATT", 3, 25) == {2, 15, 17}
    assert generate_hashes("ATT", 1, 25) == {15}
    assert generate_hashes("ATT", 2, 50) == {15, 27}


def test_batch_matches_scalar_kmers():
    kmers = ["ATT", "ATC", "GGG", "TTT", "ACG"]
    mat = np.stack([np.frombuffer(k.encode(), dtype=np.uint8) for k in kmers])
    out = murmur3_32_batch(mat, np.arange(5, dtype=np.uint32))
    for i, k in enumerate(kmers):
        for s in range(5):
            assert out[i, s] == murmur3_32(k.encode(), s)


@given(
    st.lists(st.text(alphabet="ACGT", min_size=31, max_size=31), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=10, max_value=10 ** 7),
)
def test_batch_mod_matches_scalar(kmers, h, m):
    mat = np.stack([np.frombuffer(k.encode(), dtype=np.uint8) for k in kmers])
    idx = hash_kmer_matrix(mat, h, m)
    for i, k in enumerate(kmers):
        expect = [murmur3_32(k.encode(), s) % m for s in range(h)]
        assert idx[i].tolist() == expect


def test_various_lengths_match_scalar():
    # Tail handling: lengths 1..16 cover all nblocks/ntail combinations.
    for L in range(1, 17):
        s = ("ACGTACGTACGTACGT"[:L]).encode()
        mat = np.frombuffer(s, dtype=np.uint8)[None, :]
        out = murmur3_32_batch(mat, np.array([0, 1, 99], dtype=np.uint32))
        for j, seed in enumerate([0, 1, 99]):
            assert out[0, j] == murmur3_32(s, seed)


def test_murmur3_jax_matches_numpy_and_goldens():
    import jax.numpy as jnp
    import numpy as np

    from bigsi_tpu.hashing.murmur3 import murmur3_32_batch
    from bigsi_tpu.ops.hash_jax import murmur3_32_jax, row_indices_jax

    # golden: generate_hashes("ATT", 3, 25) == {2, 15, 17}
    att = np.frombuffer(b"ATT", dtype=np.uint8)[None, :]
    rows = np.asarray(row_indices_jax(jnp.asarray(att), 3, 25))
    assert set(rows[0].tolist()) == {2, 15, 17}

    rng = np.random.default_rng(0)
    for k in (3, 4, 7, 8, 31, 32):
        mats = rng.integers(65, 85, size=(16, k), dtype=np.uint8)
        seeds = np.arange(5, dtype=np.uint32)
        want = murmur3_32_batch(mats, seeds)
        got = np.asarray(murmur3_32_jax(jnp.asarray(mats), jnp.asarray(seeds)))
        assert np.array_equal(got, want), k


def test_row_indices_jax_matches_host():
    import jax.numpy as jnp
    import numpy as np

    from bigsi_tpu.hashing.murmur3 import hash_kmer_matrix
    from bigsi_tpu.ops.hash_jax import row_indices_jax

    rng = np.random.default_rng(1)
    mats = rng.integers(65, 85, size=(64, 31), dtype=np.uint8)
    want = hash_kmer_matrix(mats, 3, 25_000_000)
    got = np.asarray(row_indices_jax(jnp.asarray(mats), 3, 25_000_000))
    assert np.array_equal(got.astype(np.int64), want)


def test_canonicalize_jax_matches_host_oracle():
    """Device canonicalization (gather-free select-chain form) must be
    byte-identical with the host oracle for random k-mers, reverse-
    complement palindromes, and rows containing non-ACGT bytes."""
    import jax.numpy as jnp
    import numpy as np

    from bigsi_tpu.kmers import canonicalize_kmer_matrix
    from bigsi_tpu.ops.hash_jax import canonicalize_jax

    rng = np.random.default_rng(21)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for k in (5, 31):
        kmers = bases[rng.integers(0, 4, size=(257, k))]
        kmers[7, 0] = ord("N")  # non-ACGT maps to itself
        if k == 5:
            kmers[3] = np.frombuffer(b"ACGTN", dtype=np.uint8)
        want = canonicalize_kmer_matrix(kmers)
        got = np.asarray(canonicalize_jax(jnp.asarray(kmers)))
        assert np.array_equal(got, want), k


def test_native_minimizer_tiles_parity_and_invariance():
    """Native minimizer (rolling-window C path) vs the numpy oracle, and
    strand invariance: tiles of canon(x) == tiles of x (what lets the
    search path compute tiles from PRE-canonical query k-mers)."""
    import os

    import numpy as np

    from bigsi_tpu.hashing.scheme import minimizer_tiles
    from bigsi_tpu.kmers import canonicalize_kmer_matrix

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    num_tiles = 12345

    # flat (non-overlapping) k-mers
    flat = bases[rng.integers(0, 4, size=(500, 31))]
    # sliding-window (overlapping) k-mers — exercises the rolling path
    seq = bases[rng.integers(0, 4, size=3000)]
    win = np.lib.stride_tricks.sliding_window_view(seq, 31).copy()

    for km in (flat, win):
        os.environ["BIGSI_TPU_NO_NATIVE"] = "1"
        try:
            ref = minimizer_tiles(km, num_tiles)
        finally:
            del os.environ["BIGSI_TPU_NO_NATIVE"]
        got = minimizer_tiles(km, num_tiles)
        assert (ref == got).all()
        canon = canonicalize_kmer_matrix(km)
        assert (minimizer_tiles(canon, num_tiles) == got).all()
