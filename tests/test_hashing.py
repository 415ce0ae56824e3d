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
