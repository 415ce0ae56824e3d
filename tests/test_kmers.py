import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from bigsi_tpu.kmers import (
    ascii_to_strings,
    canonical,
    canonicalize_kmer_matrix,
    decode_kmers_2bit,
    encode_kmers_2bit,
    reverse_comp,
    seq_to_kmer_matrix,
    seq_to_kmers,
    unique_rows_with_inverse,
)


def test_reverse_comp():
    assert reverse_comp("ACGT") == "ACGT"
    assert reverse_comp("AAA") == "TTT"
    assert reverse_comp("ATC") == "GAT"


def test_canonical():
    assert canonical("ATT") == "AAT"
    assert canonical("AAT") == "AAT"


@given(st.text(alphabet="ACGT", min_size=3, max_size=64))
def test_kmer_matrix_matches_generator(seq):
    k = 3
    mat = seq_to_kmer_matrix(seq, k)
    assert ascii_to_strings(mat) == list(seq_to_kmers(seq, k))


@given(st.lists(st.text(alphabet="ACGT", min_size=7, max_size=7), min_size=1, max_size=30))
def test_canonicalize_matrix_matches_scalar(kmers):
    mat = np.stack([np.frombuffer(x.encode(), dtype=np.uint8) for x in kmers])
    out = ascii_to_strings(canonicalize_kmer_matrix(mat))
    assert out == [canonical(x) for x in kmers]


@given(st.text(alphabet="ACGT", min_size=5, max_size=80))
def test_unique_rows_with_inverse(seq):
    k = 5
    mat = seq_to_kmer_matrix(seq, k)
    uniq, inv = unique_rows_with_inverse(mat)
    strs = ascii_to_strings(mat)
    expect_uniq = list(dict.fromkeys(strs))
    assert ascii_to_strings(uniq) == expect_uniq
    assert np.array_equal(uniq[inv], mat)


@given(st.lists(st.text(alphabet="ACGT", min_size=31, max_size=31), min_size=1, max_size=10))
def test_2bit_roundtrip(kmers):
    mat = np.stack([np.frombuffer(x.encode(), dtype=np.uint8) for x in kmers])
    packed = encode_kmers_2bit(mat)
    back = decode_kmers_2bit(packed, 31)
    assert np.array_equal(back, mat)
    # integer order == lexicographic order
    order_int = np.argsort(packed, kind="stable").tolist()
    order_lex = sorted(range(len(kmers)), key=lambda i: kmers[i])
    assert [kmers[i] for i in order_int] == [kmers[i] for i in order_lex]
