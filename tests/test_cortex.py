"""Cortex .ctx reader tests against the reference's fixture files and an
independent string-based decoder implementing the documented bit layout
(``/root/reference/bigsi/utils/cortex.py:34-50``)."""

import os
import struct

import numpy as np
import pytest

from bigsi_tpu.io.cortex import (
    GraphReader,
    decode_kmers,
    encode_kmer,
    extract_kmer_matrix_from_ctx,
    extract_kmers_from_ctx,
)
from bigsi_tpu.kmers import ascii_to_strings, canonical

REF_DATA = "/root/reference/example-data"
REF_TEST_DATA = "/root/reference/bigsi/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted"
)


def slow_decode(binary_kmer_int: int, kmer_size: int) -> str:
    """Independent oracle: bit-string implementation of the layout."""
    b = "{0:064b}".format(binary_kmer_int)[::-1]
    bases = {"00": "A", "01": "G", "10": "C", "11": "T"}
    out = [bases[b[2 * j : 2 * j + 2]] for j in range(kmer_size)]
    return "".join(out)[::-1]


def test_decode_matches_slow_oracle():
    rng = np.random.default_rng(42)
    for k in (3, 15, 31):
        vals = rng.integers(0, 2 ** (2 * k), size=20, dtype=np.uint64)
        fast = ascii_to_strings(decode_kmers(vals, k))
        slow = [slow_decode(int(v), k) for v in vals]
        assert fast == slow


def test_encode_decode_roundtrip():
    for kmer in ["ACGT", "TTTTT", "GATTACA"]:
        packed = np.frombuffer(encode_kmer(kmer), dtype="<u8")
        assert ascii_to_strings(decode_kmers(packed, len(kmer)))[0] == kmer


def test_reads_reference_fixture_header():
    gr = GraphReader(os.path.join(REF_DATA, "test1.ctx"))
    assert gr.version == 6
    assert gr.kmer_size == 31
    assert gr.num_colours == 1
    assert gr.num_records > 0
    gr.close()


def test_bulk_matches_record_iteration():
    path = os.path.join(REF_DATA, "test1.ctx")
    gr = GraphReader(path)
    kmers, coverages, edges = gr.read_all()
    iter_kmers = [rec.kmer for rec in GraphReader(path)]
    assert ascii_to_strings(kmers) == iter_kmers
    assert coverages.shape == (gr.num_records, 1)
    gr.close()


def test_extract_kmers_canonicalizes():
    path = os.path.join(REF_DATA, "test1.ctx")
    ks = list(extract_kmers_from_ctx(path, 31))
    records = [rec.kmer for rec in GraphReader(path)]
    assert ks == [canonical(r) for r in records]


def test_extract_sub_kmers():
    path = os.path.join(REF_TEST_DATA, "test_kmers.ctx")
    gr = GraphReader(path)
    size = gr.kmer_size
    gr.close()
    k = size - 2
    mat = extract_kmer_matrix_from_ctx(path, k)
    records = [canonical(rec.kmer) for rec in GraphReader(path)]
    expect = []
    for r in records:
        for i in range(size - k + 1):
            expect.append(r[i : i + k])
    assert ascii_to_strings(mat) == expect


def test_kmers_txt_agreement():
    """example-data/kmers.txt holds the canonical k-mers of kmers.ctx."""
    path = os.path.join(REF_DATA, "kmers.ctx")
    with open(os.path.join(REF_DATA, "kmers.txt")) as f:
        expected = {line.strip() for line in f if line.strip()}
    got = set(extract_kmers_from_ctx(path, 31))
    assert got == expected
