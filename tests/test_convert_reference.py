"""Conversion proof against the reference's PERSISTED index.

``/root/reference/example-data/test-bigsi/{graph,metadata}`` is a
prebuilt BerkeleyDB index committed by the reference authors (v0.1
layout: m=1000, h=1, k=31, samples s1/s2).  These tests read it with
the in-repo pure-Python DB_HASH reader, convert it to a bigsi-tpu
index, and assert search parity against ground truth computed directly
from the reference's stored row bytes — goldens the repo did NOT write
(SURVEY §7 "bit-identical matrices" hard part).
"""

import os

import numpy as np
import pytest

REF_INDEX = "/root/reference/example-data/test-bigsi"
REF_DATA = "/root/reference/example-data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_INDEX), reason="reference fixtures not mounted"
)


@pytest.fixture(scope="module")
def raw_reference():
    """(params, samples, row_bits) straight from the BerkeleyDB files."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.convert_reference_index import read_v01

    params, samples, cols = read_v01(REF_INDEX)
    return params, samples, cols


def test_reader_finds_reference_parameters(raw_reference):
    params, samples, cols = raw_reference
    assert params == {"m": 1000, "h": 1, "k": 31}
    assert samples == ["s1", "s2"]
    assert cols.shape == (2, 1000)
    assert cols.any(), "stored index has set bits"


def test_reader_rejects_non_bdb_files(tmp_path):
    from bigsi_tpu.storage.berkeleydb_reader import BerkeleyHashReader

    p = tmp_path / "not_a_db"
    p.write_bytes(b"\x00" * 4096)
    with pytest.raises(ValueError, match="magic"):
        BerkeleyHashReader(str(p))


@pytest.fixture(scope="module")
def converted(tmp_path_factory, raw_reference):
    from scripts.convert_reference_index import from_berkeleydb
    from bigsi_tpu.graph import BIGSI

    tmp = tmp_path_factory.mktemp("converted")
    config = {
        "k": 31,
        "m": 1000,
        "h": 1,
        "storage-engine": "bigsi-tpu",
        "storage-config": {"filename": str(tmp / "index")},
    }
    config = from_berkeleydb(config, REF_INDEX)
    return BIGSI(config)


def _expected_hit(cols, params, kmer: str, colour: int) -> bool:
    """Ground truth from the stored rows only: canonical-hash the k-mer
    with the reference's mmh3 semantics and test its h rows."""
    from bigsi_tpu.hashing.murmur3 import generate_hashes
    from bigsi_tpu.kmers import canonical

    rows = generate_hashes(canonical(kmer), params["h"], params["m"])
    return all(cols[colour, r] for r in rows)


def test_search_parity_with_stored_rows(raw_reference, converted):
    """Exact single-kmer searches must equal presence computed from the
    reference's raw row bytes, for real fixture k-mers and randoms."""
    from bigsi_tpu.io.cortex import extract_kmers_from_ctx

    params, samples, cols = raw_reference
    fixture_kmers = list(
        extract_kmers_from_ctx(os.path.join(REF_DATA, "test1.ctx"), 31)
    )[:100]
    rng = np.random.default_rng(11)
    random_kmers = [
        "".join(rng.choice(list("ACGT"), size=31)) for _ in range(100)
    ]
    checked_hits = 0
    for kmer in fixture_kmers + random_kmers:
        got = {r["sample_name"] for r in converted.search(kmer)}
        want = {
            samples[c]
            for c in range(len(samples))
            if _expected_hit(cols, params, kmer, c)
        }
        assert got == want, "mismatch for %s" % kmer
        checked_hits += len(want)
    assert checked_hits > 0, "test had no positive cases"


def test_inexact_search_parity(raw_reference, converted):
    """Threshold search over a long query: per-sample num_kmers_found
    must equal the count derived from the stored rows."""
    from bigsi_tpu.kmers import seq_to_kmers

    params, samples, cols = raw_reference
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGT"), size=100))
    kmers = set(seq_to_kmers(seq, 31))
    want_counts = {
        s: sum(_expected_hit(cols, params, k, c) for k in kmers)
        for c, s in enumerate(samples)
    }
    results = {
        r["sample_name"]: r["num_kmers_found"]
        for r in converted.search(seq, threshold=0.01)
    }
    for s, count in want_counts.items():
        assert results.get(s, 0) == count
