"""End-to-end build/search parity.

Mirrors the reference integration suite
(``bigsi/tests/graph/test_end_to_end.py``) with the same tiny
parameters (k=3, m=1000, h=3) — including the inexact-search and merge
cases the reference skips due to cross-config state leakage (our
in-memory store has no such leakage).
"""

import json

import numpy as np
import pytest

from bigsi_tpu import BIGSI
from bigsi_tpu.kmers import seq_to_kmers
from bigsi_tpu.storage import get_storage


def config(name="t1"):
    return {
        "storage-engine": "memory",
        "storage-config": {"filename": name},
        "k": 3,
        "m": 1000,
        "h": 3,
    }


@pytest.fixture(autouse=True)
def clean():
    for n in ("t1", "t2", "t3"):
        get_storage(config(n)).delete_all()
    yield


def to01(arr):
    return "".join("1" if x else "0" for x in arr)


def test_create():
    cfg = config()
    bloomfilters = [BIGSI.bloom(cfg, ["ATC", "ATA"])]
    samples = ["1"]
    bigsi = BIGSI.build(cfg, bloomfilters, samples)
    assert bigsi.kmer_size == 3
    assert bigsi.bloomfilter_size == 1000
    assert bigsi.num_hashes == 3
    assert bigsi.num_samples == 1
    assert to01(bigsi.lookup("ATC")["ATC"]) == "1"
    assert bigsi.colour_to_sample(0) == "1"
    assert bigsi.sample_to_colour("1") == 0
    bigsi.delete()


def test_insert():
    cfg = config()
    bigsi = BIGSI.build(cfg, [BIGSI.bloom(cfg, ["ATC", "ATA"])], ["1"])
    bloomfilter_2 = BIGSI.bloom(cfg, ["ATC", "ATT"])
    bigsi.insert(bloomfilter_2, "2")
    assert bigsi.num_samples == 2
    lookup = bigsi.lookup(["ATC", "ATA", "ATT"])
    assert to01(lookup["ATC"]) == "11"
    assert to01(lookup["ATA"]) == "10"
    assert to01(lookup["ATT"]) == "01"
    assert bigsi.colour_to_sample(0) == "1"
    assert bigsi.sample_to_colour("1") == 0
    assert bigsi.colour_to_sample(1) == "2"
    assert bigsi.sample_to_colour("2") == 1
    # reopening via config sees the inserted column
    bigsi2 = BIGSI(cfg)
    assert to01(bigsi2.lookup("ATT")["ATT"]) == "01"
    bigsi.delete()


def test_unique_sample_names():
    cfg = config()
    bloom = BIGSI.bloom(cfg, ["ATC", "ATA"])
    bigsi = BIGSI.build(cfg, [bloom], ["1"])
    with pytest.raises(ValueError):
        bigsi.insert(bloom, "1")
    assert bigsi.num_samples == 1
    lookup = bigsi.lookup(["ATC", "ATA", "ATT"])
    assert to01(lookup["ATC"]) == "1"
    assert to01(lookup["ATA"]) == "1"
    assert to01(lookup["ATT"]) == "0"
    bigsi.delete()


def test_exact_search():
    cfg = config()
    kmers_1 = seq_to_kmers("ATACACAAT", cfg["k"])
    kmers_2 = seq_to_kmers("ACAGAGAAC", cfg["k"])
    bloom1 = BIGSI.bloom(cfg, kmers_1)
    bloom2 = BIGSI.bloom(cfg, kmers_2)
    bigsi = BIGSI.build(cfg, [bloom1, bloom2], ["a", "b"])
    assert bigsi.search("ATACACAAT")[0] == {
        "percent_kmers_found": 100,
        "num_kmers": 6,
        "num_kmers_found": 6,
        "sample_name": "a",
    }
    assert bigsi.search("ACAGAGAAC")[0] == {
        "percent_kmers_found": 100,
        "num_kmers": 6,
        "num_kmers_found": 6,
        "sample_name": "b",
    }
    assert bigsi.search("ACAGTTAAC") == []
    bigsi.delete()


def test_inexact_search():
    cfg = config()
    kmers_1 = seq_to_kmers("ATACACAAT", cfg["k"])
    kmers_2 = seq_to_kmers("ATACACAAC", cfg["k"])
    bloom1 = BIGSI.bloom(cfg, kmers_1)
    bloom2 = BIGSI.bloom(cfg, kmers_2)
    with pytest.raises(BaseException):
        BIGSI(cfg)
    bigsi = BIGSI.build(cfg, [bloom1, bloom2], ["a", "b"])
    assert bigsi.search("ACAGTTAAC", 0.5) == []
    assert to01(bigsi.lookup("AAT")["AAT"]) == "10"
    results = bigsi.search("ATACACAAT", 0.5)
    assert results[0] == {
        "percent_kmers_found": 100.0,
        "num_kmers": 6,
        "num_kmers_found": 6,
        "sample_name": "a",
    }
    assert (
        json.dumps(results[0])
        == '{"percent_kmers_found": 100.0, "num_kmers": 6, "num_kmers_found": 6, "sample_name": "a"}'
    )
    assert results[1] == {
        "percent_kmers_found": 83.33,
        "num_kmers": 6,
        "num_kmers_found": 5,
        "sample_name": "b",
    }
    bigsi.delete()


def test_merge():
    cfg1, cfg2, cfgc = config("t1"), config("t2"), config("t3")
    kmers_1 = seq_to_kmers("ATACACAAT", cfg1["k"])
    kmers_2 = seq_to_kmers("ATACACAAC", cfg1["k"])
    bloom1 = BIGSI.bloom(cfg1, kmers_1)
    bloom2 = BIGSI.bloom(cfg1, kmers_2)

    bigsi1 = BIGSI.build(cfg1, [bloom1], ["a"])
    bigsi2 = BIGSI.build(cfg2, [bloom2], ["b"])
    bigsic = BIGSI.build(cfgc, [bloom1, bloom2], ["a", "b"])

    bigsi1.merge(bigsi2)
    assert bigsi1.search("ATACACAAT", 0.5) == bigsic.search("ATACACAAT", 0.5)
    assert bigsi1.num_samples == 2
    for b in (bigsi1, bigsi2, bigsic):
        b.delete()


def test_delete_sample_filtered_from_results():
    cfg = config()
    kmers_1 = list(seq_to_kmers("ATACACAAT", cfg["k"]))
    bloom1 = BIGSI.bloom(cfg, kmers_1)
    bigsi = BIGSI.build(cfg, [bloom1, bloom1], ["a", "b"])
    assert {r["sample_name"] for r in bigsi.search("ATACACAAT")} == {"a", "b"}
    bigsi.delete_sample("a")
    assert bigsi.num_samples == 2  # counter not decremented
    assert {r["sample_name"] for r in bigsi.search("ATACACAAT")} == {"b"}
    assert bigsi.sample_to_colour("a") is None
    bigsi.delete()


def test_search_with_score():
    cfg = config()
    seq = "ATACACAATACGT"
    bloom1 = BIGSI.bloom(cfg, seq_to_kmers(seq, cfg["k"]))
    bigsi = BIGSI.build(cfg, [bloom1], ["a"])
    res = bigsi.search(seq, threshold=0.5, score=True)
    assert res[0]["sample_name"] == "a"
    assert res[0]["kmer-presence"] == "1" * (len(seq) - cfg["k"] + 1)
    for key in ("score", "pident", "evalue", "pvalue", "nident", "length"):
        assert key in res[0]
    bigsi.delete()


def test_metadata_merge_duplicate_suffix():
    cfg1, cfg2 = config("t1"), config("t2")
    bloom1 = BIGSI.bloom(cfg1, ["ATC"])
    bigsi1 = BIGSI.build(cfg1, [bloom1], ["a"])
    bigsi2 = BIGSI.build(cfg2, [bloom1], ["a"])
    bigsi1.merge(bigsi2)
    assert bigsi1.colour_to_sample(1) == "a_duplicate_in_merge"
    bigsi1.delete()
    bigsi2.delete()


def test_metadata_survives_reopen_with_deletions(tmp_path):
    """The array-backed SampleMetadata persists through the manifest KV:
    reopening from disk must restore colour order, the D3L3T3D
    sentinel, and the reserved (deleted) names -- re-adding a deleted
    name still raises (reference semantics, bigsi/graph/metadata.py)."""
    import pytest

    from bigsi_tpu.graph import BIGSI
    from bigsi_tpu.kmers import seq_to_kmers

    config = {
        "k": 31,
        "m": 20000,
        "h": 3,
        "storage-engine": "bigsi-tpu",
        "storage-config": {"filename": str(tmp_path / "idx")},
    }
    seqs = ["".join("ACGT"[(i * 7 + j) % 4] for j in range(60)) + "A" * 31
            for i in range(3)]
    blooms = [BIGSI.bloom(config, seq_to_kmers(s, 31)) for s in seqs]
    idx = BIGSI.build(config, blooms, ["s0", "s1", "s2"])
    idx.delete_sample("s1")
    idx.storage.close()

    reopened = BIGSI(config)
    assert reopened.sample_names() == ["s0", "D3L3T3D", "s2"]
    assert reopened.sample_to_colour("s1") is None
    assert reopened.sample_to_colour("s2") == 2
    assert reopened.colour_to_sample(0) == "s0"
    with pytest.raises(ValueError):
        reopened.add_sample("s1")  # deleted names stay reserved
    with pytest.raises(ValueError):
        reopened.add_sample("s0")
