"""Variant-search genotyping (reference: ``bigsi/cmds/variant_search.py:60-73``).

The genotype classification (0/0, 0/1, 1/1) is pure logic over exact
probe searches, so it needs no mykrobe: probes are canned FASTA and the
subprocess call is stubbed.
"""

import numpy as np
import pytest

from bigsi_tpu.cmds import BIGSIAminoAcidMutationSearch, BIGSIVariantSearch
from bigsi_tpu.graph import BIGSI
from bigsi_tpu.kmers import seq_to_kmers

K = 31


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT")) for _ in range(n))


@pytest.fixture()
def variant_index(tmp_path):
    """Three samples: ref-only (0/0), both alleles (0/1), alt-only (1/1),
    plus one carrying neither."""
    import random

    rng = random.Random(7)
    left, right = _random_seq(rng, 40), _random_seq(rng, 40)
    ref_probe = left + "A" + right
    alt_probe = left + "C" + right
    other = _random_seq(rng, 100)

    config = {
        "k": K,
        "m": 50000,
        "h": 3,
        "storage-engine": "bigsi-tpu",
        "storage-config": {"filename": str(tmp_path / "index")},
    }
    genomes = {
        "homref": [ref_probe],
        "het": [ref_probe, alt_probe],
        "homalt": [alt_probe],
        "unrelated": [other],
    }
    names = list(genomes)
    blooms = [
        BIGSI.bloom(
            config,
            [k for seq in genomes[n] for k in seq_to_kmers(seq, K)],
        )
        for n in names
    ]
    BIGSI.build(config, blooms, names)
    return BIGSI(config), ref_probe, alt_probe


def test_genotype_alleles_classifies(variant_index):
    bigsi, ref_probe, alt_probe = variant_index
    vs = BIGSIVariantSearch(bigsi, reference="unused.fasta")
    results = vs.genotype_alleles([ref_probe], [alt_probe])
    assert results == [
        {"sample_name": "het", "genotype": "0/1"},
        {"sample_name": "homalt", "genotype": "1/1"},
        {"sample_name": "homref", "genotype": "0/0"},
    ]


def test_genotype_alleles_multiple_probes(variant_index):
    """Multiple probe sequences per allele union their sample hits."""
    bigsi, ref_probe, alt_probe = variant_index
    vs = BIGSIVariantSearch(bigsi, reference="unused.fasta")
    decoy = "G" * 62  # matches nothing
    results = vs.genotype_alleles([decoy, ref_probe], [alt_probe, decoy])
    genotypes = {r["sample_name"]: r["genotype"] for r in results}
    assert genotypes == {"het": "0/1", "homref": "0/0", "homalt": "1/1"}


def test_variant_search_end_to_end_with_stubbed_probes(variant_index, monkeypatch):
    """Full .search() path with create_variant_probe_set stubbed to the
    canned FASTA mykrobe would emit (ref/alt distinguished by header)."""
    bigsi, ref_probe, alt_probe = variant_index
    vs = BIGSIVariantSearch(bigsi, reference="ref.fasta")
    fasta = (">ref-A41C?var_name=A41C\n%s\n>alt-A41C?var_name=A41C\n%s\n" % (
        ref_probe, alt_probe,
    )).encode()
    monkeypatch.setattr(vs, "create_variant_probe_set", lambda var_name: fasta)
    d = vs.search("A", 41, "C")
    assert d["query"] == "A41C"
    genotypes = {r["sample_name"]: r["genotype"] for r in d["results"]}
    assert genotypes == {"het": "0/1", "homref": "0/0", "homalt": "1/1"}


def test_amino_acid_mutation_search_stubbed(variant_index, monkeypatch):
    bigsi, ref_probe, alt_probe = variant_index
    vs = BIGSIAminoAcidMutationSearch(bigsi, "ref.fasta", "ref.gb")
    fasta = (">ref-K43R\n%s\n>alt-K43R\n%s\n" % (ref_probe, alt_probe)).encode()
    seen = {}

    def fake_probe_set(var_name):
        seen["var"] = var_name
        return fasta

    monkeypatch.setattr(vs, "create_variant_probe_set", fake_probe_set)
    d = vs.search("rpoB", "K", 43, "R")
    assert d["query"] == "rpoB_K43R"
    assert seen["var"] == "rpoB_K43R"
    assert {r["genotype"] for r in d["results"]} == {"0/0", "0/1", "1/1"}


def test_split_probes_parses_headers(variant_index):
    bigsi, ref_probe, alt_probe = variant_index
    vs = BIGSIVariantSearch(bigsi, reference="unused.fasta")
    fasta = (">ref-x\nACGT\n>alt-x\nTTTT\n>ref-y\nGGGG\n").encode()
    refs, alts = vs._split_probes(fasta)
    assert refs == ["ACGT", "GGGG"]
    assert alts == ["TTTT"]
