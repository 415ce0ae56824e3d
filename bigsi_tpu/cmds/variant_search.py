"""Variant search / genotyping (reference: ``bigsi/cmds/variant_search.py``).

Probe generation shells out to the external ``mykrobe variants
make-probes`` tool (optional dependency, exactly as in the reference at
``variant_search.py:45-58``); the genotyping logic — exact search of
ref/alt probes, classify samples 0/0, 0/1, 1/1 — is implemented here.
"""

from __future__ import annotations

import logging
import os
import subprocess
import tempfile

from bigsi_tpu.io.fasta import read_fasta

logger = logging.getLogger(__name__)


def flatten(l):
    return [item for sublist in l for item in sublist]


class BIGSIVariantSearch:
    def __init__(self, bigsi, reference):
        self.bigsi = bigsi
        self.reference = reference

    def create_variant_probe_set(self, var_name: str) -> bytes:
        return subprocess.check_output(
            [
                "mykrobe",
                "variants",
                "make-probes",
                "-k",
                str(self.bigsi.kmer_size),
                "-v",
                var_name,
                self.reference,
            ]
        )

    def _split_probes(self, fasta_string: bytes):
        with tempfile.NamedTemporaryFile(suffix=".fasta", delete=False) as fp:
            fp.write(fasta_string)
            path = fp.name
        try:
            fasta = read_fasta(path)
        finally:
            os.unlink(path)
        refs, alts = [], []
        for name, seq in fasta.items():
            (refs if "ref" in name else alts).append(str(seq))
        return refs, alts

    def search(self, ref_base, pos, alt_base="X") -> dict:
        var_name = "".join([ref_base, str(pos), alt_base])
        refs, alts = self._split_probes(self.create_variant_probe_set(var_name))
        return {"query": var_name, "results": self.genotype_alleles(refs, alts)}

    def search_for_alleles(self, ref_seqs, alt_seqs) -> dict:
        results = {"ref": [], "alt": []}
        for ref in ref_seqs:
            res = self.bigsi.search(ref, 1, score=False)
            results["ref"].extend([r["sample_name"] for r in res])
        for alt in alt_seqs:
            res = self.bigsi.search(alt, 1, score=False)
            results["alt"].extend([r["sample_name"] for r in res])
        return results

    def genotype_alleles(self, refs, alts) -> list:
        ref_alt_samples = self.search_for_alleles(refs, alts)
        results = []
        for sample_name in set(flatten(ref_alt_samples.values())):
            in_ref = sample_name in ref_alt_samples["ref"]
            in_alt = sample_name in ref_alt_samples["alt"]
            if in_ref and in_alt:
                results.append({"sample_name": sample_name, "genotype": "0/1"})
            elif in_ref:
                results.append({"sample_name": sample_name, "genotype": "0/0"})
            elif in_alt:
                results.append({"sample_name": sample_name, "genotype": "1/1"})
        return results


class BIGSIAminoAcidMutationSearch(BIGSIVariantSearch):
    def __init__(self, bigsi, reference, genbank):
        super().__init__(bigsi, reference)
        self.genbank = genbank

    def create_variant_probe_set(self, var_name: str) -> bytes:
        return subprocess.check_output(
            [
                "mykrobe",
                "variants",
                "make-probes",
                "-k",
                str(self.bigsi.kmer_size),
                "-v",
                var_name,
                "-g",
                self.genbank,
                self.reference,
            ]
        )

    def search(self, gene, ref, pos, alt) -> dict:
        mut_name = "".join([ref, str(pos), alt])
        gene_mut_name = "_".join([gene, mut_name])
        refs, alts = self._split_probes(self.create_variant_probe_set(gene_mut_name))
        return {"query": gene_mut_name, "results": self.genotype_alleles(refs, alts)}
