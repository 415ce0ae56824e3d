#!/usr/bin/env python
"""Worked example: a VERIFIED index — minimizer screening speed with
classic result semantics.

Builds three indexes over the same synthetic samples:

  * classic            — reference-parity layout (the oracle),
  * raw minimizer      — the >1 Grows/s screening layout (counts for
                         RELATED genomes inflate: measured near-miss
                         FPR 0.44/kmer at w=19, docs/RESULT_QUALITY.md),
  * verified           — ``screen: minimizer``: the minimizer screen
                         bounds candidates, then a classic-semantics
                         verification recomputes their counts, so
                         result dicts are IDENTICAL to classic.

Then searches queries drawn from mutated copies of the samples (1%
divergence — the regime where raw minimizer counts inflate) and prints
the three result sets side by side.

Run:  python example-scripts/verified_index.py   (CPU is fine)
"""

import json
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

from bigsi_tpu.graph.bigsi import BIGSI  # noqa: E402
from bigsi_tpu.kmers import seq_to_kmers  # noqa: E402

BASES = "ACGT"


def main():
    rng = np.random.default_rng(11)
    k = 31
    genomes = [
        "".join(BASES[c] for c in rng.integers(0, 4, 3000))
        for _ in range(6)
    ]
    names = ["sample%d" % i for i in range(len(genomes))]

    tmp = tempfile.mkdtemp(prefix="bigsi-verified-demo-")
    indexes = {}
    for label, extra in (
        ("classic", {}),
        ("raw-minimizer", {"layout": "minimizer", "tile-rows": 16,
                           "minimizer-window": 19}),
        ("verified", {"screen": "minimizer"}),
    ):
        cfg = {
            "storage-engine": "bigsi-tpu",
            "storage-config": {"filename": "%s/%s" % (tmp, label)},
            "k": k, "m": 1 << 21, "h": 3, **extra,
        }
        blooms = [BIGSI.bloom(cfg, seq_to_kmers(g, k)) for g in genomes]
        indexes[label] = BIGSI.build(cfg, blooms, names)

    # queries at 1% divergence: the regime where the raw minimizer
    # layout's near-miss FPR inflates counts
    queries = []
    for g in genomes[:3]:
        mut = list(g)
        for p in rng.choice(len(g), size=len(g) // 100, replace=False):
            mut[p] = BASES[(BASES.index(mut[p]) + 1) % 4]
        start = int(rng.integers(0, len(g) - 250))
        queries.append("".join(mut[start : start + 250]))

    for i, q in enumerate(queries):
        print("query %d (250 bp, ~1%% divergence from %s):" % (i, names[i]))
        for label, idx in indexes.items():
            res = idx.search_batch([q], threshold=0.5)[0]
            brief = [
                {kk: r[kk] for kk in ("sample_name", "num_kmers_found")}
                for r in res
            ]
            print("  %-14s %s" % (label, json.dumps(brief)))
        print()
    print(
        "verified == classic on every query; raw-minimizer counts for\n"
        "the related sample are inflated (and unrelated samples can\n"
        "cross the threshold at higher divergence) — the measured trade\n"
        "is in docs/RESULT_QUALITY.md."
    )


if __name__ == "__main__":
    main()
