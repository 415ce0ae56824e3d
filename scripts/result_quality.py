"""End-to-end RESULT-QUALITY benchmark: per-layout precision / recall /
count inflation against the classic oracle on realistic related genomes.

Round-3 verdict item 2: FPR was characterized only per-kmer
(scripts/fpr_calibration.py); nothing measured what the reference's
integration tests measure — actual result dicts
(/root/reference/bigsi/tests/graph/test_end_to_end.py:69-91) — for
queries drawn from RELATED genomes (0.1-5% divergence) at t=0.5-1.0.

Protocol:
  * N_SAMPLES synthetic genomes are indexed per layout (same k-mer
    content everywhere; only the hash layout differs).
  * Queries: windows from MUTATED copies of indexed genomes at each
    divergence (substitutions, rate d), plus unrelated background
    windows.
  * For each (layout, divergence, threshold): result sets are compared
    query-by-query against the classic index's (the reference-semantics
    oracle).  Reported:
      - precision  |layout ∩ classic| / |layout|   (1 - how many extra
        colours the layout's inflated counts admit)
      - recall     |layout ∩ classic| / |classic|  (should be 1.0:
        blooms have no false negatives, inflation only adds)
      - count_err  mean (layout_count - classic_count) / num_kmers over
        colours reported by BOTH (how inflated the reported
        percent_kmers_found is)
  * The ``verified`` row is the two-stage screened index — its results
    are classic by construction; it is included to CONFIRM identity on
    this workload (precision = recall = 1, count_err = 0).

Run:  python scripts/result_quality.py [--quick]
Measured numbers land in docs/RESULT_QUALITY.md.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from bigsi_tpu.graph.bigsi import BIGSI  # noqa: E402
from bigsi_tpu.kmers import seq_to_kmers  # noqa: E402

BASES = "ACGT"


def synth_genome(rng, length):
    return "".join(BASES[i] for i in rng.integers(0, 4, length))


def mutate(rng, seq, divergence):
    """Substitute bases at rate ``divergence``."""
    arr = list(seq)
    n_mut = max(1, int(len(seq) * divergence))
    for p in rng.choice(len(seq), size=n_mut, replace=False):
        arr[p] = BASES[(BASES.index(arr[p]) + 1 + int(rng.integers(3))) % 4]
    return "".join(arr)


LAYOUTS = [
    ("classic", {}),
    ("blocked32", {"layout": "blocked", "tile-rows": 32}),
    ("blocked16", {"layout": "blocked", "tile-rows": 16}),
    ("minimizer32-w11", {"layout": "minimizer", "tile-rows": 32,
                         "minimizer-window": 11}),
    ("minimizer16-w11", {"layout": "minimizer", "tile-rows": 16,
                         "minimizer-window": 11}),
    ("minimizer16-w19", {"layout": "minimizer", "tile-rows": 16,
                         "minimizer-window": 19}),
    ("verified(w19)", {"screen": "minimizer"}),
]


def run(quick=False):
    rng = np.random.default_rng(2024)
    k = 31
    n_samples = 8 if quick else 16
    genome_len = 2000 if quick else 5000
    m = 1 << 20 if quick else 1 << 22
    qlen = 200
    divergences = [0.001, 0.01, 0.05]
    thresholds = [0.5, 0.7, 0.9, 1.0]

    genomes = [synth_genome(rng, genome_len) for _ in range(n_samples)]
    names = ["s%d" % i for i in range(n_samples)]

    # queries: windows of mutated genomes per divergence + background
    query_sets = {}
    for d in divergences:
        qs = []
        for g in genomes:
            mut = mutate(rng, g, d)
            for _ in range(3 if quick else 6):
                p = int(rng.integers(0, genome_len - qlen))
                qs.append(mut[p : p + qlen])
        query_sets[d] = qs
    query_sets["bg"] = [synth_genome(rng, qlen) for _ in range(40)]

    indexes = {}
    for label, extra in LAYOUTS:
        cfg = {
            "storage-engine": "memory",
            "storage-config": {"filename": "rq-%s" % label},
            "k": k, "m": m, "h": 3, **extra,
        }
        blooms = [BIGSI.bloom(cfg, seq_to_kmers(g, k)) for g in genomes]
        indexes[label] = BIGSI.build(cfg, blooms, names)

    oracle = indexes["classic"]
    print(
        "result quality vs classic oracle | k=%d m=%.1e h=3 N=%d "
        "genome=%dbp qlen=%d" % (k, m, n_samples, genome_len, qlen)
    )
    header = (
        "layout", "div", "t", "precision", "recall", "count_err", "hits"
    )
    print("%-18s %-6s %-4s %-9s %-7s %-9s %s" % header)
    rows = []
    for label, _ in LAYOUTS:
        idx = indexes[label]
        for dkey in divergences + ["bg"]:
            queries = query_sets[dkey]
            for t in thresholds:
                got = idx.search_batch(queries, threshold=t)
                want = (
                    got
                    if label == "classic"
                    else oracle.search_batch(queries, threshold=t)
                )
                inter = tp = fp = fn = 0
                err_sum, err_n, n_hits = 0.0, 0, 0
                for gres, wres in zip(got, want):
                    gmap = {r["sample_name"]: r for r in gres}
                    wmap = {r["sample_name"]: r for r in wres}
                    both = gmap.keys() & wmap.keys()
                    tp += len(both)
                    fp += len(gmap.keys() - wmap.keys())
                    fn += len(wmap.keys() - gmap.keys())
                    n_hits += len(gmap)
                    for s in both:
                        err_sum += (
                            gmap[s]["num_kmers_found"]
                            - wmap[s]["num_kmers_found"]
                        ) / gmap[s]["num_kmers"]
                        err_n += 1
                precision = tp / (tp + fp) if (tp + fp) else 1.0
                recall = tp / (tp + fn) if (tp + fn) else 1.0
                count_err = err_sum / err_n if err_n else 0.0
                rows.append(
                    (label, dkey, t, precision, recall, count_err, n_hits)
                )
                print(
                    "%-18s %-6s %-4.2g %-9.4f %-7.4f %-9.4f %d"
                    % (label, dkey, t, precision, recall, count_err, n_hits)
                )
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    run(**vars(ap.parse_args()))
