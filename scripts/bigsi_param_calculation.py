#!/usr/bin/env python
"""Index parameter sizing (Python port of the reference's
``scripts/bigsi-param-calculation.R``).

Given a target query-level false-discovery rate, sample count, minimum
query length and max k-mers per sample, derive the per-kmer Bloom FPR
``p``, the filter size ``m`` and hash count ``h``.
"""

from __future__ import annotations

import argparse
import json
import math


def calc_p(q_max: float, N: int, L_min: int, k: int) -> float:
    """Per-kmer FPR so that a query of L_min bases has FDR <= q_max over N samples."""
    kmer_l_min = L_min - k + 1
    return (q_max / N) ** (1.0 / kmer_l_min)


def calc_m(p: float, K_max: int) -> float:
    """Optimal Bloom bits for K_max elements at FPR p."""
    return -(K_max * math.log(p)) / (math.log(2) ** 2)


def calc_eta(p: float) -> int:
    """Optimal number of hash functions at FPR p."""
    return math.ceil(-math.log(p) / math.log(2))


def bloom_fpr(nbits: int, nel: int, nhash: int) -> float:
    return (1 - math.exp(-nhash * nel / nbits)) ** nhash


def query_fdr(nbits: int, nel: int, nhash: int, L_min: int, k: int) -> float:
    """FDR for an L_min-base query: every one of its k-mers must false-positive."""
    return bloom_fpr(nbits, nel, nhash) ** (L_min - k + 1)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--samples", "-N", type=int, default=10 ** 6)
    ap.add_argument("--max-kmers", "-K", type=int, default=10 ** 7)
    ap.add_argument("--min-query-length", "-L", type=int, default=50)
    ap.add_argument("--kmer-size", "-k", type=int, default=31)
    ap.add_argument("--target-fdr", "-q", type=float, default=10 ** -6)
    args = ap.parse_args()

    p = calc_p(args.target_fdr, args.samples, args.min_query_length, args.kmer_size)
    m = math.ceil(calc_m(p, args.max_kmers))
    h = calc_eta(p)
    print(
        json.dumps(
            {
                "per_kmer_fpr": p,
                "m": m,
                "h": h,
                "achieved_bloom_fpr": bloom_fpr(m, args.max_kmers, h),
                "achieved_query_fdr": query_fdr(
                    m, args.max_kmers, h, args.min_query_length, args.kmer_size
                ),
                "bytes_per_sample_bloom": m // 8,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
