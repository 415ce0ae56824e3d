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


# Measured per-kmer FPR multipliers vs classic at equal m/h on
# sequence-model genomes (scripts/fpr_calibration.py --genome sequence,
# m=2e6, 2e5 kmers, h=3, k=31; density 0.26).  Keyed (layout, tile_rows).
# The minimizer layout concentrates each run's ~run_len*h bits into one
# tile column, so its penalty is steep — size m with this factor, or
# rely on threshold amplification (see query_fpr_at_threshold).
#
# The factors were measured at per-kmer FPR ~0.02-0.09; applying them at
# the near-1 FPRs the exact-threshold model permits for long queries is
# an extrapolation — prefer the query_fpr_at_threshold report there.
LAYOUT_FPR_FACTOR = {
    ("classic", None): 1.0,
    ("blocked", 16): 2.3,
    ("blocked", 32): 1.6,
    ("blocked", 64): 1.3,
    ("minimizer", 16): 5.1,   # near-miss 12.7x
    ("minimizer", 32): 4.2,   # near-miss 7.8x
    ("minimizer", 64): 3.0,   # near-miss 4.4x
}


def layout_fpr_factor(layout: str, tile_rows) -> float:
    """Measured background-FPR factor for (layout, tile_rows).

    Raises for unmeasured combinations instead of silently sizing m
    with no layout premium — exactly the configs with the steepest
    penalties would otherwise default to classic-equivalent.
    """
    key = (layout, None if layout == "classic" else tile_rows)
    if key not in LAYOUT_FPR_FACTOR:
        raise SystemExit(
            "no measured FPR factor for layout=%s tile_rows=%s; run "
            "scripts/fpr_calibration.py --tile-rows %s --premium and add "
            "the result to LAYOUT_FPR_FACTOR" % (layout, tile_rows, tile_rows)
        )
    return LAYOUT_FPR_FACTOR[key]


def _binom_sf(n: int, p: float, t: int) -> float:
    """P(Binomial(n, p) >= t), exact summation (n is query length scale)."""
    if t <= 0 or p >= 1.0:
        return 1.0
    if p <= 0.0:
        return 0.0
    total = 0.0
    logp, log1p = math.log(p) if p > 0 else -math.inf, math.log1p(-p)
    for i in range(t, n + 1):
        total += math.exp(
            math.lgamma(n + 1) - math.lgamma(i + 1) - math.lgamma(n - i + 1)
            + i * logp + (n - i) * log1p
        )
    return min(total, 1.0)


def query_fpr_at_threshold(
    per_kmer_fpr: float, L: int, k: int, threshold: float
) -> float:
    """Probability an ABSENT query reaches the hit threshold: at least
    ceil(threshold * n_kmers) of its n_kmers k-mers must false-positive
    (``bigsi/graph/bigsi.py:179`` ceil semantics).  This is the
    amplification that lets the reference tolerate per-kmer FPRs of
    ~0.05-0.1 at production density — and what absorbs the minimizer
    layout's measured per-kmer premium at thresholds >= 0.5."""
    n = L - k + 1
    t = math.ceil(n * threshold)
    return _binom_sf(n, per_kmer_fpr, t)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--samples", "-N", type=int, default=10 ** 6)
    ap.add_argument("--max-kmers", "-K", type=int, default=10 ** 7)
    ap.add_argument("--min-query-length", "-L", type=int, default=50)
    ap.add_argument("--kmer-size", "-k", type=int, default=31)
    ap.add_argument("--target-fdr", "-q", type=float, default=10 ** -6)
    ap.add_argument("--layout", default="classic",
                    choices=("classic", "blocked", "minimizer"))
    ap.add_argument("--tile-rows", type=int, default=32)
    ap.add_argument("--threshold", "-t", type=float, default=1.0,
                    help="search threshold for the query-level FPR report")
    args = ap.parse_args()

    p = calc_p(args.target_fdr, args.samples, args.min_query_length, args.kmer_size)
    factor = layout_fpr_factor(args.layout, args.tile_rows)
    # size m so the LAYOUT's effective per-kmer FPR hits the target p
    m = math.ceil(calc_m(p / factor, args.max_kmers))
    h = calc_eta(p)
    eff_fpr = min(1.0, factor * bloom_fpr(m, args.max_kmers, h))
    print(
        json.dumps(
            {
                "per_kmer_fpr": p,
                "layout": args.layout,
                "layout_fpr_factor": factor,
                "m": m,
                "h": h,
                "achieved_bloom_fpr": eff_fpr,
                "achieved_query_fdr": eff_fpr
                ** (args.min_query_length - args.kmer_size + 1),
                "query_fpr_at_threshold": query_fpr_at_threshold(
                    eff_fpr, args.min_query_length, args.kmer_size,
                    args.threshold,
                ),
                "bytes_per_sample_bloom": m // 8,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
