"""Param-calculator math (port of the reference's
``scripts/bigsi-param-calculation.R``) plus the layout-aware
query-level FPR report added for the measured layout premiums."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.bigsi_param_calculation import (
    bloom_fpr,
    calc_eta,
    calc_m,
    calc_p,
    query_fdr,
    query_fpr_at_threshold,
)


def test_reference_r_script_math():
    # the R script's own example: N=1e6 samples, L=50, k=31, q=1e-6
    p = calc_p(1e-6, 10 ** 6, 50, 31)
    assert abs(p - (1e-12) ** (1 / 20)) < 1e-12
    m = calc_m(p, 10 ** 7)
    h = calc_eta(p)
    # optimal-h bloom at the optimal m achieves ~p per-kmer
    assert bloom_fpr(math.ceil(m), 10 ** 7, h) <= p * 1.25
    assert query_fdr(math.ceil(m), 10 ** 7, h, 50, 31) <= 1e-6 * 2


def test_query_fpr_threshold_amplification():
    # exact threshold: FPR^n_kmers
    assert abs(
        query_fpr_at_threshold(0.1, 50, 31, 1.0) - 0.1 ** 20
    ) < 1e-22
    # threshold amplification absorbs large per-kmer FPRs: the measured
    # minimizer/16 near-miss rate (0.227) is query-negligible at t=0.7
    assert query_fpr_at_threshold(0.227, 100, 31, 0.7) < 1e-10
    # monotone in p and in threshold
    assert query_fpr_at_threshold(0.3, 100, 31, 0.5) > (
        query_fpr_at_threshold(0.2, 100, 31, 0.5)
    )
    assert query_fpr_at_threshold(0.2, 100, 31, 0.5) > (
        query_fpr_at_threshold(0.2, 100, 31, 0.9)
    )
    # edge cases
    assert query_fpr_at_threshold(1.0, 100, 31, 0.5) == 1.0
    assert query_fpr_at_threshold(0.0, 100, 31, 0.5) == 0.0
