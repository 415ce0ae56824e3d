"""Layout FPR properties, measured on planted ground truth
(VERDICT r1 item 8; full-scale numbers in scripts/fpr_calibration.py
and hashing/scheme.py docs)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.fpr_calibration import measure


def test_layout_fpr_ordering_and_recall():
    res = measure(m=400_000, n_kmers=40_000, h=3, k=31, seed=3)
    classic = res["classic"]
    blocked = res["blocked"]
    minimizer = res["minimizer"]

    # recall is asserted inside measure() (no false negatives)

    # densities agree across layouts (same bit budget)
    assert abs(classic["density"] - minimizer["density"]) < 0.02

    # blocked pays a block-Bloom penalty over classic, bounded
    assert classic["fpr_background"] < blocked["fpr_background"]
    assert blocked["fpr_background"] < 3 * classic["fpr_background"]

    # the minimizer penalty is specifically a NEAR-MISS effect:
    # background FPR matches blocked, near-miss exceeds it
    assert abs(
        minimizer["fpr_background"] - blocked["fpr_background"]
    ) < 0.35 * blocked["fpr_background"]
    assert minimizer["fpr_near_miss"] > blocked["fpr_near_miss"] * 0.95
    assert minimizer["fpr_near_miss"] < 3 * classic["fpr_near_miss"]
