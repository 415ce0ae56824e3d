"""Layout FPR properties, measured on planted ground truth
(VERDICT r1 item 8; full-scale numbers in scripts/fpr_calibration.py
and hashing/scheme.py docs).

Two genome models:
* random-kmers — independent k-mers; isolates the blocked-Bloom penalty
  (the minimizer run concentration cannot show: no k-mer shares a tile).
* sequence — sliding-window k-mers of one sequence, the REAL data
  model: minimizer runs put ~run_len*h bits into one tile column, so
  near-miss (and background) FPR rise well above blocked's.  Round 2
  originally calibrated with random k-mers only and UNDERSTATED the
  minimizer trade (scheme.py documents both tables).
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.fpr_calibration import measure


def test_layout_fpr_ordering_random_kmers():
    res = measure(
        m=400_000, n_kmers=40_000, h=3, k=31, seed=3,
        genome_mode="random-kmers",
    )
    classic = res["classic"]
    blocked = res["blocked"]
    minimizer = res["minimizer"]

    # recall is asserted inside measure() (no false negatives)

    # densities agree across layouts (same bit budget; no run collisions)
    assert abs(classic["density"] - minimizer["density"]) < 0.02

    # blocked pays a block-Bloom penalty over classic, bounded
    assert classic["fpr_background"] < blocked["fpr_background"]
    assert blocked["fpr_background"] < 3 * classic["fpr_background"]

    # with independent k-mers the minimizer penalty is specifically a
    # NEAR-MISS effect: background matches blocked, near-miss exceeds it
    assert abs(
        minimizer["fpr_background"] - blocked["fpr_background"]
    ) < 0.35 * blocked["fpr_background"]
    assert minimizer["fpr_near_miss"] > blocked["fpr_near_miss"] * 0.95
    assert minimizer["fpr_near_miss"] < 3 * classic["fpr_near_miss"]


def test_layout_fpr_sequence_genome_run_concentration():
    res = measure(
        m=400_000, n_kmers=40_000, h=3, k=31, seed=3,
        genome_mode="sequence",
    )
    classic = res["classic"]
    blocked = res["blocked"]
    minimizer = res["minimizer"]

    # classic/blocked are insensitive to the genome model (independent
    # row hashes), minimizer is NOT: runs lower the distinct-bit density
    # (collisions within a tile column) and raise both FPRs
    assert minimizer["density"] < classic["density"] - 0.01
    assert minimizer["fpr_near_miss"] > 2 * blocked["fpr_near_miss"]
    assert minimizer["fpr_background"] > blocked["fpr_background"]

    # taller tiles dilute the concentration
    res64 = measure(
        m=400_000, n_kmers=40_000, h=3, k=31, seed=3,
        genome_mode="sequence", tile_rows=64,
    )
    assert (
        res64["minimizer"]["fpr_near_miss"]
        < minimizer["fpr_near_miss"]
    )
