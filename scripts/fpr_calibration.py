#!/usr/bin/env python
"""Empirical FPR calibration: classic vs blocked vs minimizer layouts.

The minimizer layout trades FPR for fetch dedup (docs/DESIGN.md): all
k-mers of a minimizer run land in ONE 32-row tile, so a *near-miss*
query k-mer (e.g. one SNP away from an indexed k-mer) that keeps its
minimizer probes a tile crowded with its neighbors' bits.  Uniform
random query k-mers see no correlation — their tile choice is
independent of the indexed k-mers.

This script MEASURES both regimes at equal m/h (VERDICT r1 item 8,
replacing the "~10-20% extra m" guess in hashing/scheme.py):

* build one sample's Bloom from a random genome of n_kmers,
* recall check: every indexed k-mer must be found (Blooms have no
  false negatives — sanity),
* background FPR: random k-mers,
* near-miss FPR: indexed k-mers with one random SNP (excluding true
  positives),
* m premium: the factor by which m must grow for the minimizer
  near-miss FPR to match classic's at the base m.

Usage: python scripts/fpr_calibration.py [--m 2000000] [--kmers 200000]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigsi_tpu.hashing.scheme import row_indices
from bigsi_tpu.kmers import canonicalize_kmer_matrix

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_kmer_matrix(rng, n, k):
    return BASES[rng.integers(0, 4, size=(n, k))]


def mutate_one(rng, kmers):
    """One random substitution per k-mer (guaranteed to change the base)."""
    out = kmers.copy()
    n, k = kmers.shape
    pos = rng.integers(0, k, size=n)
    shift = rng.integers(1, 4, size=n)
    old = out[np.arange(n), pos]
    code = np.searchsorted(BASES, old)  # BASES sorted: A C G T
    out[np.arange(n), pos] = BASES[(code + shift) % 4]
    return out


def build_bits(kmers, m, h, layout, tile_rows=32, window=None,
               slot_scheme=1):
    rows = row_indices(
        canonicalize_kmer_matrix(kmers), h, m, layout, tile_rows,
        window=window, slot_scheme=slot_scheme,
    )
    bits = np.zeros(m, dtype=bool)
    bits[rows.reshape(-1)] = True
    return bits


def query_present(bits, kmers, m, h, layout, tile_rows=32, window=None,
                  slot_scheme=1):
    rows = row_indices(
        canonicalize_kmer_matrix(kmers), h, m, layout, tile_rows,
        window=window, slot_scheme=slot_scheme,
    )
    return bits[rows].all(axis=1)


def kmer_set(kmers):
    return {bytes(r) for r in canonicalize_kmer_matrix(kmers)}


def sequence_kmer_matrix(rng, n, k):
    """Sliding-window k-mers of one random sequence — the real data
    model: consecutive k-mers share minimizers, so minimizer tiles get
    runs of ~run_len*h bits per sample (independent random k-mers
    UNDERESTIMATE minimizer tile crowding)."""
    seq = BASES[rng.integers(0, 4, size=n + k - 1)]
    return np.lib.stride_tricks.sliding_window_view(seq, k).copy()


def measure(m, n_kmers, h, k, seed=0, tile_rows=32, window=None,
            genome_mode="sequence", slot_scheme=1):
    rng = np.random.default_rng(seed)
    make = (sequence_kmer_matrix if genome_mode == "sequence"
            else random_kmer_matrix)
    genome = make(rng, n_kmers, k)
    truth = kmer_set(genome)
    nq = min(100_000, 2 * n_kmers)
    background = random_kmer_matrix(rng, nq, k)
    near = mutate_one(rng, genome[rng.integers(0, n_kmers, size=nq)])

    bg_true = np.fromiter(
        (bytes(r) in truth for r in canonicalize_kmer_matrix(background)),
        bool, count=nq,
    )
    near_true = np.fromiter(
        (bytes(r) in truth for r in canonicalize_kmer_matrix(near)),
        bool, count=nq,
    )

    results = {}
    for layout in ("classic", "blocked", "minimizer"):
        w = window if layout == "minimizer" else None
        ss = slot_scheme if layout == "minimizer" else 1
        bits = build_bits(genome, m, h, layout, tile_rows, window=w,
                          slot_scheme=ss)
        assert query_present(
            bits, genome, m, h, layout, tile_rows, window=w, slot_scheme=ss
        ).all(), "false negative in %s" % layout
        bg_hit = query_present(
            bits, background, m, h, layout, tile_rows, window=w,
            slot_scheme=ss,
        )
        near_hit = query_present(
            bits, near, m, h, layout, tile_rows, window=w, slot_scheme=ss
        )
        results[layout] = {
            "density": round(float(bits.mean()), 4),
            "fpr_background": round(
                float(bg_hit[~bg_true].mean()), 5
            ),
            "fpr_near_miss": round(
                float(near_hit[~near_true].mean()), 5
            ),
        }
    return results


def m_premium(base_m, n_kmers, h, k, target_fpr, seed=1, tile_rows=32,
              window=None, genome_mode="sequence", slot_scheme=1,
              layout="minimizer"):
    """Smallest m-scale factor at which ``layout``'s near-miss FPR <=
    the classic near-miss FPR at base_m."""
    for scale in (1.0, 1.1, 1.2, 1.3, 1.5, 1.75, 2.0, 2.5, 3.0, 3.5,
                  4.0, 5.0, 6.0):
        m = int(base_m * scale)
        r = measure(m, n_kmers, h, k, seed=seed, tile_rows=tile_rows,
                    window=window, genome_mode=genome_mode,
                    slot_scheme=slot_scheme)
        if r[layout]["fpr_near_miss"] <= target_fpr:
            return scale, r[layout]["fpr_near_miss"]
    return float("inf"), None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2_000_000)
    ap.add_argument("--kmers", type=int, default=200_000)
    ap.add_argument("--h", type=int, default=3)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--premium", action="store_true",
                    help="also search for the equal-FPR m premium")
    ap.add_argument("--tile-rows", type=int, default=32,
                    help="tile height for blocked/minimizer layouts")
    ap.add_argument("--window", type=int, default=None,
                    help="minimizer window (default: w=11, runs ~6)")
    ap.add_argument("--slot-scheme", type=int, default=1,
                    help="minimizer slot scheme (1 legacy, 2 serving)")
    ap.add_argument("--genome", choices=("sequence", "random-kmers"),
                    default="sequence",
                    help="genome model: sliding-window sequence k-mers "
                         "(real crowding) or independent random k-mers")
    args = ap.parse_args()

    res = measure(args.m, args.kmers, args.h, args.k,
                  tile_rows=args.tile_rows, window=args.window,
                  genome_mode=args.genome, slot_scheme=args.slot_scheme)
    print("m=%d n_kmers=%d h=%d k=%d tile_rows=%d window=%s genome=%s "
          "slot_scheme=%d"
          % (args.m, args.kmers, args.h, args.k, args.tile_rows,
             args.window, args.genome, args.slot_scheme),
          file=sys.stderr)
    print("%-10s %8s %14s %14s" % ("layout", "density", "fpr_background",
                                   "fpr_near_miss"), file=sys.stderr)
    for layout, r in res.items():
        print("%-10s %8.4f %14.5f %14.5f" % (
            layout, r["density"], r["fpr_background"], r["fpr_near_miss"]),
            file=sys.stderr)

    out = {"m": args.m, "n_kmers": args.kmers, "h": args.h,
           "tile_rows": args.tile_rows, "window": args.window,
           "genome": args.genome, "slot_scheme": args.slot_scheme,
           "layouts": res}
    if args.premium:
        target = res["classic"]["fpr_near_miss"]
        for layout in ("minimizer", "blocked"):
            scale, fpr = m_premium(
                args.m, args.kmers, args.h, args.k, target,
                tile_rows=args.tile_rows, window=args.window,
                genome_mode=args.genome, slot_scheme=args.slot_scheme,
                layout=layout,
            )
            out["m_premium_for_classic_near_miss_fpr_%s" % layout] = scale
            print(
                "%s m premium for classic near-miss FPR parity: %.2fx"
                % (layout, scale),
                file=sys.stderr,
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
