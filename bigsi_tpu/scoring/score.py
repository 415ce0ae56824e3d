"""BLAST-ungapped-style scoring of k-mer presence strings.

Numeric parity with ``bigsi/scoring/score.py`` (golden dict in
``bigsi/tests/scoring.py:10-31``), including its quirks:

* ``remove_short_ones`` erodes 1-runs shorter than 3 by AND-ing the
  string with its two left-shifts, padding with ones at the end
  (``score.py:7-16``);
* ``tabulate_score`` reports every non-final run as ``length + 1`` and
  only the final run at its true length (``score.py:19-32``);
* SNP threshold hard-codes k=31 (+3 ``kmer_adjust``) and ``seq_len``
  adds ``31 - 1`` (``score.py:61, 99``);
* BLAST constants: lambda=1.330, K=0.621 ungapped (``score.py:39-42``).

The run-length tabulation here is vectorized numpy instead of the
reference's per-character loop, with the off-by-one behavior preserved.
"""

from __future__ import annotations

import copy
import math

import numpy as np


def remove_short_ones(s: str) -> str:
    if len(s) < 3:
        return s
    a = np.frombuffer(s.encode("ascii"), dtype=np.uint8) - ord("0")
    padded = np.concatenate([a, np.ones(2, dtype=np.uint8)])
    out = padded[:-2] & padded[1:-1] & padded[2:]
    return "".join("1" if v else "0" for v in out)


def tabulate_score(ss: str) -> dict:
    """Run-length tabulation with the reference's +1 on non-final runs."""
    score_counter = {"0": [], "1": []}
    if not ss:
        return score_counter
    a = np.frombuffer(ss.encode("ascii"), dtype=np.uint8)
    boundaries = np.flatnonzero(a[1:] != a[:-1])
    starts = np.concatenate([[0], boundaries + 1])
    ends = np.concatenate([boundaries, [len(a) - 1]])
    lengths = ends - starts + 1
    chars = a[starts]
    for i in range(len(starts)):
        run_len = int(lengths[i]) if i == len(starts) - 1 else int(lengths[i]) + 1
        score_counter[chr(chars[i])].append(run_len)
    return score_counter


class Scorer:
    def __init__(
        self,
        DB_SIZE,
        MATCH=1,
        MISMATCH=2,
        LAMBDA_UNGAPPED=1.330,
        K_UNGAPPED=0.621,
        LAMBDA_GAPPED=1.28,
        K_GAPPED=0.46,
    ):
        self.LAMBDA_UNGAPPED = LAMBDA_UNGAPPED
        self.K_UNGAPPED = K_UNGAPPED
        self.LAMBDA_GAPPED = LAMBDA_GAPPED
        self.K_GAPPED = K_GAPPED
        self.MATCH = MATCH
        self.DB_SIZE = DB_SIZE
        self.MISMATCH = MISMATCH
        self.kmer_adjust = 3

    def calculate_score(self, score_counter, convert):
        max_score = copy.copy(self.MATCH * sum(score_counter["1"]))
        min_score = copy.copy(max_score)
        mean_score = copy.copy(min_score)

        SNP_t = 31 + self.kmer_adjust
        max_total_N_snps = 0
        min_total_N_snps = 0
        for i in score_counter["0"]:
            min_N_snps = float(i) / SNP_t
            max_N_snps = (i - SNP_t) + 1
            if max_N_snps < min_N_snps:
                max_N_snps = min_N_snps
            max_total_N_snps += max_N_snps
            min_total_N_snps += min_N_snps
            mean_N_snps = min_N_snps + 0.05 * max_N_snps

            max_penalty = self.MISMATCH * max_N_snps
            min_penalty = self.MISMATCH * min_N_snps
            mean_penalty = self.MISMATCH * mean_N_snps

            points_for_max = self.MATCH * (i - max_penalty)
            points_for_min = self.MATCH * (i - min_penalty)
            points_for_mean = self.MATCH * (i - mean_penalty)

            max_score = round(max_score - min_penalty + points_for_min, 2)
            min_score = round(min_score - max_penalty + points_for_max, 2)
            mean_score = round(mean_score - mean_penalty + points_for_mean, 2)

        return {
            "score": round(mean_score * convert, 2),
            "min_score": round(min_score * convert, 2),
            "max_score": round(max_score * convert, 2),
            "max_mismatches": math.ceil(max_total_N_snps),
            "min_mismatches": math.floor(min_total_N_snps),
            "mismatches": math.ceil(
                math.ceil(min_total_N_snps) + (0.05 * math.floor(max_total_N_snps))
            ),
        }

    def score(self, s: str) -> dict:
        ss = remove_short_ones(s)
        max_possible_score = len(ss)
        seq_len = max_possible_score + 31 - 1
        convert = seq_len / max_possible_score
        score_counter = tabulate_score(ss)
        score_dict = self.calculate_score(score_counter, convert)
        score_dict["max_nident"] = seq_len - score_dict.get("min_mismatches")
        score_dict["nident"] = seq_len - score_dict.get("mismatches")
        score_dict["min_nident"] = seq_len - score_dict.get("max_mismatches")
        score_dict["pident"] = 100 * float(score_dict["nident"]) / seq_len
        score_dict["max_pident"] = 100 * float(score_dict["max_nident"]) / seq_len
        score_dict["min_pident"] = 100 * float(score_dict["min_nident"]) / seq_len
        score_dict["length"] = seq_len
        score_dict["evalue"] = self.evalue(score_dict["score"], seq_len)
        score_dict["pvalue"] = self.pvalue(score_dict["evalue"])
        score_dict["log_evalue"] = round(self.log_evalue(score_dict["score"], seq_len), 2)
        score_dict["log_pvalue"] = round(self.log_pvalue(score_dict["log_evalue"]), 2)
        return score_dict

    def bitscore(self, s: str):
        scored = self.score(s)
        score = scored.get("score")
        return (self.LAMBDA_UNGAPPED * score - np.log(self.K_UNGAPPED)) / np.log(2)

    def evalue(self, score, n):
        return self.K_UNGAPPED * self.DB_SIZE * n * np.exp(-self.LAMBDA_UNGAPPED * score)

    def pvalue(self, evalue):
        return 1 - np.exp(-evalue)

    def log_evalue(self, score, n):
        m = self.DB_SIZE or 1
        return round(
            np.log10(self.K_UNGAPPED * m * n) - self.LAMBDA_UNGAPPED * score, 2
        )

    def log_pvalue(self, log_evalue):
        evalue = 10 ** log_evalue
        if 1 - np.exp(-evalue) > 0:
            logp = np.log10(1 - np.exp(-evalue))
        else:
            logp = -np.inf
        if logp == -np.inf:
            return round(log_evalue, 2)
        return round(logp, 2)
