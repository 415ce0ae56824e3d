"""Device verify vs host verify at the bench's verified-serving shape.

Times the DeviceVerifier pass (classic fat-row gather +
AND over h + candidate-restricted csa popcount) against the native
host pass (and_count_words_batch) at B=256, K=512, h=3, 8 candidate
colours per query — the BENCH verified_qps worst case.  Marginal
per-step time via an in-program lax.scan chain (relay overhead ~26 ms
per dispatch, bench.py methodology).

Run ALONE (no co-running CPU load — docs/ROADMAP.md measurement
discipline): python scripts/probe_verify_device.py [--m 2500000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2_500_000)
    ap.add_argument("--w", type=int, default=32)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--cands", type=int, default=8)
    ap.add_argument("--chain", type=int, default=9)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("BIGSI_TPU_JAX_CACHE", "/root/repo/.jax_cache"),
    )
    from bigsi_tpu import native
    from bigsi_tpu.index.device_engine import DeviceVerifier
    from bigsi_tpu.index.verify import split_verify_queries, verify_queries
    from bigsi_tpu.matrix.bitmatrix import BitSliceMatrix

    dev = jax.devices()[0]
    m, w, b, k, h, c = args.m, args.w, args.b, args.k, 3, args.cands
    n_cols = w * 32
    rng = np.random.default_rng(0)

    words = rng.integers(0, 1 << 32, size=(m, w), dtype=np.uint32)
    verifier = DeviceVerifier(BitSliceMatrix(words, n_cols), device=dev)

    idx_list = [
        rng.integers(0, m, size=(k, h)).astype(np.int64) for _ in range(b)
    ]
    cand_list = [
        np.unique(rng.integers(0, n_cols, size=c)).astype(np.int64)
        for _ in range(b)
    ]

    def timed(fn, reps=3):
        fn()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    dev_ms = timed(lambda: verifier.counts(idx_list, cand_list))
    print("device verify (full-counts): %.3f ms/batch" % dev_ms)

    host_ms = split_ms = float("nan")
    if native.available():
        host_ms = timed(lambda: verify_queries(words, idx_list, cand_list))
        print("host verify:                 %.3f ms/batch" % host_ms)
        for _ in range(3):  # adapt the split fraction
            split_verify_queries(words, idx_list, cand_list, verifier)
        split_ms = timed(
            lambda: split_verify_queries(words, idx_list, cand_list, verifier)
        )
        print(
            "split verify:                %.3f ms/batch (fraction %.2f)"
            % (split_ms, verifier.split_fraction)
        )
        got = split_verify_queries(words, idx_list, cand_list, verifier)
        want = verify_queries(words, idx_list, cand_list)
        assert all(np.array_equal(a, bb) for a, bb in zip(got, want)), (
            "split results diverge from host oracle"
        )
        print("split == host oracle: ok")

    print(
        json.dumps(
            {
                "metric": "verify_pass_ms_per_batch",
                "device_ms": round(dev_ms, 3),
                "host_ms": round(host_ms, 3) if host_ms == host_ms else None,
                "split_ms": round(split_ms, 3)
                if split_ms == split_ms
                else None,
                "shape": {"m": m, "w": w, "b": b, "k": k, "cands": c},
                "platform": dev.platform,
            }
        )
    )


if __name__ == "__main__":
    main()
