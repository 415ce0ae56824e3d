#!/usr/bin/env python
"""Headline benchmark: bitslice-row AND+popcount throughput per chip.

Runs the batched inexact-search data plane at BASELINE.json's 1k-sample
config (m=2.5e7 bloom bits, 1024 samples): per k-mer, fetch its hash
rows, AND them, and accumulate per-sample hit counts.

Three engine layouts are timed; the headline is the best:

* classic — h independent row fetches per k-mer (reference-parity
  layout), fat-row packed for lane efficiency;
* blocked — the TPU-native blocked-Bloom layout: the k-mer's h rows
  live in one tile, fetched with a single fat DMA and reduced with a
  selection-masked AND (one-dispatch timing only — it is dominated by
  grouped on every recorded run);
* grouped — the minimizer layout's tile-dedup path: consecutive query
  k-mers share tiles in runs (~6), each distinct tile gathered ONCE,
  per-kmer presence expanded by sibling masked-AND reduces (fused to
  one gathered-input read), counts via the carry-save popcount tree —
  measured at tile_rows=32 (default FPR trade) and tile_rows=16 (the
  "tile-rows: 16" config; fastest supported layout).

Methodology: this environment reaches the chip through a relay with
~26 ms overhead per program execution, so steps are chained INSIDE one
compiled program (lax.scan, each step's indices perturbed by a value
derived from the previous counts so XLA cannot collapse the chain) and
the marginal per-step time is (t_n - t_1) / (n - 1), min over repeats.
This matches production serving, where many query batches stream
through one compiled step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 1e9 rows/s (the BASELINE.md target).
"""

import json
import sys
import time

import numpy as np


def _arm_deadline():
    """Emit a zero-valued record instead of hanging forever if the chip
    is unreachable (a wedged relay blocks even jax.devices(); see
    docs/DESIGN.md on the Pallas wedge hazard).  BENCH_DEADLINE_S=0
    disables."""
    import os
    import threading

    deadline = float(os.environ.get("BENCH_DEADLINE_S", "900"))
    if deadline <= 0:
        return

    def fire():
        print(
            json.dumps(
                {
                    "metric": "bitslice_row_and_popcount_throughput",
                    "value": 0,
                    "unit": "rows/s/chip",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        print(
            "bench deadline (%.0fs) expired: device unreachable or hung"
            % deadline,
            file=sys.stderr,
            flush=True,
        )
        os._exit(2)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()


def main():
    sys.path.insert(0, "/root/repo")
    _arm_deadline()
    import jax
    import jax.numpy as jnp

    from bigsi_tpu.ops.lookup import TILE_ROWS, batched_counts_jnp, blocked_counts

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    M = 25_000_000 if on_tpu else 512_000  # bloom bits (bitslice rows)
    N = 1024  # samples
    W = N // 32
    B = 256 if on_tpu else 4  # queries per batch
    K = 512 if on_tpu else 32  # k-mers per query
    H = 3
    CHAIN = 9 if on_tpu else 3
    REPEATS = 3
    T = M // TILE_ROWS

    rng = np.random.default_rng(0)

    # matrices are generated on device (host->device relay is ~9 MB/s)
    tiles = jax.jit(
        lambda k: jax.random.bits(k, (T, TILE_ROWS * W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    tidx = jax.device_put(rng.integers(0, T, size=(B, K)).astype(np.int32), dev)
    slots = rng.integers(0, TILE_ROWS, size=(B, K, H)).astype(np.uint32)
    sm = jax.device_put(
        np.bitwise_or.reduce(np.uint32(1) << slots, axis=2), dev
    )
    mask = jax.device_put(np.ones((B, K), dtype=bool), dev)

    # blocked layout: single-dispatch timing only (it is dominated by
    # grouped on every recorded run; skipping its scan-chain saves two
    # relay compiles at ~30 s each)
    @jax.jit
    def blocked_once(tiles, tidx, sm, mask):
        return blocked_counts(tiles, tidx, sm, mask)

    def timed(fn, args):
        out = fn(*args)
        np.asarray(out)[0]  # compile + warm (relay-safe sync)
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out)[0]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def marginal(make):
        f1, a1 = make(1)
        fn, an = make(CHAIN)
        t1 = timed(f1, a1)
        tn = timed(fn, an)
        return max((tn - t1) / (CHAIN - 1), 1e-9)


    # grouped (minimizer) layout: consecutive k-mers share tiles in runs
    # of ~6; each distinct tile is gathered once per run
    from bigsi_tpu.ops.lookup import build_grouped_streams, grouped_counts

    RUN = 6
    nruns = (K + RUN - 1) // RUN
    run_tiles = rng.integers(0, T, size=(B, nruns)).astype(np.int32)
    tidx_runs = np.repeat(run_tiles, RUN, axis=1)[:, :K]
    utile_np, gmask_np = build_grouped_streams(
        tidx_runs, np.asarray(sm, dtype=np.uint32)
    )
    utile = jax.device_put(utile_np, dev)
    gmask = jax.device_put(gmask_np, dev)

    def make_grouped(nsteps):
        @jax.jit
        def f(tiles, utile, gmask):
            def body(carry, _):
                u2 = (utile + carry) % T  # shift tiles, dedup structure kept
                counts = grouped_counts(tiles, u2, gmask)
                return (counts[0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (tiles, utile, gmask)

    dt_grouped = marginal(make_grouped)

    # grouped at tile_rows=16 ("tile-rows: 16" config): half the
    # gathered bytes and half the presence-expansion work per k-mer, at
    # a measured FPR premium (hashing/scheme.py docstring) — the fastest
    # supported product layout
    TR16 = 16
    T16 = M // TR16
    tiles16 = jax.jit(
        lambda key: jax.random.bits(key, (T16, TR16 * W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(2))
    run_tiles16 = rng.integers(0, T16, size=(B, nruns)).astype(np.int32)
    tidx16 = np.repeat(run_tiles16, RUN, axis=1)[:, :K]
    slots16 = rng.integers(0, TR16, size=(B, K, H)).astype(np.uint32)
    sm16 = np.bitwise_or.reduce(np.uint32(1) << slots16, axis=2)
    utile16_np, gmask16_np = build_grouped_streams(tidx16, sm16)
    utile16 = jax.device_put(utile16_np, dev)
    gmask16 = jax.device_put(gmask16_np, dev)

    def make_grouped16(nsteps):
        @jax.jit
        def f(tiles, utile, gmask):
            def body(carry, _):
                u2 = (utile + carry) % T16
                counts = grouped_counts(tiles, u2, gmask, TR16)
                return (counts[0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (tiles16, utile16, gmask16)

    dt_grouped16 = marginal(make_grouped16)

    # classic layout (secondary, reported in the stderr detail line)
    words = jax.jit(
        lambda k: jax.random.bits(k, (M, W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(1))
    ridx = jax.device_put(
        rng.integers(0, M, size=(B, K, H)).astype(np.int32), dev
    )

    def make_classic(nsteps):
        @jax.jit
        def f(words, ridx, mask):
            def body(carry, _):
                i2 = (ridx + carry) % M
                counts = batched_counts_jnp(words, i2, mask)
                return (counts[0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (words, ridx, mask)

    dt_classic = marginal(make_classic)

    dt_blocked_once = timed(blocked_once, (tiles, tidx, sm, mask))

    # full serving pipeline (VERDICT r1 item 7): raw ASCII k-mers in,
    # counts out — canonicalize + murmur3 + gather + AND + csa in ONE
    # program (ops/lookup.py:make_full_query_step), classic layout
    from bigsi_tpu.ops.lookup import make_full_query_step

    klen = 31
    kmers_ascii = rng.integers(0, 4, size=(B, K, klen)).astype(np.uint8)
    kmers_ascii = np.frombuffer(b"ACGT", dtype=np.uint8)[kmers_ascii]
    kmers_d = jax.device_put(kmers_ascii, dev)
    pipe_step = make_full_query_step(M, H)

    def timed_pipe_once():
        out = pipe_step(words, kmers_d, mask)
        np.asarray(out)[0, 0]
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = pipe_step(words, kmers_d, mask)
            np.asarray(out)[0, 0]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt_pipe_once = timed_pipe_once()  # one un-chained dispatch: honest
    # request latency through this environment's relay

    # minimizer serving pipeline: per batch, the host canonicalizes +
    # hashes the raw ASCII k-mers (C fast paths) and builds the grouped
    # streams (C), then ONE device dispatch runs the grouped step.  Host
    # prep of batch i+1 overlaps device batch i in serving, so the
    # steady-state rate is bounded by max(host, device).  Queries are
    # sliding-window k-mers of B random sequences — the real serving
    # shape (row overlap keeps the native rolling-minimizer path hot).
    from bigsi_tpu.hashing.murmur3 import hash_kmer_matrix
    from bigsi_tpu.hashing.scheme import minimizer_tiles
    from bigsi_tpu.kmers import canonicalize_kmer_matrix

    seqs = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=(B, K + klen - 1))
    ]
    kmers_flat = np.concatenate(
        [
            np.lib.stride_tricks.sliding_window_view(q, klen).copy()
            for q in seqs
        ]
    )  # [B*K, klen], overlapping rows within each query

    def serve_host_prep():
        canon = canonicalize_kmer_matrix(kmers_flat)
        # tiles from the PRE-canonical form (strand-invariant; keeps the
        # rolling-window C path hot), slots from the canonical form —
        # exactly signature.kmer_matrix_to_row_idx's dispatch
        tile = minimizer_tiles(kmers_flat, T16).reshape(B, K).astype(np.int32)
        slots = hash_kmer_matrix(canon, H, TR16).astype(np.uint32)
        smask = (
            np.bitwise_or.reduce(np.uint32(1) << slots, axis=1)
            .reshape(B, K)
            .astype(np.uint32)
        )
        return build_grouped_streams(tile, smask)

    serve_host_prep()  # warm native paths
    t0 = time.perf_counter()
    for _ in range(3):
        ut_np, gm_np = serve_host_prep()
    serve_host_ms = (time.perf_counter() - t0) / 3 * 1e3

    # grouped host prep alone (stream building, C fast path)
    t0 = time.perf_counter()
    for _ in range(3):
        build_grouped_streams(tidx_runs, np.asarray(sm, dtype=np.uint32))
    host_prep_ms = (time.perf_counter() - t0) / 3 * 1e3

    rows = B * K * H
    best = min(dt_classic, dt_grouped, dt_grouped16)
    rows_per_s = rows / best
    serve_qps = B / max(serve_host_ms / 1e3, dt_grouped16)
    print(
        json.dumps(
            {
                "metric": "bitslice_row_and_popcount_throughput",
                "value": round(rows_per_s, 1),
                "unit": "rows/s/chip",
                "vs_baseline": round(rows_per_s / 1e9, 3),
            }
        )
    )
    print(
        "detail: %s m=%d N=%d B=%d K=%d h=%d | grouped16 %.3f ms/step "
        "(%.1f Mrows/s) | grouped32 %.3f ms/step (%.1f Mrows/s, "
        "%.0f queries/s) | blocked %.3f ms one-dispatch | "
        "classic %.3f ms/step (%.1f Mrows/s) | "
        "full-pipeline(hash+gather+count, classic) one-dispatch "
        "latency %.1f ms | "
        "serving(minimizer16): host hash+prep %.2f ms/batch, device "
        "%.3f ms/step -> %.0f queries/s pipelined | "
        "grouped host prep %.2f ms/batch"
        % (
            dev.platform, M, N, B, K, H,
            dt_grouped16 * 1e3, rows / dt_grouped16 / 1e6,
            dt_grouped * 1e3, rows / dt_grouped / 1e6, B / dt_grouped,
            dt_blocked_once * 1e3,
            dt_classic * 1e3, rows / dt_classic / 1e6,
            dt_pipe_once * 1e3,
            serve_host_ms, dt_grouped16 * 1e3, serve_qps,
            host_prep_ms,
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
