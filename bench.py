#!/usr/bin/env python
"""Headline benchmark: bitslice-row AND+popcount throughput per chip.

Runs the batched inexact-search data plane at BASELINE.json's 1k-sample
config (m=2.5e7 bloom bits, 1024 samples): per k-mer, fetch its hash
rows, AND them, and accumulate per-sample hit counts.

Three engine layouts are timed; the headline is the best:

* classic — h independent row fetches per k-mer (reference-parity
  layout), fat-row packed for lane efficiency;
* blocked — the TPU-native blocked-Bloom layout: the k-mer's h rows
  live in one 32-row tile, fetched with a single fat DMA and reduced
  with a selection-masked AND (see bigsi_tpu/ops/lookup.py);
* grouped — the minimizer layout's tile-dedup path: consecutive query
  k-mers share tiles in runs (~6), each distinct tile gathered ONCE,
  per-kmer presence expanded by dense masked ANDs, counts via the
  carry-save popcount tree (csa_counts).

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

    deadline = float(os.environ.get("BENCH_DEADLINE_S", "480"))
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

    def make_blocked(nsteps):
        @jax.jit
        def f(tiles, tidx, sm, mask):
            def body(carry, _):
                t2 = (tidx + carry) % T
                counts = blocked_counts(tiles, t2, sm, mask)
                return (counts[0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (tiles, tidx, sm, mask)

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

    dt_blocked = marginal(make_blocked)

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

    # full serving pipeline (VERDICT r1 item 7): raw ASCII k-mers in,
    # counts out — canonicalize + murmur3 + gather + AND + csa in ONE
    # program (ops/lookup.py:make_full_query_step), classic layout
    from bigsi_tpu.ops.lookup import make_full_query_step

    klen = 31
    kmers_ascii = rng.integers(0, 4, size=(B, K, klen)).astype(np.uint8)
    kmers_ascii = np.frombuffer(b"ACGT", dtype=np.uint8)[kmers_ascii]
    kmers_d = jax.device_put(kmers_ascii, dev)
    pipe_step = make_full_query_step(M, H)

    def make_pipe(nsteps):
        from bigsi_tpu.ops.hash_jax import canonicalize_jax, row_indices_jax
        from bigsi_tpu.ops.lookup import batched_counts_jnp

        @jax.jit
        def f(words, kmers, mask):
            def body(carry, _):
                k2 = jnp.roll(kmers, carry, axis=1)  # data-dependent chain
                b, k, klen = k2.shape
                canon = canonicalize_jax(k2.reshape(b * k, klen))
                idx = row_indices_jax(canon, H, M).reshape(b, k, H)
                counts = batched_counts_jnp(words, idx, mask)
                return (counts[0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (words, kmers_d, mask)

    dt_pipe = marginal(make_pipe)  # marginal per-step (serving stream)

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

    # grouped host prep on the serving critical path (numpy, per batch)
    t0 = time.perf_counter()
    for _ in range(3):
        build_grouped_streams(tidx_runs, np.asarray(sm, dtype=np.uint32))
    host_prep_ms = (time.perf_counter() - t0) / 3 * 1e3

    rows = B * K * H
    best = min(dt_blocked, dt_classic, dt_grouped)
    rows_per_s = rows / best
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
        "detail: %s m=%d N=%d B=%d K=%d h=%d | grouped %.3f ms/step "
        "(%.1f Mrows/s, %.0f queries/s) | blocked %.3f ms/step "
        "(%.1f Mrows/s) | classic %.3f ms/step (%.1f Mrows/s) | "
        "full-pipeline(hash+gather+count, classic) %.3f ms/step "
        "(%.0f queries/s; one-dispatch latency %.1f ms) | "
        "grouped host prep %.2f ms/batch"
        % (
            dev.platform, M, N, B, K, H,
            dt_grouped * 1e3, rows / dt_grouped / 1e6, B / dt_grouped,
            dt_blocked * 1e3, rows / dt_blocked / 1e6,
            dt_classic * 1e3, rows / dt_classic / 1e6,
            dt_pipe * 1e3, B / dt_pipe, dt_pipe_once * 1e3, host_prep_ms,
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
