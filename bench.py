#!/usr/bin/env python
"""Headline benchmark: bitslice-row AND+popcount throughput per chip.

Runs the batched inexact-search data plane (row gather + AND over h +
per-sample hit-count accumulate) over an HBM-resident packed matrix at
BASELINE.json's 1k-sample config (m=2.5e7 bits, 1024 samples).

Methodology notes (this environment):
* the device is reached through a relay with ~25 ms fixed overhead per
  synchronized dispatch and ~9 MB/s host->device bandwidth, so the
  matrix is generated ON device and steps are dependency-chained with
  one device->host sync at the end (block_until_ready alone does not
  reliably wait on this backend);
* throughput is the marginal per-step rate over the chain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 1e9 rows/s (the BASELINE.md target).
"""

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from bigsi_tpu.ops.lookup import best_query_step

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    M = 25_000_000 if on_tpu else 500_000  # bitslice rows (bloom bits)
    N = 1024  # samples
    B = 256 if on_tpu else 4  # queries per batch
    K = 512 if on_tpu else 32  # k-mers per query
    H = 3
    CHAIN = 16 if on_tpu else 2

    rng = np.random.default_rng(0)
    words = jax.jit(
        lambda k: jax.random.bits(k, (M, N // 32), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    idx = jax.device_put(rng.integers(0, M, size=(B, K, H)).astype(np.int32), dev)
    mask = jax.device_put(np.ones((B, K), dtype=bool), dev)

    step = best_query_step(M, B, K, H)

    def sync(x):
        return np.asarray(x[tuple(0 for _ in x.shape)])

    salt = jnp.int32(0)
    counts, salt = step(words, idx, mask, salt)
    sync(counts)  # compile + warm

    def timed(chain):
        s = jnp.int32(1)
        c = counts
        t0 = time.perf_counter()
        for _ in range(chain):
            c, s = step(words, idx, mask, s)
        sync(c)
        return time.perf_counter() - t0

    t1 = timed(1)
    tn = timed(CHAIN)
    # marginal per-step time strips the fixed dispatch/relay overhead
    dt = max((tn - t1) / (CHAIN - 1), 1e-9) if CHAIN > 1 else t1

    rows_per_s = B * K * H / dt
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
        "detail: %s m=%d N=%d B=%d K=%d h=%d: %.3f ms/step marginal, %.1f queries/s"
        % (dev.platform, M, N, B, K, H, dt * 1e3, B / dt),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
