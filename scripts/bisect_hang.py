#!/usr/bin/env python
"""Bisect the on-chip hang of the fused query kernel.

Runs ONE (b, k) case of fused_query on the real chip with synthetic
streams; prints timings.  Drive each case under `timeout` from the
shell:  python scripts/bisect_hang.py B K [T]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.pallas_lookup import CHUNK, build_chunk_streams, fused_query

b = int(sys.argv[1])
k = int(sys.argv[2])
T = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

dev = jax.devices()[0]
print("device:", dev, flush=True)
tiles_fat = jax.jit(
    lambda key: jax.random.bits(key, (T * 8, 128), jnp.uint32), device=dev
)(jax.random.PRNGKey(0))
np.asarray(tiles_fat[0, 0])
print("matrix staged", flush=True)

rng = np.random.default_rng(0)
tile = rng.integers(0, T, size=(b, k)).astype(np.int32)
smask = rng.integers(1, 2 ** 32, size=(b, k), dtype=np.uint64).astype(np.uint32)
smask |= 1  # never zero
n_unique, utile, uslot, slotidx = build_chunk_streams(tile, smask)

t0 = time.perf_counter()
counts, exact = fused_query(
    tiles_fat,
    jnp.asarray(n_unique), jnp.asarray(utile), jnp.asarray(uslot),
    jnp.asarray(smask.reshape(-1)), jnp.asarray(slotidx),
    b=b, k=k,
)
c0 = np.asarray(counts)
print("first run (compile): %.1f s" % (time.perf_counter() - t0), flush=True)
t0 = time.perf_counter()
counts, exact = fused_query(
    tiles_fat,
    jnp.asarray(n_unique), jnp.asarray(utile), jnp.asarray(uslot),
    jnp.asarray(smask.reshape(-1)), jnp.asarray(slotidx),
    b=b, k=k,
)
np.asarray(counts)
print("second run: %.3f s" % (time.perf_counter() - t0), flush=True)
print("counts sum:", int(c0.sum()), "OK", flush=True)
