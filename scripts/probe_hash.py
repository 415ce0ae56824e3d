#!/usr/bin/env python
"""Probe: split the full-pipeline hash cost (canonicalize vs murmur3)
and test a lane-transposed [k, K] layout for both.

The serving pipeline is hash-bound (docs/ROADMAP.md item 1): ~35 ms per
[256, 512] batch of 31-mers vs 1.4 ms of counting.  Hypothesis: the
[K, 31] uint8 layout wastes lanes (31 of 128) and turns every byte
column into a [K, 1] op; transposing to [31, K] makes every op a full
[K]-lane vector.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.hash_jax import canonicalize_jax, murmur3_32_jax, row_indices_jax

CHAIN, REPEATS = 9, 3
B, K, KLEN, H = 256, 512, 31, 3
M = 25_000_000


def timed(fn, args):
    out = fn(*args)
    np.asarray(out)[0]
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(mk):
    t1 = timed(*mk(1))
    tn = timed(*mk(CHAIN))
    return max((tn - t1) / (CHAIN - 1), 1e-9)


def scan_chain(body_fn, args):
    def mk(nsteps):
        @jax.jit
        def f(*a):
            def body(carry, _):
                return body_fn(carry, *a), ()
            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)
        return f, args
    return mk


# ---- transposed implementations ----

def canonicalize_T(kmers):
    """uint8[k, K] -> uint8[k, K], canonical along axis 0."""
    def complement(b):
        out = b
        for src, dst in zip(b"ACGT", b"TGCA"):
            out = jnp.where(b == jnp.uint8(src), jnp.uint8(dst), out)
        return out

    rc = complement(kmers[::-1, :])
    k = kmers.shape[0]
    lt = jnp.zeros(kmers.shape[1:], dtype=bool)
    eq = jnp.ones(kmers.shape[1:], dtype=bool)
    for j in range(k):
        lt = lt | (eq & (rc[j] < kmers[j]))
        eq = eq & (rc[j] == kmers[j])
    return jnp.where(lt[None, :], rc, kmers)


def murmur3_T(data, seeds):
    """uint8[k, K] x uint32[h] -> int32[h, K]."""
    k, K_ = data.shape
    nblocks, ntail = k // 4, k % 4
    d32 = data.astype(jnp.uint32)
    C1, C2 = jnp.uint32(0xCC9E2D51), jnp.uint32(0x1B873593)

    def rotl(x, r):
        return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))

    h = jnp.broadcast_to(seeds.astype(jnp.uint32)[:, None], (seeds.shape[0], K_))
    for i in range(nblocks):
        kw = (
            d32[4 * i]
            | (d32[4 * i + 1] << jnp.uint32(8))
            | (d32[4 * i + 2] << jnp.uint32(16))
            | (d32[4 * i + 3] << jnp.uint32(24))
        )[None, :]
        kw = rotl(kw * C1, 15) * C2
        h = h ^ kw
        h = rotl(h, 13)
        h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    if ntail:
        kw = jnp.zeros((K_,), dtype=jnp.uint32)
        for j in range(ntail):
            kw = kw | (d32[nblocks * 4 + j] << jnp.uint32(8 * j))
        kw = rotl(kw[None, :] * C1, 15) * C2
        h = h ^ kw
    h = h ^ jnp.uint32(k)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h.astype(jnp.int32)


def row_indices_T(kmers, h, m):
    seeds = jnp.arange(h, dtype=jnp.uint32)
    hashes = murmur3_T(kmers, seeds)
    r = hashes % jnp.int32(m)
    return jnp.where(r < 0, r + jnp.int32(m), r)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    rng = np.random.default_rng(0)
    km = rng.integers(0, 4, size=(B * K, KLEN)).astype(np.uint8)
    km = np.frombuffer(b"ACGT", dtype=np.uint8)[km]
    km_d = jax.device_put(km, dev)
    km_T = jax.device_put(np.ascontiguousarray(km.T), dev)

    # correctness of transposed variants vs current
    canon_ref = np.asarray(jax.jit(canonicalize_jax)(km_d[:1024]))
    canon_T = np.asarray(jax.jit(canonicalize_T)(km_T[:, :1024])).T
    assert (canon_ref == canon_T).all(), "canonicalize_T mismatch"
    idx_ref = np.asarray(jax.jit(lambda x: row_indices_jax(x, H, M))(km_d[:1024]))
    idx_T = np.asarray(jax.jit(lambda x: row_indices_T(x, H, M))(km_T[:, :1024])).T
    assert (idx_ref == idx_T).all(), "row_indices_T mismatch"
    print("parity ok", flush=True)

    # perturb a byte via carry so scan can't collapse; cost negligible
    def canon_cur(c, x):
        y = canonicalize_jax(x ^ (c % 2).astype(jnp.uint8))
        return c + y[0, 0].astype(jnp.int32)

    def canon_t(c, x):
        y = canonicalize_T(x ^ (c % 2).astype(jnp.uint8))
        return c + y[0, 0].astype(jnp.int32)

    def hash_cur(c, x):
        y = row_indices_jax(x ^ (c % 2).astype(jnp.uint8), H, M)
        return c + y[0, 0]

    def hash_t(c, x):
        y = row_indices_T(x ^ (c % 2).astype(jnp.uint8), H, M)
        return c + y[0, 0]

    def both_cur(c, x):
        y = row_indices_jax(canonicalize_jax(x ^ (c % 2).astype(jnp.uint8)), H, M)
        return c + y[0, 0]

    def both_t(c, x):
        y = row_indices_T(canonicalize_T(x ^ (c % 2).astype(jnp.uint8)), H, M)
        return c + y[0, 0]

    def transpose_then_t(c, x):
        # x is [BK, klen] (host natural layout); transpose on device
        y = row_indices_T(canonicalize_T((x ^ (c % 2).astype(jnp.uint8)).T), H, M)
        return c + y[0, 0]

    for name, fn, arg in [
        ("canon_current  [BK,k]", canon_cur, km_d),
        ("canon_transpose[k,BK]", canon_t, km_T),
        ("hash_current   [BK,k]", hash_cur, km_d),
        ("hash_transpose [k,BK]", hash_t, km_T),
        ("canon+hash cur       ", both_cur, km_d),
        ("canon+hash T         ", both_t, km_T),
        ("dev-transpose + T    ", transpose_then_t, km_d),
    ]:
        dt = marginal(scan_chain(fn, (arg,)))
        print(f"{name}: {dt*1e3:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
