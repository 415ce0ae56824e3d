#!/usr/bin/env python
"""Micro-benchmarks for the query data-plane pieces on the real chip.

Times each stage separately with dependency-chained steps (same
methodology as bench.py) so the fixed relay dispatch overhead is
stripped: gather-only, AND-only, counts-only, full step.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp


def chain_time(step, args, salt0, chain=8):
    salt = jnp.int32(0)
    out, salt = step(*args, salt0)
    np.asarray(out[tuple(0 for _ in out.shape)])

    def run(n):
        s = jnp.int32(1)
        o = out
        t0 = time.perf_counter()
        for _ in range(n):
            o, s = step(*args, s)
        np.asarray(o[tuple(0 for _ in o.shape)])
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(chain)
    return max((tn - t1) / (chain - 1), 1e-9)


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    M = 25_000_000 if on_tpu else 500_000
    N = 1024
    B, K, H = 64, 512, 3
    W = N // 32
    R = B * K * H

    rng = np.random.default_rng(0)
    words = jax.jit(lambda k: jax.random.bits(k, (M, W), jnp.uint32), device=dev)(
        jax.random.PRNGKey(0)
    )
    idx = jax.device_put(rng.integers(0, M, size=(B, K, H)).astype(np.int32), dev)
    mask = jax.device_put(np.ones((B, K), dtype=bool), dev)
    rows = jax.jit(lambda k: jax.random.bits(k, (B, K, W), jnp.uint32), device=dev)(
        jax.random.PRNGKey(1)
    )

    shifts = jnp.arange(32, dtype=jnp.uint32)

    @jax.jit
    def gather_only(words, idx, salt):
        i = (idx.reshape(-1) + salt) % M
        g = jnp.take(words, i, axis=0)
        out = g.sum(dtype=jnp.uint32).reshape(1)
        return out, (out[0] & jnp.uint32(7)).astype(jnp.int32)

    @jax.jit
    def gather_and(words, idx, salt):
        i = (idx + salt) % M
        g = jnp.take(words, i.reshape(-1), axis=0).reshape(B, K, H, W)
        p = g[:, :, 0] & g[:, :, 1] & g[:, :, 2]
        out = p.sum(dtype=jnp.uint32).reshape(1)
        return out, (out[0] & jnp.uint32(7)).astype(jnp.int32)

    @jax.jit
    def counts_only(rows, mask, salt):
        p = rows + salt.astype(jnp.uint32)
        bits = (p[..., None] >> shifts) & jnp.uint32(1)
        bits = bits.astype(jnp.int32) * mask[:, :, None, None]
        c = bits.sum(axis=1).reshape(B, -1)
        return c, (c[0, 0] & jnp.int32(7))

    @jax.jit
    def counts_matmul(rows, mask, salt):
        p = rows + salt.astype(jnp.uint32)
        bits = ((p[..., None] >> shifts) & jnp.uint32(1)).astype(jnp.bfloat16)
        bits = bits.reshape(B, K, W * 32)
        ones = mask[:, None, :].astype(jnp.bfloat16)
        c = jnp.einsum("bik,bkn->bin", ones, bits,
                       preferred_element_type=jnp.float32)
        c = c.reshape(B, -1).astype(jnp.int32)
        return c, (c[0, 0] & jnp.int32(7))

    @jax.jit
    def popcount_only(rows, salt):
        p = rows ^ salt.astype(jnp.uint32)
        pc = jax.lax.population_count(p).sum(dtype=jnp.uint32).reshape(1)
        return pc, (pc[0] & jnp.uint32(7)).astype(jnp.int32)

    t = chain_time(gather_only, (words, idx), jnp.int32(0))
    print("gather_only      : %8.2f ms  (%.1f Mrows/s, %.2f GB/s)" % (
        t * 1e3, R / t / 1e6, R * W * 4 / t / 1e9))
    t = chain_time(gather_and, (words, idx), jnp.int32(0))
    print("gather+AND       : %8.2f ms  (%.1f Mrows/s)" % (t * 1e3, R / t / 1e6))
    t = chain_time(counts_only, (rows, mask), jnp.int32(0))
    print("counts(unpack)   : %8.2f ms  (%.1f Mrows/s over B*K)" % (
        t * 1e3, B * K / t / 1e6))
    t = chain_time(counts_matmul, (rows, mask), jnp.int32(0))
    print("counts(matmul)   : %8.2f ms" % (t * 1e3,))
    t = chain_time(popcount_only, (rows,), jnp.int32(0))
    print("popcount_only    : %8.2f ms" % (t * 1e3,))


if __name__ == "__main__":
    main()
