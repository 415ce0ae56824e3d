#!/usr/bin/env python
"""Separate relay dispatch overhead from true on-chip throughput."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp


def chain_time(step, args, chain=16):
    salt = jnp.int32(0)
    out, salt = step(*args, salt)
    np.asarray(out.reshape(-1)[0])

    def run(n):
        s = jnp.int32(1)
        o = out
        t0 = time.perf_counter()
        for _ in range(n):
            o, s = step(*args, s)
        np.asarray(o.reshape(-1)[0])
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(chain)
    return max((tn - t1) / (chain - 1), 1e-9), t1


def main():
    dev = jax.devices()[0]
    print("device:", dev, dev.platform)

    # 1. trivial op: pure dispatch overhead
    x = jax.device_put(np.zeros((8, 128), np.float32), dev)

    @jax.jit
    def triv(x, salt):
        y = x + salt.astype(jnp.float32)
        return y, (y[0, 0].astype(jnp.int32) & 7)

    dt, t1 = chain_time(triv, (x,))
    print("trivial add      : marginal %7.3f ms   first-sync %7.1f ms" % (dt * 1e3, t1 * 1e3))

    # 2. big matmul: MXU throughput
    n = 4096
    a = jax.jit(lambda k: jax.random.normal(k, (n, n), jnp.bfloat16), device=dev)(
        jax.random.PRNGKey(0)
    )

    @jax.jit
    def mm(a, salt):
        y = jnp.dot(a + salt.astype(jnp.bfloat16), a,
                    preferred_element_type=jnp.bfloat16)
        return y, (y[0, 0].astype(jnp.int32) & 7)

    dt, t1 = chain_time(mm, (a,))
    print("matmul 4096^3    : marginal %7.3f ms  -> %6.1f TFLOP/s" % (
        dt * 1e3, 2 * n ** 3 / dt / 1e12))

    # 3. big elementwise: VPU/HBM streaming
    m = 64 * 1024 * 1024 // 4  # 64 MB of f32
    v = jax.jit(lambda k: jax.random.normal(k, (m,), jnp.float32), device=dev)(
        jax.random.PRNGKey(1)
    )

    @jax.jit
    def ew(v, salt):
        y = v * 1.0001 + salt.astype(jnp.float32)
        return y, (y[0].astype(jnp.int32) & 7)

    dt, t1 = chain_time(ew, (v,))
    print("elementwise 64MB : marginal %7.3f ms  -> %6.1f GB/s r+w" % (
        dt * 1e3, 2 * m * 4 / dt / 1e9))

    # 4. popcount+sum 64 MB of uint32
    u = jax.jit(lambda k: jax.random.bits(k, (m,), jnp.uint32), device=dev)(
        jax.random.PRNGKey(2)
    )

    @jax.jit
    def pc(u, salt):
        y = jax.lax.population_count(u ^ salt.astype(jnp.uint32))
        s = y.sum(dtype=jnp.uint32).reshape(1)
        return s, (s[0] & jnp.uint32(7)).astype(jnp.int32)

    dt, t1 = chain_time(pc, (u,))
    print("popcnt+sum 64MB  : marginal %7.3f ms  -> %6.1f GB/s read" % (
        dt * 1e3, m * 4 / dt / 1e9))

    # 5. gather of contiguous blocks (sorted idx) vs random
    M, W = 1_000_000, 128
    words = jax.jit(lambda k: jax.random.bits(k, (M, W), jnp.uint32), device=dev)(
        jax.random.PRNGKey(3)
    )
    R = 32768
    rng = np.random.default_rng(0)
    ridx = jax.device_put(rng.integers(0, M, R).astype(np.int32), dev)
    sidx = jax.device_put(np.sort(rng.integers(0, M, R)).astype(np.int32), dev)

    @jax.jit
    def gat(words, i, salt):
        g = jnp.take(words, (i + salt) % M, axis=0)
        s = g.sum(dtype=jnp.uint32).reshape(1)
        return s, (s[0] & jnp.uint32(7)).astype(jnp.int32)

    dt, t1 = chain_time(gat, (words, ridx), chain=4)
    print("gather 32k random: marginal %7.3f ms  -> %6.2f Mrows/s %6.1f GB/s" % (
        dt * 1e3, R / dt / 1e6, R * W * 4 / dt / 1e9))
    dt, t1 = chain_time(gat, (words, sidx), chain=4)
    print("gather 32k sorted: marginal %7.3f ms  -> %6.2f Mrows/s %6.1f GB/s" % (
        dt * 1e3, R / dt / 1e6, R * W * 4 / dt / 1e9))

    # 6. dynamic_slice loop gather via one fori_loop in kernel
    @jax.jit
    def gat_loop(words, i, salt):
        ii = (i + salt) % M

        def body(j, acc):
            row = jax.lax.dynamic_slice(words, (ii[j], 0), (1, W))
            return acc + row.sum(dtype=jnp.uint32)

        s = jax.lax.fori_loop(0, R, body, jnp.uint32(0)).reshape(1)
        return s, (s[0] & jnp.uint32(7)).astype(jnp.int32)

    dt, t1 = chain_time(gat_loop, (words, ridx), chain=2)
    print("dynslice loop 32k: marginal %7.3f ms  -> %6.2f Mrows/s" % (
        dt * 1e3, R / dt / 1e6))


if __name__ == "__main__":
    main()
