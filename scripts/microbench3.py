#!/usr/bin/env python
"""In-program timing: fori_loop over steps inside ONE jit program.

Compares an n-step and a 1-step program (3 repeats, min) so the
~26 ms/program relay overhead and noise are stripped:
marginal = (t_n - t_1) / (n - 1).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

NSTEPS = 33
REPEATS = 3


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out.reshape(-1)[0])  # compile+warm, relay-safe sync
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(make, n=NSTEPS):
    f1 = make(1)
    fn = make(n)
    t1 = timed(*f1)
    tn = timed(*fn)
    return max((tn - t1) / (n - 1), 1e-9)


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    print("device:", dev)
    M = 25_000_000 if on_tpu else 500_000
    N = 1024
    W = N // 32
    B, K, H = 64, 512, 3
    R = B * K * H

    words = jax.jit(lambda k: jax.random.bits(k, (M, W), jnp.uint32), device=dev)(
        jax.random.PRNGKey(0)
    )
    # pre-shaped tile view for the blocked-layout experiment
    words_t = jax.jit(
        lambda k: jax.random.bits(k, (M // 32, 32 * W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    idx0 = jax.device_put(rng.integers(0, M, size=R).astype(np.int32), dev)
    tidx0 = jax.device_put(rng.integers(0, M // 32, size=R // H).astype(np.int32), dev)

    m64 = 16 * 1024 * 1024
    v = jax.jit(lambda k: jax.random.bits(k, (m64,), jnp.uint32), device=dev)(
        jax.random.PRNGKey(1)
    )

    def make_stream(nsteps):
        @jax.jit
        def f(v):
            def body(i, acc):
                return acc + (v ^ i.astype(jnp.uint32)).sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, nsteps, body, jnp.uint32(0)).reshape(1)

        return f, v

    dt = marginal(make_stream)
    print("stream 64MB xor+sum: %7.3f ms -> %6.1f GB/s" % (dt * 1e3, m64 * 4 / dt / 1e9))

    def make_take(nsteps):
        @jax.jit
        def f(words, idx):
            def body(i, acc):
                ii = (idx + i) % M
                g = jnp.take(words, ii, axis=0)
                return acc + g.sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, nsteps, body, jnp.uint32(0)).reshape(1)

        return f, words, idx0

    dt = marginal(make_take)
    print("take   %6d random rows: %8.3f ms -> %7.2f Mrows/s (%5.1f GB/s)" % (
        R, dt * 1e3, R / dt / 1e6, R * W * 4 / dt / 1e9))

    def make_sorted(nsteps):
        @jax.jit
        def f(words, idx):
            def body(i, acc):
                ii = jnp.sort((idx + i) % M)
                g = jnp.take(words, ii, axis=0, indices_are_sorted=True)
                return acc + g.sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, nsteps, body, jnp.uint32(0)).reshape(1)

        return f, words, idx0

    dt = marginal(make_sorted)
    print("sort+take %6d rows    : %8.3f ms -> %7.2f Mrows/s" % (R, dt * 1e3, R / dt / 1e6))

    def make_tiles(nsteps):
        @jax.jit
        def f(wt, tidx):
            def body(i, acc):
                ii = (tidx + i) % (M // 32)
                g = jnp.take(wt, ii, axis=0)
                return acc + g.sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, nsteps, body, jnp.uint32(0)).reshape(1)

        return f, words_t, tidx0

    dt = marginal(make_tiles)
    print("take   %6d tiles(32row): %8.3f ms -> %7.2f Mtiles/s (%5.1f GB/s)" % (
        R // H, dt * 1e3, R / H / dt / 1e6, (R // H) * 32 * W * 4 / dt / 1e9))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pk(idx_ref, rows_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += rows_ref[:].sum(axis=0, keepdims=True)

    def pallas_gather_sum(words, idx):
        return pl.pallas_call(
            pk,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(idx.shape[0],),
                in_specs=[
                    pl.BlockSpec((1, W), lambda i, idx_ref: (idx_ref[i], 0)),
                ],
                out_specs=pl.BlockSpec((1, W), lambda i, idx_ref: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((1, W), jnp.uint32),
        )(idx, words)

    def make_pallas(nsteps):
        @jax.jit
        def f(words, idx):
            def body(i, acc):
                ii = (idx + i) % M
                return acc + pallas_gather_sum(words, ii).sum()

            return jax.lax.fori_loop(0, nsteps, body, jnp.uint32(0)).reshape(1)

        return f, words, idx0

    try:
        dt = marginal(make_pallas, 9)
        print("pallas gather %6d rows: %8.3f ms -> %7.2f Mrows/s" % (
            R, dt * 1e3, R / dt / 1e6))
    except Exception as e:
        print("pallas gather failed:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
