#!/usr/bin/env python
"""Probe: can a Pallas kernel with manual async DMA beat XLA's ~33M
random-fetch/s gather issue rate?

Kernel: grid over chunks of C tiles; double-buffered scratch
[2, C, 8, 128]; per step issue C async copies for the next chunk while
AND+accumulating the current chunk.  Measures end-to-end tiles/s.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSTEPS = 9
REPEATS = 3


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out.reshape(-1)[0])
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(make, n=NSTEPS):
    t1 = timed(*make(1))
    tn = timed(*make(n))
    return max((tn - t1) / (n - 1), 1e-9)


def make_gather_kernel(T, R, C, n_buf=2):
    """tiles_fat uint32[T*8, 128], tidx int32[R] -> sum uint32[8, 128]."""
    n_chunks = R // C

    def kernel(tidx_ref, tiles_hbm, out_ref, scratch, sems):
        step = pl.program_id(0)

        def issue(buf, chunk):
            @pl.when(chunk < n_chunks)
            def _():
                def body(c, _):
                    t = tidx_ref[chunk * C + c]
                    pltpu.make_async_copy(
                        tiles_hbm.at[pl.ds(t * 8, 8), :],
                        scratch.at[buf, c],
                        sems.at[buf, c],
                    ).start()
                    return 0

                jax.lax.fori_loop(0, C, body, 0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            issue(0, 0)

        # prefetch next chunk
        issue((step + 1) % n_buf, step + 1)

        # wait + consume current chunk
        buf = step % n_buf

        def wait_body(c, acc):
            pltpu.make_async_copy(
                tiles_hbm.at[pl.ds(0, 8), :], scratch.at[buf, c], sems.at[buf, c]
            ).wait()
            return acc ^ scratch[buf, c]

        acc = jax.lax.fori_loop(
            0, C, wait_body, jnp.zeros((8, 128), jnp.uint32)
        )
        out_ref[:] ^= acc

    def run(tiles_fat, tidx):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((n_buf, C, 8, 128), jnp.uint32),
                    pltpu.SemaphoreType.DMA((n_buf, C)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        )(tidx, tiles_fat)

    return run


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    print("device:", dev)
    M = 25_000_000 if on_tpu else 512_000
    T = M // 32
    R = 131072 if on_tpu else 1024

    tiles_fat = jax.jit(
        lambda k: jax.random.bits(k, (T * 8, 128), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tidx = jax.device_put(rng.integers(0, T, size=R).astype(np.int32), dev)

    for C in (256,):
        for n_buf in (2,):
            gk = make_gather_kernel(T, R, C, n_buf)

            def make(nsteps, gk=gk):
                @jax.jit
                def f(tiles_fat, tidx):
                    def body(i, acc):
                        ii = (tidx + i) % T
                        return acc + gk(tiles_fat, ii).sum(dtype=jnp.uint32)

                    return jax.lax.fori_loop(0, nsteps, body, jnp.uint32(0)).reshape(1)

                return f, tiles_fat, tidx

            try:
                dt = marginal(make, 5)
                print(
                    "pallas dma C=%3d buf=%d: %8.3f ms -> %7.2f Mtiles/s (%6.1f GB/s)"
                    % (C, n_buf, dt * 1e3, R / dt / 1e6, R * 4096 / dt / 1e9)
                )
            except Exception as e:
                print("pallas C=%d buf=%d failed: %s %s" % (
                    C, n_buf, type(e).__name__, str(e)[:250]))


if __name__ == "__main__":
    main()
