"""Multi-DMA random-row gather probe (ROADMAP item 5 / VERDICT r4
next-4): can a Pallas kernel that keeps MANY async copies in flight
beat the XLA gather's fetch issue rate (measured 7-54 M fetches/s
depending on shape/session — docs/DESIGN.md "Measured facts")?

Kernel shape: grid over row-chunks; each grid step reads CHUNK row ids
from a scalar-prefetch ref, STARTS CHUNK HBM->VMEM-scratch copies,
waits them all, then stores scratch to the pipelined output block —
issue-and-wait WITHIN one grid step (the cross-step prefetch revision
hung the chip in round 2, docs/DESIGN.md wedge rules), and manual DMAs
target SCRATCH, never the pipelined out block.

Wedge safety: ONE variant per process under timeout; interpret mode
first (--interpret); on hardware only after a bench capture; probe the
chip with a trivial op after any failure.  Sync rule: through the axon
relay ``block_until_ready`` acknowledges dispatch, not completion, and
full readbacks cost seconds — every timing consumes the result into
one scalar on device and fetches that.

Usage:
  python scripts/probe_multidma.py --interpret        # CPU correctness
  timeout 500 python scripts/probe_multidma.py --chunk 16
  timeout 500 python scripts/probe_multidma.py --xla-baseline
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(chunk: int, row_words: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        base = i * chunk
        copies = []
        for j in range(chunk):
            dma = pltpu.make_async_copy(
                hbm_ref.at[idx_ref[base + j]],
                scratch.at[j],
                sems.at[j],
            )
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()
        out_ref[:] = scratch[:]

    @functools.partial(jax.jit, static_argnames=("n",))
    def gather(idx, mat, n):
        grid = (n // chunk,)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM
                ],
                out_specs=pl.BlockSpec(
                    (chunk, row_words), lambda i, idx: (i, 0)
                ),
                scratch_shapes=[
                    pltpu.VMEM((chunk, row_words), jnp.uint32),
                    pltpu.SemaphoreType.DMA((chunk,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((n, row_words), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(idx, mat)

    return gather


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--row-words", type=int, default=128)  # 512 B rows
    ap.add_argument("--m", type=int, default=6_250_000)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--xla-baseline", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        args.m = 10_000
        args.rows = 256
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("BIGSI_TPU_JAX_CACHE", "/root/repo/.jax_cache"),
    )
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    n = (args.rows // args.chunk) * args.chunk
    mat_h = rng.integers(
        0, 1 << 32, size=(args.m, args.row_words), dtype=np.uint32
    )
    mat = jax.device_put(mat_h, dev)
    idx_h = rng.integers(0, args.m, size=n, dtype=np.int32)
    idx = jax.device_put(idx_h, dev)
    want_xor = np.bitwise_xor.reduce(
        mat_h[idx_h].reshape(-1).astype(np.uint32)
    )

    def xor_all(o):
        return jax.lax.reduce(
            o, jnp.uint32(0), jax.lax.bitwise_xor, (0, 1)
        )

    if args.xla_baseline:
        f = jax.jit(lambda i, m: xor_all(jnp.take(m, i, axis=0)))
        got = np.asarray(f(idx, mat))
        assert got == want_xor, "xla gather xor mismatch"
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(idx, mat))
            best = min(best, time.perf_counter() - t0)
        print(
            "xla take: %.3f ms -> %.1f M fetches/s"
            % (best * 1e3, n / best / 1e6)
        )
        return

    gather = build(args.chunk, args.row_words, args.interpret)
    if args.interpret:
        out = np.asarray(gather(idx, mat, n=n))
        want = mat_h[idx_h]
        assert np.array_equal(out, want), "interpret mismatch"
        print("bit-exact on %s" % dev.platform)
        return
    sync = jax.jit(xor_all)
    got = np.asarray(sync(gather(idx, mat, n=n)))
    print(
        "chip correctness: %s"
        % ("bit-exact (xor matches)" if got == want_xor else "MISMATCH")
    )
    if got != want_xor:
        sys.exit(1)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(sync(gather(idx, mat, n=n)))
        best = min(best, time.perf_counter() - t0)
    print(
        "multidma chunk=%d: %.3f ms -> %.1f M fetches/s (%.1f GB/s)"
        % (
            args.chunk,
            best * 1e3,
            n / best / 1e6,
            n * args.row_words * 4 / best / 1e9,
        )
    )


if __name__ == "__main__":
    main()
