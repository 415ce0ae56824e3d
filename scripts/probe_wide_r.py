"""Wide-N run-bucket probe (VERDICT r4 weak-7): at large sample counts
the cols kernel is COMPARE-bound (B*U*r*N slot compares dwarf the U
gathers — wide-N 4096 measured 591 G u16-ops/s, near the VPU wall),
so the U*r-vs-K padding waste (~2.5x at w=19 r=20) is the lever.  A
smaller run bucket r splits long runs into more entries: more (cheap,
at wide N) gathers, fewer padded compare slots.

Measures cols16-w19 at N in {1024, 4096} for r in {8, 12, 20} on real
sliding-window streams.  Run ALONE.  Results feed default_run_len's
(window, N) rule.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("BIGSI_TPU_JAX_CACHE", "/root/repo/.jax_cache"),
    )
    import jax.numpy as jnp

    from bigsi_tpu import native
    from bigsi_tpu.hashing.scheme import MINIMIZER_SEED
    from bigsi_tpu.ops.lookup import grouped_counts_cols

    assert native.available(), "needs the native prep"
    dev = jax.devices()[0]
    M, B, K, H, KLEN, TR = 25_000_000, 256, 512, 3, 31, 16
    T16 = M // TR
    W19 = 19
    CHAIN, REPEATS = 7, 5
    rng = np.random.default_rng(0)
    seqs = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=(B, K + KLEN - 1))
    ]
    kmers_flat = np.ascontiguousarray(
        np.concatenate(
            [np.lib.stride_tricks.sliding_window_view(q, KLEN) for q in seqs]
        )
    )
    qstart = np.arange(B + 1, dtype=np.int64) * K

    results = {}
    for n in (1024, 4096):
        cols = jax.jit(
            lambda k, n=n: jax.random.bits(k, (T16, n), jnp.uint16)
        )(jax.random.PRNGKey(3))
        cols.block_until_ready()
        for r in (8, 12, 20):
            ut, gm, nv = native.prep_minimizer_v3(
                kmers_flat, qstart, KLEN - W19 + 1, MINIMIZER_SEED,
                T16, H, TR, r,
            )
            u = ut.shape[1]
            ut_d = jax.device_put(ut, dev)
            gm_d = jax.device_put(gm, dev)
            nv_d = jax.device_put(nv, dev)

            def make(nsteps):
                @jax.jit
                def f(cols, utile, gmask, n_valid):
                    def body(carry, _):
                        u2 = (utile + carry) % T16
                        counts = grouped_counts_cols(
                            cols, u2, gmask, n_valid
                        )
                        return (counts[0, 0] & jnp.int32(7)) + 1, ()

                    carry, _ = jax.lax.scan(
                        body, jnp.int32(0), None, length=nsteps
                    )
                    return carry.reshape(1)

                return f, (cols, ut_d, gm_d, nv_d)

            def timed(fn, a):
                np.asarray(fn(*a))[0]
                best = 1e9
                for _ in range(REPEATS):
                    t0 = time.perf_counter()
                    np.asarray(fn(*a))[0]
                    best = min(best, time.perf_counter() - t0)
                return best

            f1, a1 = make(1)
            fn, an = make(CHAIN)
            dt = max(
                (timed(fn, an) - timed(f1, a1)) / (CHAIN - 1), 1e-9
            )
            mrps = B * K * H / dt / 1e6
            key = "N%d_r%d" % (n, r)
            results[key] = {
                "ms": round(dt * 1e3, 3),
                "Mrows_s": round(mrps, 1),
                "U": int(u),
                "slots": int(u * r),
            }
            print(
                "N=%d r=%d: %.3f ms/step = %.0f Mrows/s (U=%d, slots=%d)"
                % (n, r, dt * 1e3, mrps, u, u * r),
                flush=True,
            )
        cols.delete()
    print(json.dumps({"metric": "wide_n_run_bucket", "results": results}))


if __name__ == "__main__":
    main()
