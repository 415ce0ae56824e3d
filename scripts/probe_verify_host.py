"""Probe: is the host verify pass (and_count_words_batch) TLB/page
bound?  Compares the same kernel over (a) a file-backed mmap (the
production rows.bin path), (b) a plain RAM copy (4 KB anon pages),
(c) an anonymous MADV_HUGEPAGE region (2 MB pages).  Usage:
python scripts/probe_verify_host.py [--m 25000000] [--w 32]"""

import argparse
import mmap
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bigsi_tpu import native  # noqa: E402


def bench(words, idx, qstart, wids_all, wstart, nw_cap, reps=5):
    native.and_count_words_batch(words, idx, qstart, wids_all, wstart, nw_cap, 2)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        native.and_count_words_batch(words, idx, qstart, wids_all, wstart, nw_cap, 2)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=25_000_000)
    ap.add_argument("--w", type=int, default=32)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--h", type=int, default=3)
    ap.add_argument("--cands", type=int, default=8)
    args = ap.parse_args()
    m, w = args.m, args.w
    rng = np.random.default_rng(0)
    nbytes = m * w * 4
    path = "/tmp/probe_rows.bin"
    if not (os.path.exists(path) and os.path.getsize(path) == nbytes):
        print("writing %.1f GB matrix..." % (nbytes / 1e9))
        with open(path, "wb") as f:
            chunk = 1 << 22
            for r0 in range(0, m, chunk):
                r1 = min(r0 + chunk, m)
                rng.integers(0, 1 << 32, size=(r1 - r0, w), dtype=np.uint32).tofile(f)
    mm = np.memmap(path, dtype=np.uint32, mode="r", shape=(m, w))
    # warm page cache
    _ = np.asarray(mm[:: 1 << 14]).sum()
    x = 0
    for r0 in range(0, m, 1 << 20):
        x += int(mm[r0, 0])

    b, k, h, c = args.b, args.k, args.h, args.cands
    idx = rng.integers(0, m, size=(b * k, h), dtype=np.int64)
    qstart = np.arange(b + 1, dtype=np.int64) * k
    wids = np.sort(
        np.stack([rng.choice(w, size=c, replace=False) for _ in range(b)])
    ).astype(np.int32)
    wids_all = wids.reshape(-1)
    wstart = np.arange(b + 1, dtype=np.int64) * c

    t_mm = bench(mm, idx, qstart, wids_all, wstart, c)
    print("memmap (file-backed 4K):  %.2f ms/batch" % t_mm)

    ram = np.array(mm)  # anon 4K pages (THP policy is madvise)
    t_ram = bench(ram, idx, qstart, wids_all, wstart, c)
    print("RAM copy (anon 4K):       %.2f ms/batch" % t_ram)
    del ram

    buf = mmap.mmap(-1, nbytes)
    if hasattr(mmap, "MADV_HUGEPAGE"):
        buf.madvise(mmap.MADV_HUGEPAGE)
    huge = np.frombuffer(buf, dtype=np.uint32).reshape(m, w)
    np.copyto(huge.reshape(-1), np.asarray(mm).reshape(-1))
    huge = huge.reshape(m, w)
    t_huge = bench(huge, idx, qstart, wids_all, wstart, c)
    print("MADV_HUGEPAGE copy (2M):  %.2f ms/batch" % t_huge)
    print("speedup huge vs memmap: %.2fx" % (t_mm / t_huge))


if __name__ == "__main__":
    main()
