#!/usr/bin/env python
"""Convert a reference BIGSI index to the bigsi-tpu shard format.

The equivalent of the reference's ``scripts/convert_v01_to_v03.py``
(format-evolution tooling).  Two sources are supported:

* ``--blooms``: a directory/list of reference ``.bloom`` files — the
  restartable build intermediate (raw MSB-first bit bytes,
  ``bigsi/cmds/bloom.py:26-27``).  This is the recommended path and
  needs no extra dependencies.
* ``--berkeleydb``: a reference BerkeleyDB index, read with the
  in-repo pure-Python DB_HASH reader (no bsddb3 needed).  Both
  persisted layouts are auto-detected:

  - v0.1: a directory with ``graph`` + ``metadata`` DB files,
    big-endian int values, ``colour%i`` name keys, big-endian row keys
    (what ``/root/reference/example-data/test-bigsi`` is, and what the
    reference's own ``scripts/convert_v01_to_v03.py`` consumes);
  - v0.3: a single DB file with typed string keys
    (``ksi:bloomfilter_size:int``, ``%d:bitarray`` rows,
    ``metadata:%d:string`` names — ``bigsi/storage/base.py:29-52``).

Usage:
  python scripts/convert_reference_index.py --config new.yaml \
      --blooms s1.bloom s2.bloom --samples s1 s2
  python scripts/convert_reference_index.py --config new.yaml \
      --berkeleydb /root/reference/example-data/test-bigsi
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from bigsi_tpu.bloom import load_bloom_file
from bigsi_tpu.config import get_config_from_file
from bigsi_tpu.graph import BIGSI
from bigsi_tpu.storage.berkeleydb_reader import BerkeleyHashReader


def from_blooms(config, bloom_paths, samples):
    blooms = [load_bloom_file(p, config["m"]) for p in bloom_paths]
    BIGSI.build(config, blooms, samples)
    print("converted %d blooms -> %s" % (len(blooms), config["storage-config"]))


def _columns_from_rows(get_row_bytes, m, num_cols):
    """Rebuild bloom columns from m stored rows (MSB-first row bytes,
    byte-padded to ceil(num_cols/8) — ``bigsi/matrix/bitmatrix.py:34-37``)."""
    cols = np.zeros((num_cols, m), dtype=bool)
    for r in range(m):
        raw = get_row_bytes(r)
        row = np.unpackbits(np.frombuffer(raw, dtype=np.uint8), bitorder="big")
        cols[:, r] = row[:num_cols]
    return cols


def read_v01(path):
    """Reference v0.1 layout: graph + metadata DB files in a directory."""
    meta = BerkeleyHashReader(os.path.join(path, "metadata"))
    graph = BerkeleyHashReader(os.path.join(path, "graph"))

    def be_int(key):
        return int.from_bytes(meta[key], "big")

    m = be_int(b"bloom_filter_size")
    h = be_int(b"num_hashes")
    k = be_int(b"kmer_size")
    if b"num_colours" in meta:
        n = be_int(b"num_colours")
    else:
        import pickle

        n = len(pickle.loads(meta[b"colours"]))
    samples = [meta[b"colour%d" % c].decode() for c in range(n)]
    cols = _columns_from_rows(
        lambda r: graph[r.to_bytes(4, "big")], m, n
    )
    return dict(m=m, h=h, k=k), samples, cols


def read_v03(path):
    """Reference v0.3 layout: one DB file with typed string keys."""
    db = BerkeleyHashReader(path)

    def get_int(key):
        return int(db[key.encode()].decode())

    m = get_int("ksi:bloomfilter_size:int")
    h = get_int("ksi:num_hashes:int")
    num_cols = get_int("number_of_cols:int")
    n = get_int("metadata:colour_count:int")
    samples = [db[("metadata:%d:string" % c).encode()].decode() for c in range(n)]
    cols = _columns_from_rows(
        lambda r: db[("%d" % r).encode() + b":bitarray"], m, num_cols
    )
    return dict(m=m, h=h), samples, cols


def from_berkeleydb(config, path):
    if os.path.isdir(path):
        params, samples, cols = read_v01(path)
    else:
        params, samples, cols = read_v03(path)
    config = dict(config, **params)
    BIGSI.build(config, [cols[c] for c in range(len(samples))], samples)
    print(
        "converted BerkeleyDB index (%d samples, m=%d, h=%d) -> %s"
        % (len(samples), config["m"], config["h"], config["storage-config"])
    )
    return config


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--blooms", nargs="*", default=None)
    ap.add_argument("--samples", nargs="*", default=None)
    ap.add_argument("--berkeleydb", default=None)
    args = ap.parse_args()
    config = get_config_from_file(args.config)
    if args.blooms:
        samples = args.samples or args.blooms
        from_blooms(config, args.blooms, samples)
    elif args.berkeleydb:
        from_berkeleydb(config, args.berkeleydb)
    else:
        raise SystemExit("provide --blooms or --berkeleydb")


if __name__ == "__main__":
    main()
