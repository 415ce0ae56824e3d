#!/usr/bin/env python
"""Convert a reference BIGSI index to the bigsi-tpu shard format.

The equivalent of the reference's ``scripts/convert_v01_to_v03.py``
(format-evolution tooling).  Two sources are supported:

* ``--blooms``: a directory/list of reference ``.bloom`` files — the
  restartable build intermediate (raw MSB-first bit bytes,
  ``bigsi/cmds/bloom.py:26-27``).  This is the recommended path and
  needs no extra dependencies.
* ``--berkeleydb``: a reference v0.3 BerkeleyDB index (requires the
  optional ``bsddb3`` package, exactly as the reference itself does).

Usage:
  python scripts/convert_reference_index.py --config new.yaml \
      --blooms s1.bloom s2.bloom --samples s1 s2
  python scripts/convert_reference_index.py --config new.yaml \
      --berkeleydb /path/to/ref-index
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

from bigsi_tpu.bloom import load_bloom_file
from bigsi_tpu.config import get_config_from_file
from bigsi_tpu.graph import BIGSI


def from_blooms(config, bloom_paths, samples):
    blooms = [load_bloom_file(p, config["m"]) for p in bloom_paths]
    BIGSI.build(config, blooms, samples)
    print("converted %d blooms -> %s" % (len(blooms), config["storage-config"]))


def from_berkeleydb(config, path):
    try:
        import bsddb3.db as db
    except ImportError:
        raise SystemExit(
            "--berkeleydb conversion needs the optional bsddb3 package "
            "(the reference's own dependency); use --blooms instead"
        )
    # Reference v0.3 layout: one DB file with typed keys (storage/base.py)
    handle = db.DB()
    handle.open(path, flags=db.DB_RDONLY)

    def get_int(key):
        return int(handle[key.encode()].decode())

    m = get_int("ksi:bloomfilter_size:int")
    h = get_int("ksi:num_hashes:int")
    num_cols = get_int("number_of_cols:int")
    num_samples = get_int("metadata:colour_count:int")
    samples = [
        handle[("metadata:%d:string" % c).encode()].decode()
        for c in range(num_samples)
    ]
    config = dict(config, m=m, h=h)
    # rebuild columns from rows
    cols = np.zeros((num_cols, m), dtype=bool)
    for r in range(m):
        row = np.unpackbits(
            np.frombuffer(handle[("%d:bitarray" % r).encode()], dtype=np.uint8),
            bitorder="big",
        )
        cols[:, r] = row[:num_cols]
    handle.close()
    BIGSI.build(config, [cols[c] for c in range(num_cols)], samples)
    print("converted BerkeleyDB index (%d samples, m=%d) -> %s" % (
        num_samples, m, config["storage-config"]))


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
