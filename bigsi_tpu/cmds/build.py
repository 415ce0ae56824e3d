"""``build`` command: .bloom files -> index, with memory-capped chunking.

Reference: ``bigsi/cmds/build.py``.  The reference's chunked path is
broken (passes ``h`` as the bloom size at ``build.py:50`` and
references undefined variables at ``build.py:79-85``); this version
implements the intended behavior: if loading all blooms would exceed
``max_memory``, build the index in chunks and merge.
"""

from __future__ import annotations

import copy
import logging
import math

import numpy as np

from bigsi_tpu.bloom import load_bloom_file
from bigsi_tpu.bloom.bloomfilter import LazyBloomFile
from bigsi_tpu.graph import BIGSI
from bigsi_tpu.utils import chunks

logger = logging.getLogger(__name__)


def load_bloomfilter(f: str, m: int | None = None):
    """mmap-backed lazy bloom: the chunked transpose reads row slices on
    demand, so peak build memory is bounded by the transpose block, not
    N dense blooms (see LazyBloomFile)."""
    logger.debug("Loading %s", f)
    return LazyBloomFile(f, m)


def get_required_bytes_per_bloomfilter(m: int) -> float:
    # bloom bool array (m bytes as numpy bool) + packed row share (m/8)
    return m * 9 / 8


def get_required_chunk_size(N: int, m: int, max_memory: int):
    bytes_per_bloomfilter = get_required_bytes_per_bloomfilter(m)
    required_bytes = bytes_per_bloomfilter * N
    num_chunks = math.ceil(required_bytes / max_memory)
    chunk_size = math.floor(N / num_chunks)
    return chunk_size, num_chunks


def _tmp_config(config: dict, i: int) -> dict:
    tmpconfig = copy.deepcopy(config)
    sc = dict(tmpconfig.get("storage-config", {}))
    sc["filename"] = sc.get("filename", "bigsi-tpu-index") + ".tmp%i" % i
    tmpconfig["storage-config"] = sc
    return tmpconfig


def build(config: dict, bloomfilter_filepaths, samples, max_memory=None) -> dict:
    if max_memory is None:
        chunk_size, num_chunks = len(bloomfilter_filepaths), 1
    else:
        chunk_size, num_chunks = get_required_chunk_size(
            N=len(samples), m=config["m"], max_memory=max_memory
        )
    if chunk_size < 1:
        raise ValueError("Max memory must be at least 9/8 * Bloomfilter size in bytes")
    index = None
    pairs = list(zip(bloomfilter_filepaths, samples))
    for i, chunk in enumerate(chunks(pairs, chunk_size)):
        paths = [x[0] for x in chunk]
        names = [x[1] for x in chunk]
        logger.info("Building index: %i/%i", i + 1, num_chunks)
        if i == 0:
            index = build_main(config, paths, names)
        else:
            tmp_index = build_main(_tmp_config(config, i), paths, names)
            index.merge(tmp_index)
            tmp_index.delete()
    return {"result": "success"}


def build_main(config: dict, bloomfilter_filepaths, samples) -> BIGSI:
    bloomfilters = [
        load_bloomfilter(f, config.get("m")) for f in bloomfilter_filepaths
    ]
    return BIGSI.build(config, bloomfilters, samples)
