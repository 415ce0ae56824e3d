"""Subprocess entry for the distributed-serving test.

Process 0 runs the host-0 half of ``serve --distributed`` (HTTP server
backed by the collective engine) plus test orchestration: it makes real
HTTP requests against itself, prints the responses, then stops the
worker fleet.  Processes > 0 run the REAL production entry point,
``http.server.serve(config, distributed=True)``, end to end.

Invoked by tests/test_distributed.py::test_distributed_serving.
"""

import json
import os
import sys
import threading
import urllib.request


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    coord_port = sys.argv[3]
    local_devices = int(sys.argv[4])
    http_port = int(sys.argv[5])
    index_dir = sys.argv[6]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=%d" % local_devices
    )
    os.environ["BIGSI_TPU_COORDINATOR"] = "127.0.0.1:%s" % coord_port
    os.environ["BIGSI_TPU_NUM_PROCESSES"] = str(num_processes)
    os.environ["BIGSI_TPU_PROCESS_ID"] = str(process_id)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    import jax

    jax.config.update("jax_platforms", "cpu")

    config = {
        "storage-engine": "bigsi-tpu",
        "storage-config": {"filename": index_dir},
        "k": 31,
        "m": 20000,
        "h": 3,
    }

    if process_id != 0:
        # the real production worker path
        from bigsi_tpu.http.server import serve

        serve(config, port=http_port, distributed=True)
        print("PROC_OK")
        return

    # host 0: the serve_distributed host branch, inlined so the test can
    # drive HTTP requests and then stop the fleet
    from bigsi_tpu.graph.bigsi import BIGSI
    from bigsi_tpu.http.server import make_server
    from bigsi_tpu.parallel import distributed as dist

    dist.initialize()
    cfg = dict(config)
    cfg["engine"] = "distributed"
    graph = BIGSI(cfg)
    server = make_server(cfg, host="127.0.0.1", port=http_port)
    server._bigsi = graph
    server.read_only = True
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    ref = sys.argv[7]
    base = "http://127.0.0.1:%d" % http_port
    with urllib.request.urlopen(
        "%s/search?seq=%s&threshold=0.5" % (base, ref), timeout=120
    ) as resp:
        print("SEARCH:" + json.dumps(json.loads(resp.read().decode())))
    # bulk search drives search_batch -> counts_batch -> the GROUPED
    # multi-process dispatch (the index is minimizer-layout)
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".fasta", delete=False
    ) as f:
        f.write(">q1\n%s\n>q2\n%s\n>q3\n%s\n" % (ref, ref[5:60], ref[20:]))
        fasta_path = f.name
    with urllib.request.urlopen(
        "%s/bulk_search?fasta=%s&threshold=0.5" % (base, fasta_path),
        timeout=120,
    ) as resp:
        print("BULK:" + json.dumps(json.loads(resp.read().decode())))
    # mutating routes must 403 in distributed serving
    try:
        urllib.request.urlopen(
            "%s/insert?bloomfilter=x&sample=y" % base, data=b"", timeout=60
        )
        print("INSERT_STATUS:200")
    except urllib.error.HTTPError as e:
        print("INSERT_STATUS:%d" % e.code)

    collective = next(
        e
        for e in (graph.engine, getattr(graph, "screen_engine", None))
        if e is not None and hasattr(e, "stop")
    )
    collective.stop()
    server.shutdown()
    print("PROC_OK")


if __name__ == "__main__":
    main()
