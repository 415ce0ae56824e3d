#!/usr/bin/env python
"""Query a running bigsi-tpu HTTP API (reference analogue:
``example-scripts/search.py`` hitting the hosted api.bigsi.io).

  python example-scripts/search.py SEQUENCE [--host http://localhost:8000]
        [--threshold 1.0]
"""

import argparse
import json
import urllib.parse
import urllib.request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq")
    ap.add_argument("--host", default="http://localhost:8000")
    ap.add_argument("--threshold", type=float, default=1.0)
    args = ap.parse_args()
    url = "%s/search?%s" % (
        args.host,
        urllib.parse.urlencode({"seq": args.seq, "threshold": args.threshold}),
    )
    with urllib.request.urlopen(url) as resp:
        results = json.loads(resp.read())
    print(json.dumps(results, indent=4))


if __name__ == "__main__":
    main()
