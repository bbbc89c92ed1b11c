#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Runs on whatever backend JAX selects (the real TPU chip under the driver).
Details for every suite land in bench_details.json; set DLCO_BENCH_SUITE to
run a subset (all|pr|sweep|hinge|stage3|pj|brown).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opencv_dlco_tpu import bench  # noqa: E402

if __name__ == "__main__":
    bench.run(suite=os.environ.get("DLCO_BENCH_SUITE", "headline"))
