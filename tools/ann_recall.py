"""Measured ANN recall/cost at a given sf: recall@k, scan fraction, and
selectivity lift for v2 (IVF, 2 probed cells), v4 (SRP single bucket) and
v5 (multiprobe) against the exact v1 baseline, averaged over a
deterministic stride of probe vectors (functions/similarity.py::
ann_recall_summary). Prints a human table and ONE machine line
``ANN_RECALL {json}`` for bench.py.

Usage: python tools/ann_recall.py [sf_dir] [k] [max_probes]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    max_probes = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    from data_warehouse_etl_spark.functions.similarity import ann_recall_summary
    from data_warehouse_etl_spark.session import get_spark

    spark = get_spark(app_name="ann_recall")
    rows = ann_recall_summary(spark, sf_dir, k=k, max_probes=max_probes).collect()
    out = {
        r["variant"]: {
            "recall_at_k": r["recall_at_k"],
            "scan_frac": r["scan_frac"],
            "lift": r["lift"],
        }
        for r in rows
    }
    for v, m in out.items():
        print(f"{v:24s} recall@{k}={m['recall_at_k']:.4f} "
              f"scan_frac={m['scan_frac']:.4f} lift={m['lift']:.2f}")
    print("ANN_RECALL " + json.dumps({"k": k, "max_probes": max_probes,
                                      "variants": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
