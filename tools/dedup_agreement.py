"""Measured candidate quality of the approximate near-dup detectors at a
given sf: precision (candidate efficiency — the fraction a downstream exact
verify keeps) and recall (what the bucketing construction misses outright)
of d3 (MinHash-LSH), d4 (SimHash banding) and d9 (winnowing) against d2's
exact capped-vocabulary Jaccard >= 0.6 ground truth
(functions/textops.py::dedup_agreement_summary). Prints a human table and
ONE machine line ``DEDUP_AGREEMENT {json}`` for bench.py.

Usage: python tools/dedup_agreement.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from data_warehouse_etl_spark.functions.textops import dedup_agreement_summary
    from data_warehouse_etl_spark.session import get_spark

    spark = get_spark(app_name="dedup_agreement")
    rows = dedup_agreement_summary(spark, sf_dir).collect()
    out = {
        r["detector"]: {
            "n_pairs": r["n_pairs"],
            "n_truth": r["n_truth"],
            "precision": r["precision"],
            "recall": r["recall"],
        }
        for r in rows
    }
    for d, m in out.items():
        print(f"{d:24s} pairs={m['n_pairs']} truth={m['n_truth']} "
              f"precision={m['precision']} recall={m['recall']}")
    print("DEDUP_AGREEMENT " + json.dumps({"detectors": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
