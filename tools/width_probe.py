"""Width-scaling decomposition probe (VERDICT r4 item 4 residual).

The secondary local[8]→local[32] pair scales far worse than even the
host's measured deliverable-CPU ratio (BENCH r5: self-normalized 0.145 vs
probe capacity ratio 0.581), so some PHASE of the replay degrades
super-linearly with thread count on this box. The fused MoR batch runs
dedup+extract+commit as ONE action, so wall-clock phase marks can't split
it; this probe instead runs three isolated stage-shaped workloads — each
matching one leg of the replay batch — at both widths, pinned, with the
same burn probes as bench.py:

- ``shuffle_agg``   — the LWW winner reduce: 120M narrow rows, map-side
                      combining max_by(struct) per key (JVM only).
- ``pandas_extract``— the real fused ``extract_enrich_udf`` over
                      batch-winner-sized synthetic html (python daemons +
                      two Arrow transfers per task).
- ``parquet_write`` — the delta-commit leg: bucket repartition + parquet
                      write of extracted-shaped rows to repo-local scratch.

Whichever workload's 8→32 efficiency collapses names the regressing
phase. Run ALONE (the box is steal-drifting; concurrent Spark work
invalidates the probes):

    python tools/width_probe.py [reps]       # default 3, interleaved
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDTHS = (8, 32)
WORKLOADS = ("shuffle_agg", "pandas_extract", "parquet_write")


def _mk_spark(cpus: int):
    from data_warehouse_etl_spark.session import get_spark

    scratch = os.path.join(REPO, ".bench", "tmp_spark")
    os.makedirs(scratch, exist_ok=True)
    return get_spark(
        app_name=f"width-probe-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 4),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.local.dir": scratch,
        },
    )


def w_shuffle_agg(spark) -> float:
    """LWW winner-reduce shape: wide-key max_by over 120M events, 12M keys."""
    from pyspark.sql import functions as F

    df = spark.range(120_000_000, numPartitions=128).select(
        (F.col("id") % 12_000_000).alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") * 37 % 1_000_003).alias("ts"),
    )
    winners = df.groupBy("k").agg(F.max(F.struct("ts", "seq")).alias("w"))
    return float(winners.agg(F.sum("w.seq")).collect()[0][0])


_HTML_FMT = (
    "<html><head><title>Site %d page %d</title></head><body>"
    "<h1>Heading %d</h1><p>Lorem ipsum dolor sit amet, consectetur "
    "adipiscing elit, sed do eiusmod tempor &amp; incididunt ut labore "
    "et dolore magna aliqua, quis nostrud exercitation ullamco.</p>"
    "<ul><li>item one</li><li>item %d</li></ul>"
    "<table><tr><td>k&eacute;y</td><td>%d</td></tr></table>"
    "<!-- build %d --></body></html>"
)


def _winner_shaped(spark, n: int):
    """Batch-winner-sized rows with the ledger's html/lang columns."""
    from pyspark.sql import functions as F

    i = F.col("id")
    return spark.range(n, numPartitions=64).select(
        F.format_string("https://site-%d.example.com/p/%d", i % 50_000, i).alias("url"),
        F.encode(
            F.format_string(_HTML_FMT, i % 997, i, i % 31, i % 7, i % 13, i % 5),
            "utf-8",
        ).alias("html"),
        F.lit(None).cast("string").alias("lang"),
        i.alias("seq"),
    )


def w_pandas_extract(spark) -> float:
    """The replay's python leg: fused extract+lang UDF, one Arrow round trip."""
    from pyspark.sql import functions as F

    from data_warehouse_etl_spark.cdc.extract import extract_enrich_udf

    df = _winner_shaped(spark, 1_500_000)
    out = df.select(extract_enrich_udf("html", "lang").alias("e"))
    return float(out.agg(F.sum(F.length("e.text"))).collect()[0][0])


def w_parquet_write(spark) -> float:
    """The commit leg: bucket repartition + parquet write, repo-local."""
    from pyspark.sql import functions as F

    path = os.path.join(REPO, ".bench", "tmp_spark", "width_probe_out")
    shutil.rmtree(path, ignore_errors=True)
    df = _winner_shaped(spark, 5_000_000).select(
        "url",
        F.decode("html", "utf-8").alias("text"),
        F.lit("en").alias("lang"),
        "seq",
        (F.xxhash64("url") % 16).alias("bucket"),
    )
    df.repartition(16, "bucket").write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    shutil.rmtree(path, ignore_errors=True)
    return float(n)


def run_worker(cpus: int, workload: str) -> None:
    from bench import cpu_capacity, warm_jvm

    spark = _mk_spark(cpus)
    warm_jvm(spark)
    fn = {"shuffle_agg": w_shuffle_agg,
          "pandas_extract": w_pandas_extract,
          "parquet_write": w_parquet_write}[workload]
    fn(spark)  # one untimed pass: codegen + daemon pool for THIS plan shape
    cap0 = cpu_capacity(cpus)
    t0 = time.monotonic()
    check = fn(spark)
    wall = time.monotonic() - t0
    cap1 = cpu_capacity(cpus)
    print("PROBE_RESULT " + json.dumps({
        "cpus": cpus, "workload": workload, "wall_sec": round(wall, 3),
        "cap_mops": round((cap0 + cap1) / 2, 1), "check": check,
    }))
    spark.stop()


def _spawn(cpus: int, workload: str) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.abspath(__file__), "--worker", str(cpus), workload]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_RESULT "):
            return json.loads(line[len("PROBE_RESULT "):])
    raise RuntimeError(f"worker {workload}@{cpus} failed:\n{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}")


def _mem_walk(n_steps: int) -> int:
    """Dependent random walk over a 64 MB array — LLC-defeating random
    access, the memory profile of a large hash aggregation (vs the
    arithmetic burn in bench.cpu_capacity, which lives in registers/L1)."""
    import array as _arr

    size = 8 * 1024 * 1024  # 64 MB of int64
    a = _arr.array("q", range(size))
    idx = 1
    for _ in range(n_steps):
        idx = (a[idx] * 2654435761 + 12345) & (size - 1)
    return idx


def mem_capacity(procs: int, per: int = 2_000_000) -> float:
    """Parallel random-access capacity (Maccesses/s) at `procs` workers.

    If this ratio saturates 8→32 while the arithmetic burn keeps scaling,
    wide-width shuffle/hash-agg slowdown is memory-subsystem-bound on this
    box — a scale-UP artifact: real scale-OUT adds memory controllers with
    each executor host."""
    import multiprocessing as mp

    t0 = time.monotonic()
    with mp.Pool(procs) as pool:
        pool.map(_mem_walk, [per] * procs)
    return per * procs / (time.monotonic() - t0) / 1e6


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3
    runs: dict[tuple[str, int], list[dict]] = {}
    for rep in range(reps):  # rep-major interleave: drift hits all cells alike
        for wl in WORKLOADS:
            for cpus in WIDTHS:
                r = _spawn(cpus, wl)
                runs.setdefault((wl, cpus), []).append(r)
                print(f"  rep{rep} {wl}@{cpus}: {r['wall_sec']}s cap={r['cap_mops']}",
                      file=sys.stderr, flush=True)
    lo, hi = WIDTHS
    out = {}
    for wl in WORKLOADS:
        lows, highs = runs[(wl, lo)], runs[(wl, hi)]
        checks = {r["check"] for r in lows + highs}
        per_rep_eff = [
            (l["wall_sec"] / h["wall_sec"]) / (hi / lo)
            for l, h in zip(lows, highs)
        ]
        per_rep_norm = [
            (l["wall_sec"] * l["cap_mops"]) / (h["wall_sec"] * h["cap_mops"])
            for l, h in zip(lows, highs)
        ]
        out[wl] = {
            f"wall_{lo}": [r["wall_sec"] for r in lows],
            f"wall_{hi}": [r["wall_sec"] for r in highs],
            f"cap_{lo}": [r["cap_mops"] for r in lows],
            f"cap_{hi}": [r["cap_mops"] for r in highs],
            "efficiency": round(_median(per_rep_eff), 3),
            "per_rep_efficiency": [round(e, 3) for e in per_rep_eff],
            "norm_efficiency": round(_median(per_rep_norm), 3),
            "per_rep_norm": [round(e, 3) for e in per_rep_norm],
            "result_identical": len(checks) == 1,
        }
    print("WIDTH_PROBE " + json.dumps({"widths": list(WIDTHS), "reps": reps,
                                       "workloads": out}))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]), sys.argv[3])
    else:
        main()
