"""Incremental view maintenance: derived aggregates fed by the changelog.

The reference maintains every downstream aggregate by full recompute on a
schedule (366-day lookback re-aggregations,
``/root/reference/Sql Scripts/Monthly Stats - Fact Scripts.sql``; nightly
fact rebuilds throughout). At 10^10 source rows a nightly recompute of a
per-group rollup re-reads the world to refresh groups that mostly did not
change. This module is the CDC-out consumer that replaces that idiom: an
additive ``GROUP BY`` aggregate stored as its own LakeTable and advanced by
applying the engine's changelog interval — cost O(changed rows + touched
groups), never O(source table).

Maintenance algebra (classic IVM for additive measures): every changelog
row contributes with a sign — ``insert``/``update_postimage`` add, and
``delete``/``update_preimage`` retract. The changelog's ``"both"`` image
mode exists precisely so updates retract their old contribution. COUNT is
``sum(sign)``; SUM(col) is ``sum(sign * coalesce(col, 0))`` — NULL measures
are defined as 0 so the incremental path and the recompute path agree on
groups whose values are all NULL. MIN/MAX are NOT additive; they use the
hybrid scheme (incremental fold for inserts, targeted per-group source
recompute when a retraction hits the stored extreme — see the class
docstring).

Exactly-once: the aggregate table records the source snapshot version it
reflects (``source_version`` property) in the SAME atomic commit as the
data, so a crashed or re-run ``refresh()`` either no-ops or re-derives the
identical interval — the engine's checkpoint idiom, one level downstream.
A source interval whose starting snapshot has been expired (retention GC)
falls back to one full recompute and is exact again from there.

Physical shape: the aggregate table is merge-on-read keyed by the group
tuple (canonicalized to one ``_gk`` string — also the bucket key, so null
group values join and bucket deterministically). A refresh appends ONE
delta row per *changed group*; unchanged groups are never rewritten.
Reads of old totals during a refresh are bucket-pruned to the changed
groups' buckets. Groups whose count returns to 0 stay as dead rows until
:meth:`compact`; :meth:`read` filters them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable

_SRC_VER_PROP = "ivm.source_version"
_NULL = "\x00"


def _gk_expr(group_cols: list[str]) -> F.Column:
    """Canonical group key: null-sentinel concat (state_hash's convention),
    so NULL group values are first-class join/bucket keys."""
    return F.concat_ws(
        "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in group_cols]
    )


class IncrementalAggregate:
    """COUNT + SUM rollup over an engine's live pages view, maintained from
    :meth:`CdcEngine.changelog` intervals.

    ``group_cols`` — grouping columns of the live view; ``sum_cols`` —
    numeric columns aggregated as SUM (NULL counted as 0). The COUNT measure
    (``n``) is always present.

    ``min_cols``/``max_cols`` — non-distributive extremes, maintained by the
    textbook HYBRID: inserts fold in as least/greatest(stored, inserted);
    a retraction (delete / update preimage) that equals the stored extreme
    invalidates the incremental form for that group, and exactly those
    groups' extremes are recomputed from the live source (broadcast
    semi-join on the group key). NULL semantics match plain MIN/MAX
    (ignored; all-NULL group → NULL). ``refresh()`` reports
    ``groups_recomputed`` so the hybrid's cost is observable.
    """

    def __init__(
        self,
        engine,
        path: str,
        group_cols: list[str],
        sum_cols: list[str] | None = None,
        min_cols: list[str] | None = None,
        max_cols: list[str] | None = None,
        num_buckets: int = 16,
    ):
        self.eng = engine
        self.spark: SparkSession = engine.spark
        self.path = path
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols or [])
        self.min_cols = list(min_cols or [])
        self.max_cols = list(max_cols or [])
        src_fields = {f.name: f.type for f in engine.pages.manifest.current_fields}
        schema = [("_gk", "string")]
        schema += [(c, src_fields.get(c, "string")) for c in self.group_cols]
        schema += [("n", "bigint")]
        schema += [(f"sum_{c}", "double") for c in self.sum_cols]
        schema += [(f"min_{c}", src_fields.get(c, "double")) for c in self.min_cols]
        schema += [(f"max_{c}", src_fields.get(c, "double")) for c in self.max_cols]
        schema += [("_src_ver", "bigint")]
        if LakeTable.exists(path):
            self.table = LakeTable.load(path)
        else:
            self.table = LakeTable.create(
                path,
                schema=schema,
                bucket_col="_gk",
                num_buckets=num_buckets,
                row_key="_gk",
                version_cols=["_src_ver"],
            )

    # ------------------------------------------------------------------ read

    @property
    def source_version(self) -> int:
        return int(self.table.manifest.properties.get(_SRC_VER_PROP, "-1"))

    def read(self) -> DataFrame:
        """Current aggregate: one row per live group."""
        df = self.table.read(self.spark)
        return df.filter(F.col("n") > 0).drop("_gk", "_src_ver")

    # ----------------------------------------------------------------- write

    def _measures(self, sign: F.Column) -> list[F.Column]:
        aggs = [F.sum(sign).cast("bigint").alias("n")]
        for c in self.sum_cols:
            aggs.append(
                F.sum(sign * F.coalesce(F.col(c).cast("double"), F.lit(0.0))).alias(f"sum_{c}")
            )
        return aggs

    def _extremes(self, prefix: str = "") -> list[F.Column]:
        aggs = []
        for c in self.min_cols:
            aggs.append(F.min(c).alias(f"{prefix}min_{c}"))
        for c in self.max_cols:
            aggs.append(F.max(c).alias(f"{prefix}max_{c}"))
        return aggs

    def _recompute(self, src_version: int) -> dict:
        live = self.eng.read_pages()
        agg = (
            live.groupBy(*self.group_cols)
            .agg(*self._measures(F.lit(1)), *self._extremes())
            .withColumn("_gk", _gk_expr(self.group_cols))
            .withColumn("_src_ver", F.lit(src_version).cast("bigint"))
        )
        self.table = self.table.replace(
            agg, properties_update={_SRC_VER_PROP: str(src_version)}
        )
        return {"mode": "recompute", "from": None, "to": src_version}

    def refresh(self) -> dict:
        """Advance the aggregate to the source's current snapshot.

        No-op if already current. First call (or an interval whose starting
        snapshot was expired) recomputes once; every other call applies the
        changelog delta: one pruned read of the changed groups' buckets, one
        null-safe join on ``_gk``, one delta commit of changed groups only.
        """
        self.table = self.table.refresh()
        self.eng.pages = self.eng.pages.refresh()
        cur = self.eng.pages.manifest.version
        last = self.source_version
        if last == cur:
            return {"mode": "noop", "from": last, "to": cur}
        if last < 0:
            return self._recompute(cur)
        try:
            cl = self.eng.changelog(last, cur, update_images="both")
        except ValueError:
            # the starting snapshot aged out of retention — pay one recompute
            return self._recompute(cur)

        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        # MIN/MAX are not retractable from the aggregate alone: per group we
        # track the inserted-side and retracted-side extremes separately —
        # if a retraction hits the STORED extreme the group's extreme is
        # recomputed from the source (hybrid IVM, below); otherwise the new
        # extreme is least/greatest(stored, inserted).
        ext_aggs: list[F.Column] = []
        for c in self.min_cols:
            ext_aggs.append(F.min(F.when(sign == 1, F.col(c))).alias(f"_ins_min_{c}"))
            ext_aggs.append(F.min(F.when(sign == -1, F.col(c))).alias(f"_ret_min_{c}"))
        for c in self.max_cols:
            ext_aggs.append(F.max(F.when(sign == 1, F.col(c))).alias(f"_ins_max_{c}"))
            ext_aggs.append(F.max(F.when(sign == -1, F.col(c))).alias(f"_ret_max_{c}"))
        # persist: the signed-contribution aggregate (the expensive diff
        # join) is read twice — bucket discovery, then the merge write.
        # It is O(changed groups), the smallest frame in the pipeline.
        delta = (
            cl.withColumn("_sign", sign)
            .groupBy(*self.group_cols)
            .agg(*self._measures(F.col("_sign")), *ext_aggs)
            .withColumn("_gk", _gk_expr(self.group_cols))
        ).persist()
        try:
            # prune the old-totals read to the changed groups' buckets; the
            # collect is ≤ num_buckets small ints, never data rows
            bexpr = F.pmod(
                F.xxhash64(F.col("_gk")), F.lit(self.table.manifest.num_buckets)
            )
            buckets = [
                r["b"]
                for r in delta.select(bexpr.cast("int").alias("b")).distinct().collect()
            ]
            if not buckets:
                self.table = self.table.set_properties({_SRC_VER_PROP: str(cur)})
                return {"mode": "delta", "from": last, "to": cur, "groups_changed": 0}
            old = self.table.read(self.spark, buckets=buckets).select(
                "_gk", F.col("n").alias("_old_n"),
                *[F.col(f"sum_{c}").alias(f"_old_sum_{c}") for c in self.sum_cols],
                *[F.col(f"min_{c}").alias(f"_old_min_{c}") for c in self.min_cols],
                *[F.col(f"max_{c}").alias(f"_old_max_{c}") for c in self.max_cols],
            )
            # a retraction that EQUALS the stored extreme invalidates the
            # incremental form for that group (retracted values were live,
            # so they are always >= old_min / <= old_max — equality is the
            # only way the extreme itself leaves)
            needs = F.lit(False)
            for c in self.min_cols:
                needs = needs | F.col(f"_ret_min_{c}").eqNullSafe(F.col(f"_old_min_{c}")) & F.col(f"_ret_min_{c}").isNotNull()
            for c in self.max_cols:
                needs = needs | F.col(f"_ret_max_{c}").eqNullSafe(F.col(f"_old_max_{c}")) & F.col(f"_ret_max_{c}").isNotNull()
            inc_ext = [
                F.least(F.col(f"_old_min_{c}"), F.col(f"_ins_min_{c}")).alias(f"min_{c}")
                for c in self.min_cols
            ] + [
                F.greatest(F.col(f"_old_max_{c}"), F.col(f"_ins_max_{c}")).alias(f"max_{c}")
                for c in self.max_cols
            ]
            merged = delta.join(old, on="_gk", how="left").select(
                "_gk",
                *self.group_cols,
                (F.coalesce(F.col("_old_n"), F.lit(0)) + F.col("n")).alias("n"),
                *[
                    (
                        F.coalesce(F.col(f"_old_sum_{c}"), F.lit(0.0))
                        + F.col(f"sum_{c}")
                    ).alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
                *inc_ext,
                needs.alias("_recompute"),
                F.lit(cur).cast("bigint").alias("_src_ver"),
            )
            n_recomputed = 0
            merged_p = None
            if self.min_cols or self.max_cols:
                merged = merged_p = merged.persist()
                rec_keys = merged.filter("_recompute").select("_gk")
                n_recomputed = rec_keys.count()
                if n_recomputed:
                    # hybrid step: recompute ONLY the hit groups' extremes
                    # from the live source (broadcast semi-join on the group
                    # key; the source read is the price of a retracted
                    # extreme, paid per hit group, not per refresh)
                    src = self.eng.read_pages().withColumn(
                        "_gk", _gk_expr(self.group_cols)
                    )
                    fresh = (
                        src.join(F.broadcast(rec_keys), "_gk")
                        .groupBy("_gk")
                        .agg(*self._extremes(prefix="_f_"))
                    )
                    pick = [
                        F.when(F.col("_recompute"), F.col(f"_f_min_{c}"))
                        .otherwise(F.col(f"min_{c}")).alias(f"min_{c}")
                        for c in self.min_cols
                    ] + [
                        F.when(F.col("_recompute"), F.col(f"_f_max_{c}"))
                        .otherwise(F.col(f"max_{c}")).alias(f"max_{c}")
                        for c in self.max_cols
                    ]
                    ext_names = {f"min_{c}" for c in self.min_cols} | {
                        f"max_{c}" for c in self.max_cols
                    }
                    keep = [
                        c for c in merged.columns
                        if c not in ext_names and c != "_recompute"
                    ]
                    merged = merged.join(fresh, "_gk", "left").select(*keep, *pick)
                else:
                    merged = merged.drop("_recompute")
            else:
                merged = merged.drop("_recompute")
            # changed-group count rides the commit's own job (observe), not
            # an extra pass
            obs = Observation()
            merged = merged.observe(obs, F.count(F.lit(1)).alias("rows"))
            self.table = self.table.append_deltas(
                merged, properties_update={_SRC_VER_PROP: str(cur)}
            )
            n_changed = int(obs.get["rows"])
            if merged_p is not None:
                merged_p.unpersist()
        finally:
            delta.unpersist()
        return {
            "mode": "delta",
            "from": last,
            "to": cur,
            "groups_changed": n_changed,
            "groups_recomputed": n_recomputed,
        }

    def compact(self) -> None:
        """Fold MoR deltas and drop dead (n=0) groups."""
        live = self.table.read(self.spark).filter(F.col("n") > 0)
        self.table = self.table.replace(
            live, properties_update={_SRC_VER_PROP: str(self.source_version)}
        )
