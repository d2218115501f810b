"""Property: the changelog IS the state diff, for any trajectory.

Hypothesis drives random commit trajectories (keyed upsert/delete batches
with LWW versions, interleaved compactions and bucket-width rebuckets)
against a pure-python mirror
of the table's live state per version; for a random interval the
changelog must classify exactly the mirror diff — insert/update/delete
with the right images. This is the law every CDC-out consumer (IVM, index
sync, downstream mirror) rests on, tested beyond the hand-picked
trajectories in test_snapshots.py.
"""

import os

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_warehouse_etl_spark.lake import LakeTable

KEYS = "abcdefgh"
SCHEMA = "k string, val int, _deleted boolean, ver int"


@st.composite
def trajectories(draw):
    n = draw(st.integers(min_value=2, max_value=5))
    traj = []
    for i in range(n):
        if i and draw(st.booleans()):
            traj.append(draw(st.sampled_from(["compact", "rebucket"])))
        traj.append(
            draw(
                st.lists(
                    st.tuples(
                        st.sampled_from(KEYS),
                        st.integers(min_value=0, max_value=5),
                        st.booleans(),  # True = delete (tombstone)
                    ),
                    min_size=1,
                    max_size=4,
                    unique_by=lambda x: x[0],
                )
            )
        )
    return traj


def _live(df):
    return df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(traj=trajectories(), data=st.data())
def test_changelog_equals_mirror_diff(spark, tmp_path_factory, traj, data):
    path = str(tmp_path_factory.mktemp("cl-prop") / "t")
    t = LakeTable.create(
        path,
        schema=[("k", "string"), ("val", "int"), ("_deleted", "boolean"), ("ver", "int")],
        bucket_col="k",
        num_buckets=4,
        row_key="k",
        version_cols=["ver"],
    )
    # python mirror of the LIVE state after every commit
    cur: dict[str, int] = {}
    states = {t.manifest.version: dict(cur)}
    ver = 0
    for step in traj:
        if step == "compact":
            t = t.compact(spark)
        elif step == "rebucket":
            # layout evolution mid-trajectory: diffs across the width change
            # cannot bucket-prune but must stay value-exact
            t = t.rebucket(spark, 8 if t.manifest.num_buckets == 4 else 4)
        else:
            ver += 1
            rows = [(k, v, dele, ver) for k, v, dele in step]
            t = t.append_deltas(spark.createDataFrame(rows, SCHEMA))
            for k, v, dele in step:
                if dele:
                    cur.pop(k, None)
                else:
                    cur[k] = v
        states[t.manifest.version] = dict(cur)

    versions = sorted(states)
    v_from = data.draw(st.sampled_from(versions), label="from")
    v_to = data.draw(st.sampled_from([v for v in versions if v >= v_from]), label="to")

    got = {
        r["k"]: (r["_change_type"], r["val"])
        for r in t.read_changes(
            spark, v_from, v_to, exclude=["ver", "_deleted"], row_filter=_live
        ).collect()
    }
    old, new = states[v_from], states[v_to]
    want = {}
    for k in new.keys() - old.keys():
        want[k] = ("insert", new[k])
    for k in old.keys() - new.keys():
        want[k] = ("delete", old[k])
    for k in old.keys() & new.keys():
        if old[k] != new[k]:
            want[k] = ("update", new[k])
    assert got == want, f"interval v{v_from}->v{v_to}: {got} != {want}"
