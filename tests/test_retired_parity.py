"""The parity queries retired from the driver's 50-row correctness
window (round 5 — see ``__spark_entry__.RETIRED``) stay continuously
verified here: each runs on Spark AND its oracle SQL on DuckDB over the same
sf dir, compared by row count, column set, and the same order-insensitive
value hash the driver uses (tools/compare_oracle.py).

Coverage mapping (SURVEY.md §2): j3 → J3 right outer join
(``/root/reference/Sql Scripts/RestaurantDetails_Marta_v11_06152015.sql:109``),
j8 → J8 theta join on cast expression
(``/root/reference/Sql Scripts/DM_RESTAURANT_MOD.sql:6,41``), a10 → A10
weighted scoring projection
(``/root/reference/Sql Scripts/RestaurantDetails_Marta_v11_06152015.sql:254-260``),
p9 → P9 composite-tuple IN
(``/root/reference/Sql Scripts/SILVERPOP_USER_INCREMENTAL.sql:290-327``).
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tools.compare_oracle import TABLES, value_hash


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


def test_retired_set_is_exactly_the_documented_four():
    assert entrymod.RETIRED == {
        "j3_right_join",
        "j8_theta_join",
        "a10_weighted_score",
        "p9_composite_in",
    }


def test_driver_registry_is_exactly_50():
    qs = entrymod.queries()
    assert len(qs) == 50
    assert len(entrymod.oracle_sql()) == 50
    # the formerly window-excluded ANN variants are now inside the window
    for name in (
        "v3_embedding_neardup",
        "v4_knn_lsh_srp",
        "v5_knn_lsh_multiprobe",
        "d10_dedup_clusters",
    ):
        assert name in qs
    assert not entrymod.RETIRED & set(qs)


@pytest.mark.parametrize("name", sorted(entrymod.RETIRED))
def test_retired_query_matches_oracle(spark, duck, name):
    fn = entrymod.all_queries()[name]
    sql = entrymod.all_oracle_sql()[name]
    sdf = fn(spark, SF_SMOKE)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows)
    assert sorted(scols) == sorted(dcols)
    assert value_hash(srows, scols) == value_hash(drows, dcols)
