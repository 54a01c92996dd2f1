"""Tests for the data-quality / profiling queries (queries/dq_ops.py).

The oracle gate (tools/check.py) proves DuckDB equivalence; these tests
pin the SEMANTICS independently — brute-force recomputation in pandas,
and a planted-violation fixture the expectations audit must catch.
"""

import os

import pandas as pd
import pytest

from watsondedupe_spark.queries import all_queries
from watsondedupe_spark.sources import read_table

Q = all_queries()


def test_profile_matches_direct_computation(spark, sf_dir):
    prof = {r["col_name"]: r.asDict() for r in Q["docs_profile"].spark(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").toPandas()
    assert set(prof) == {"doc_id", "text", "lang", "source", "n_chars"}
    for col, row in prof.items():
        assert row["n_rows"] == len(docs)
        assert row["n_nulls"] == int(docs[col].isna().sum())
        assert row["n_distinct"] == docs[col].nunique(dropna=True)
    assert prof["n_chars"]["min_val"] == str(int(docs["n_chars"].min()))
    assert prof["n_chars"]["max_val"] == str(int(docs["n_chars"].max()))
    assert prof["lang"]["min_val"] == docs["lang"].min()
    assert prof["text"]["min_val"] is None  # long columns: volume only
    assert prof["text"]["sum_len"] == int(docs["text"].str.len().sum())
    assert prof["doc_id"]["sum_len"] is None


def test_expectations_match_ground_truth_on_driver_data(spark, sf_dir):
    rows = {r["check_name"]: r["violations"] for r in Q["dq_expectations"].spark(spark, sf_dir).collect()}
    assert len(rows) == 8
    li = read_table(spark, sf_dir, "lineitem").toPandas()
    # the driver's synthetic lineitem reuses (orderkey, linenumber) pairs —
    # the audit must REPORT that, not assume cleanliness
    expect_li_dup = len(li) - len(li[["l_orderkey", "l_linenumber"]].drop_duplicates())
    assert rows.pop("lineitem_pk_unique") == expect_li_dup
    assert all(v == 0 for v in rows.values()), rows


def test_expectations_catch_planted_violations(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders").toPandas()
    lineitem = read_table(spark, sf_dir, "lineitem").toPandas()
    customer = read_table(spark, sf_dir, "customer").toPandas()

    # plant: 2 duplicate order keys, 1 dangling customer FK, 1 bad price,
    # 3 dangling lineitem FKs, 1 out-of-range quantity
    orders.loc[orders.index[1], "o_orderkey"] = orders.loc[orders.index[0], "o_orderkey"]
    orders.loc[orders.index[2], "o_orderkey"] = orders.loc[orders.index[0], "o_orderkey"]
    orders.loc[orders.index[3], "o_custkey"] = customer["c_custkey"].max() + 999
    orders.loc[orders.index[4], "o_totalprice"] = -1.0
    dangling = lineitem["l_orderkey"].max() + 12345
    lineitem.loc[lineitem.index[:3], "l_orderkey"] = dangling
    lineitem.loc[lineitem.index[5], "l_quantity"] = 99.0

    bad_dir = str(tmp_path / "planted")
    os.makedirs(bad_dir)
    for name, pdf in (("orders", orders), ("lineitem", lineitem), ("customer", customer)):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{bad_dir}/{name}.parquet")

    got = {
        r["check_name"]: r["violations"]
        for r in Q["dq_expectations"].spark(spark, bad_dir).collect()
    }
    assert got["orders_pk_unique"] == 2
    assert got["orders_fk_customer"] == 1
    assert got["orders_price_positive"] == 1
    # the 3 relabeled lineitem rows share (dangling, l_linenumber)? they keep
    # distinct linenumbers within their original orders, so only exact
    # (orderkey, linenumber) collisions count — recompute the expectation
    expect_li_dup = len(lineitem) - len(lineitem[["l_orderkey", "l_linenumber"]].drop_duplicates())
    assert got["lineitem_pk_unique"] == expect_li_dup
    # overwriting two o_orderkey values above also orphans their lineitems
    expect_fk = int((~lineitem["l_orderkey"].isin(orders["o_orderkey"])).sum())
    assert expect_fk >= 3
    assert got["lineitem_fk_orders"] == expect_fk
    assert got["lineitem_qty_in_range"] == 1


def test_mad_outliers_match_brute_force(spark, sf_dir):
    out = {r["event_type"]: r.asDict() for r in Q["events_mad_outliers"].spark(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").toPandas()
    ev["v"] = (ev["value"] * 100).round().astype("int64")
    for etype, grp in ev.groupby("event_type"):
        v = grp["v"].sort_values().to_numpy()
        n = len(v)
        med = int(v[(n + 1) // 2 - 1])  # lower median (1-indexed k=(n+1)//2)
        d = pd.Series(abs(grp["v"] - med)).sort_values().to_numpy()
        mad = int(d[(n + 1) // 2 - 1])
        n_out = int((abs(grp["v"] - med) > 3 * mad).sum())
        row = out[etype]
        assert row["med_cents"] == med, etype
        assert row["mad_cents"] == mad, etype
        assert row["n_events"] == n, etype
        assert row["n_outliers"] == n_out, etype
