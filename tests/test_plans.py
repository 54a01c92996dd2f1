"""Plan audits: the physical plans of headline queries must keep the
shapes that survive 100 TB — broadcast dims, pushed filters, pruned
scans, partial aggregation, no cartesian blowups. A regression that
flips one of these fails here, not on the cluster."""

from pyspark.sql import functions as F

from watsondedupe_spark import plans as P
from watsondedupe_spark.queries import all_queries


def q(name, spark, sf_dir):
    return all_queries()[name].spark(spark, sf_dir)


def test_tpch_q3_broadcasts_dims_and_pushes_filters(spark, sf_dir):
    df = q("tpch_q3_topk", spark, sf_dir)
    assert P.uses_broadcast_join(df)
    assert not P.has_cartesian(df)
    # the date/segment filters must reach the parquet scans
    pf = " ".join(P.pushed_filters(df)).lower()
    assert "l_shipdate" in pf and "c_mktsegment" in pf


def test_tpch_q1_partial_agg_and_pruned_scan(spark, sf_dir):
    df = q("tpch_q1_pricing", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert not P.has_cartesian(df)
    # lineitem has 16 columns; Q1 needs 7 — scan must not read them all
    assert P.max_scan_width(df) <= 8
    # codegen ids only annotate the finalized adaptive plan
    df.collect()
    assert P.codegen_span_count(df) >= 1


def test_region_revenue_no_cartesian_single_agg_shuffle(spark, sf_dir):
    df = q("tpch_q5_region_revenue", spark, sf_dir)
    assert not P.has_cartesian(df)
    assert P.has_partial_aggregation(df)


def test_minhash_joins_on_band_buckets_not_all_pairs(spark, sf_dir):
    df = q("docs_minhash_pairs", spark, sf_dir)
    # LSH candidate generation must be an equi-join on the band key;
    # a cartesian/nested-loop here is the all-pairs explosion LSH exists
    # to avoid
    assert not P.has_cartesian(df)


def test_jaccard_self_join_is_equi_join(spark, sf_dir):
    df = q("docs_jaccard_pairs", spark, sf_dir)
    assert not P.has_cartesian(df)


def test_point_lookup_pushes_key_filter(spark, sf_dir):
    df = q("ddp_point_lookup", spark, sf_dir)
    assert not P.has_cartesian(df)


def test_audit_shape(spark, sf_dir):
    report = P.audit(q("join_left_agg", spark, sf_dir))
    assert set(report) == {
        "broadcast_joins",
        "shuffle_joins",
        "cartesian",
        "shuffles",
        "pushed_filters",
        "scan_widths",
        "partial_agg",
        "codegen_spans",
    }
    assert report["cartesian"] is False


def test_engine_get_plan_broadcasts_map_side(spark, tmp_path):
    """The O6 reassembly join must broadcast the (tiny) filtered map into
    the chunk_store scan — never shuffle the payload table."""
    from watsondedupe_spark.chunking import ChunkSettings
    from watsondedupe_spark.engine import DedupeEngine

    eng = DedupeEngine.create(spark, str(tmp_path / "ix"), ChunkSettings(2048, 16384, 128, 2))
    eng.write("k", b"xy" * 20000)
    pieces = eng.chunk_store.join(
        F.broadcast(eng.object_map.filter(F.col("object_key") == "k")), "chunk_key"
    )
    assert P.uses_broadcast_join(pieces)
    assert not P.has_shuffle_join(pieces)


def test_ann_buckets_plan_has_no_shuffle(spark, sf_dir):
    """The sign-LSH bucketing is row-local array math — any Exchange
    appearing here means the explode/join formulation regressed in."""
    df = q("emb_ann_buckets", spark, sf_dir)
    report = P.audit(df)
    assert report["shuffles"] == 0
    assert report["shuffle_joins"] == 0


def test_knn_broadcasts_query_vectors(spark, sf_dir):
    """Brute-force kNN must broadcast the (tiny) query-vector side; the
    candidate scan must never shuffle on dimension rows."""
    df = q("emb_knn_cosine", spark, sf_dir)
    report = P.audit(df)
    # the only exchanges allowed are the two top-k window sorts
    assert report["shuffle_joins"] == 0
    assert report["shuffles"] <= 2


def test_minhash_band_joins_are_broadcast_at_test_scale(spark, sf_dir):
    df = q("docs_minhash_pairs", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    # band-bucket equi-joins; at sf-test the sig side broadcasts
    assert report["broadcast_joins"] >= 1 or report["shuffle_joins"] >= 1
