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
    # banded single-join shape: band structs explode into (bk, bv) rows
    # and ONE composite-key self-join produces every band's candidates —
    # the n_bands separate self-joins + unionAll shape would show here
    # as multiple join nodes (and an n_bands x shuffle multiplier).
    # (count on the simple plan: the formatted plan repeats each node
    # name in its details section)
    import re

    assert (
        len(re.findall(r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin", P.simple_plan(df)))
        == 1
    )


def test_q2_decorrelated_min_broadcasts_dims(spark, sf_dir):
    """Q2's correlated MIN is a window over one (l_partkey) partitioning;
    dims broadcast. A self-join re-shuffle of the cost table here is the
    decorrelation regression this pins against."""
    df = q("tpch_q2_min_cost_supplier", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert report["broadcast_joins"] >= 3  # supplier, nation, region, part


def test_q7_dual_alias_nation_broadcasts(spark, sf_dir):
    df = q("tpch_q7_nation_volume", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert report["partial_agg"]
    pf = " ".join(report["pushed_filters"]).lower()
    assert "l_shipdate" in pf


def test_q13_left_join_keeps_partial_agg_and_pruned_scans(spark, sf_dir):
    df = q("tpch_q13_order_count_distribution", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert report["partial_agg"]
    # orders scan: o_custkey + o_orderkey + o_orderpriority of 6 cols
    assert P.max_scan_width(df) <= 3


def test_q21_window_decorrelation_no_self_join(spark, sf_dir):
    """Q21's EXISTS / NOT EXISTS pair collapses into window aggregates —
    the plan must contain no extra join of pair-with-pair."""
    df = q("tpch_q21_waiting_supplier", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert report["broadcast_joins"] >= 1  # supplier + nation sides
    assert report["shuffle_joins"] == 0  # pair never self-joins
    # pair agg, window repartition, s_name agg (+AQE reads); never the
    # 5+ exchanges a dual self-join formulation would cost
    assert report["shuffles"] <= 4


def test_funnel_stages_share_user_partitioning(spark, sf_dir):
    df = q("events_funnel_conversion", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert report["partial_agg"]


def test_stratified_sample_is_shuffle_free(spark, sf_dir):
    """Hash-gated sampling is a pure scan-filter — any Exchange is a bug."""
    df = q("docs_stratified_sample", spark, sf_dir)
    report = P.audit(df)
    assert report["shuffles"] == 0
    assert report["cartesian"] is False


def test_bm25_corpus_stats_broadcast_one_row(spark, sf_dir):
    """The corpus-stats side is one row: it must arrive by broadcast
    (nested-loop over a 1-row build side is free), never by shuffle."""
    df = q("docs_bm25_lite", spark, sf_dir)
    report = P.audit(df)
    assert report["shuffle_joins"] == 0
    assert P.count_occurrences(df, r"BroadcastNestedLoopJoin") >= 1
    assert report["shuffles"] <= 1  # the stats aggregate's single reduce


def test_lsh_levenshtein_candidates_are_equi_joins(spark, sf_dir):
    """Candidates must come from band-bucket equi-joins; the Levenshtein
    verify runs per candidate row, never as a join predicate."""
    df = q("docs_lsh_levenshtein", spark, sf_dir)
    assert not P.has_cartesian(df)


def test_bloom_semi_prunes_fact_scan_before_shuffle(spark, sf_dir):
    """The Bloom membership test must sit in the lineitem scan stage
    (a Filter below the join), and the exact verify must not degenerate
    to a cartesian."""
    df = q("bloom_semi_revenue", spark, sf_dir)
    plan = P.physical_plan(df)
    assert "element_at" in plan  # the bit-array probe made it into a Filter
    assert not P.has_cartesian(df)
    assert P.has_partial_aggregation(df)


def test_cube_expands_grouping_sets_in_one_shuffle(spark, sf_dir):
    """CUBE must expand map-side: one Expand + one Exchange, not one
    shuffle per grain."""
    df = q("cube_orders_status_year", spark, sf_dir)
    assert P.count_occurrences(df, r"\bExpand\b") >= 1
    assert P.shuffle_count(df) <= 1
    assert P.has_partial_aggregation(df)


def test_salted_distinct_bounds_per_task_state(spark, sf_dir):
    """Bounded shuffle chain: the (type,salt,user) dedup exchange Spark
    expands count_distinct into, the per-salt partial, and the merge —
    every one keyed and map-side-combined; no single-task global
    aggregation of raw values."""
    df = q("events_distinct_users_salted", spark, sf_dir)
    assert P.shuffle_count(df) <= 3
    assert P.has_partial_aggregation(df)


def test_cms_probe_is_broadcast(spark, sf_dir):
    """The sketch side is bounded (depth*width); probing must broadcast
    it, never shuffle the token stream against it."""
    df = q("docs_token_freq_cms", spark, sf_dir)
    assert P.uses_broadcast_join(df)


def test_dup_spans_shuffles_on_gram_and_doc_only(spark, sf_dir):
    """Duplicate-span detection must join occurrences to multi-doc grams
    on the gram hash (equi-join) and do the island merge partitioned by
    doc_id — no cartesian, partial agg on the gram count, and the whole
    chain bounded to: gram-count exchange, join probe exchange(s), and
    the per-doc window/rollup exchange."""
    df = q("docs_dup_spans", spark, sf_dir)
    assert not P.has_cartesian(df)
    assert P.has_partial_aggregation(df)
    # 6th exchange (round-7): the occurrence->dup join is pinned
    # shuffle-hash — the dup-gram set grows with the corpus, and its
    # AQE-chosen broadcast was a 1.1 GB driver-side hashed relation at
    # the 100x tier. One extra probe-side exchange on the uniform gram
    # hash is the deliberate price; broadcast here must NOT come back.
    assert P.shuffle_count(df) <= 6
    assert "BroadcastHashJoin" not in P.physical_plan(df)


def test_mixture_sample_broadcasts_rate_table(spark, sf_dir):
    """The per-source rate table is one row per source: the corpus-side
    join must be a broadcast, so the documents scan is never shuffled."""
    df = q("docs_mixture_sample", spark, sf_dir)
    assert P.uses_broadcast_join(df)
    # the 1-row totals broadcast is a BroadcastNestedLoopJoin by design
    # (see the salted-distinct note), so bound the shuffles instead of
    # asserting no-cartesian: only the tiny per-source aggregates may
    # exchange — the corpus scan itself must not
    assert P.shuffle_count(df) <= 3


def test_semantic_dedup_pairs_join_on_cluster_key(spark, sf_dir):
    """SemDeDup's quadratic term must be confined to clusters: the pair
    join is an equi-join on centroid_id. (The 1-row centroid broadcast
    fan-out is a BroadcastNestedLoopJoin by design — see has_cartesian
    note in the skew tests — so assert the pair join specifically.)"""
    df = q("emb_semantic_dedup", spark, sf_dir)
    plan = P.physical_plan(df)
    assert "centroid_id" in plan
    # the anti join that applies the drop set must be hash-based
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_profile_is_single_scan_single_expand(spark, sf_dir):
    """The profiler's contract is ONE pass: one parquet scan of
    documents feeding one Expand-based multi-distinct aggregation — not
    a scan per column."""
    df = q("docs_profile", spark, sf_dir)
    plan = P.physical_plan(df)
    assert P.scan_count(df) == 1
    assert "Expand" in plan
    assert P.has_partial_aggregation(df)


def test_mad_outliers_scan_raw_events_once(spark, sf_dir):
    """Median, MAD, and the outlier count all derive from one value
    histogram: the raw events table must be scanned exactly once, and
    the med/mad joins back onto the histogram must broadcast."""
    df = q("events_mad_outliers", spark, sf_dir)
    df.collect()
    assert P.executed_scan_count(df) == 1
    assert P.count_occurrences(df, r"ReusedExchange|ReusedQueryStage") >= 1
    assert P.uses_broadcast_join(df)


def test_heavy_hitters_prune_probe_is_broadcast(spark, sf_dir):
    """The sketch-guided prune must reach the token stream as a
    broadcast probe (no shuffle of tokens to meet the cell table), and
    the only exchanges that run are bounded aggregations (sketch cells,
    n_total scalar, surviving-cell list, final token counts) plus the
    scan-parallelism repartition — the token stream itself is exploded
    once and its exchange reused by the sketch-build side."""
    df = q("docs_heavy_hitters", spark, sf_dir)
    df.collect()
    assert P.uses_broadcast_join(df)
    assert P.executed_scan_count(df) == 1
    assert P.executed_shuffle_count(df) <= 5


def test_incremental_dedup_broadcasts_new_batch(spark, sf_dir):
    """The new-arrivals band keys must reach the corpus signature stream
    as broadcast build sides — the corpus is never shuffled on band keys
    and never self-joined, so cost scales with the increment."""
    df = q("docs_incremental_dedup", spark, sf_dir)
    assert P.count_occurrences(df, r"BroadcastHashJoin") >= 2
    assert not P.has_cartesian(df)


def test_near_dup_pairs_shuffles_on_bucket_only(spark, sf_dir):
    """The LSH-first near-dup shape with the ENFORCED memory bound: the
    corpus shuffles once into the Arrow matmul groups (keyed by bucket +
    salted sub-bucket pair), the bucket-size side is a tiny aggregate
    that BROADCASTS back (never a corpus shuffle), the pair expansion
    happens inside the group (no joins on pair rows), and certainly no
    cartesian blowup. The size pre-pass costs one extra narrow parquet
    scan — deliberately cheaper at scale than the alternative (a second
    full shuffle of the embedding column through a count window)."""
    df = q("emb_near_dup_pairs", spark, sf_dir)
    assert not P.has_cartesian(df)
    assert P.scan_count(df) <= 2
    assert P.uses_broadcast_join(df)  # sizes ride back as a broadcast
    df.collect()
    # the corpus-weight shuffle is the applyInPandas grouping; the only
    # other exchange is the tiny bucket-size aggregate
    assert P.executed_shuffle_count(df) <= 2
    # formatted plans repeat operators across Final/Initial sections
    assert P.count_occurrences(df, "FlatMapGroupsInPandas") >= 1


def test_simhash_is_one_scan_one_shuffle(spark, sf_dir):
    """SimHash fingerprint BUILD: explode + a single groupBy(id)
    aggregation carrying all 60 bit votes — one scan, one shuffle,
    partial aggregation map-side, everything JVM-side (no Python
    stages). The registered query serves the build from a per-session
    cache (engine_native._simhash_fp), so the build plan is pinned on
    the operator directly."""
    from watsondedupe_spark.operators.dedupe import simhash60_md5

    df = simhash60_md5(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "text", "doc_id"
    )
    assert P.scan_count(df) == 1
    assert P.has_partial_aggregation(df)
    plan = P.physical_plan(df)
    assert "InPandas" not in plan and "BatchEvalPython" not in plan
    df.collect()
    assert P.executed_shuffle_count(df) <= 1
    # the query-level entry reads the checkpointed fingerprint table —
    # the 60-vote aggregation never re-runs per consumer
    cached = q("docs_simhash", spark, sf_dir)
    assert "ExistingRDD" in P.physical_plan(cached)


def test_pq_topk_reads_codes_only_single_pass(spark, sf_dir):
    """PQ/ADC top-k: after encoding, scoring reads ONLY the code column
    in one fused Arrow pass serving every query; the sole shuffle is the
    per-query top-k window."""
    df = q("emb_ann_topk_pq", spark, sf_dir)
    assert not P.has_cartesian(df)
    assert P.scan_count(df) == 1
    df.collect()
    assert P.executed_shuffle_count(df) <= 2  # repartition-for-encode + window


def test_passage_chunks_plan_is_shuffle_free(spark, sf_dir):
    """Pure per-row array ops: one parquet scan, zero exchanges, and the
    scan reads only (doc_id, text)."""
    df = q("docs_passage_chunks", spark, sf_dir)
    assert P.shuffle_count(df) == 0
    assert not P.has_cartesian(df)
    assert P.scan_count(df) == 1
    assert all(set(s) <= {"doc_id", "text"} for s in P.scan_read_schemas(df))


def test_ivfpq_probe_join_is_broadcast_no_cartesian(spark, sf_dir):
    """The probe list must broadcast onto the code table (the corpus
    side never shuffles for the join), and nothing degenerates into a
    cartesian/nested-loop product."""
    df = q("emb_ann_topk_ivfpq", spark, sf_dir)
    assert P.uses_broadcast_join(df)
    assert not P.has_cartesian(df)
    # the only shuffles allowed: the repartition for Arrow parallelism
    # and the final per-query top-k rank window
    assert not P.has_shuffle_join(df)


def test_ingest_id_assignment_is_distributed(spark, sf_dir):
    """write_batch's ingest-sequence ids must come from the two-phase
    prefix scan: a range-partitioned order shuffle, per-partition rank
    windows, broadcast base offsets — never a bare Window.orderBy that
    funnels the whole batch's object rollups through ONE task. The only
    SinglePartition stage allowed is the per-partition totals prefix
    (#partitions rows)."""
    from watsondedupe_spark.engine import assign_ingest_ids

    rolled = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy(F.col("doc_id").cast("string").alias("object_key"))
        .agg(F.count("*").cast("long").alias("chunk_count"))
    )
    df = assign_ingest_ids(rolled, 100)
    plan = P.physical_plan(df).lower()
    assert "rangepartitioning" in plan  # parallel order shuffle
    assert P.uses_broadcast_join(df)  # base offsets broadcast back
    assert plan.count("singlepartition") <= 1  # only the totals prefix

    # value contract: prev_max + 1-based object_key rank, deterministic
    got = df.orderBy("id").select("object_key", "id").collect()
    keys = sorted(r.object_key for r in got)
    assert [r.object_key for r in got] == keys
    assert [r.id for r in got] == list(range(101, 101 + len(keys)))


def test_series_knn_topk_is_take_ordered(spark, sf_dir):
    """The exact top-k must be a distributed TakeOrderedAndProject
    (per-partition heads merged), with the rank window running over only
    the <=k survivors — never a bare global rank window that serializes
    the whole per-user distance set through one task."""
    df = q("events_series_knn", spark, sf_dir)
    plan = P.physical_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_dsir_model_is_broadcast_with_partial_agg(spark, sf_dir):
    """The DSIR bucket model (<= 256 rows) and the 1-row totals must
    broadcast onto the per-doc scoring aggregation; the count builds
    must partially aggregate (the map-side combine is what collapses a
    100 TB gram stream to 256 cells per task)."""
    df = q("docs_dsir_weights", spark, sf_dir)
    assert P.uses_broadcast_join(df)
    assert P.has_partial_aggregation(df)


def test_ivfpq_refined_fetch_is_broadcast(spark, sf_dir):
    """The refine stage must broadcast the bounded (query, candidate)
    shortlist onto the corpus scan — the corpus itself never shuffles
    for the exact re-rank, and nothing degenerates to a cartesian."""
    df = q("emb_ann_topk_ivfpq_refined", spark, sf_dir)
    assert P.uses_broadcast_join(df)
    assert not P.has_cartesian(df)
    assert not P.has_shuffle_join(df)
    # the refine stage adds ZERO Python/Arrow passes on top of the plain
    # IVF-PQ pipeline — its exact math is all JVM-side zip_with/aggregate
    plain = q("emb_ann_topk_ivfpq", spark, sf_dir)
    assert P.physical_plan(df).count("MapInPandas") == P.physical_plan(
        plain
    ).count("MapInPandas")


def test_token_budget_mix_rates_broadcast_no_corpus_shuffle_join(spark, sf_dir):
    """The per-source rate table (one row per source) must BROADCAST
    onto the gated corpus pass — at 100 TB the corpus is only ever
    map-scanned, never shuffled for the admission join; the stats pass
    must partially aggregate (map-side combine into |sources| cells)."""
    df = q("docs_token_budget_mix", spark, sf_dir)
    assert P.uses_broadcast_join(df)
    assert not P.has_shuffle_join(df)
    assert not P.has_cartesian(df) or P.uses_broadcast_join(df)
    assert P.has_partial_aggregation(df)


def test_dup_weighting_sizes_join_is_keyed_no_cartesian(spark, sf_dir):
    """Cluster sizes join back to the membership table on cluster_id —
    a keyed join (no cartesian), and the size rollup partially
    aggregates before its shuffle."""
    df = q("docs_dup_weighting", spark, sf_dir)
    assert not P.has_cartesian(df)
    assert P.has_partial_aggregation(df)


def test_hashed_linear_score_weights_broadcast(spark, sf_dir):
    """The 4096-row weight table must BROADCAST onto the exploded token
    stream — model inference never shuffles the corpus for the weight
    lookup; the per-doc score rollup partially aggregates (map-side
    combine before the doc_id shuffle)."""
    df = q("docs_hashed_linear_score", spark, sf_dir)
    assert P.uses_broadcast_join(df)
    assert not P.has_shuffle_join(df)
    assert P.has_partial_aggregation(df)


def test_repetition_schedule_single_pass_broadcast_totals(spark, sf_dir):
    """One partial-agg corpus pass; the 1-row totals broadcast onto the
    per-source table (a broadcast nested loop over one row, never a
    corpus-wide cartesian)."""
    df = q("docs_repetition_schedule", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert not P.has_shuffle_join(df)


def test_zorder_morton_codes_row_local(spark, sf_dir):
    """The Morton interleave is static bit arithmetic: zero joins, zero
    shuffles, zero Python — one scan, one codegen span."""
    df = q("zorder_morton_codes", spark, sf_dir)
    plan = P.physical_plan(df)
    assert P.shuffle_count(df) == 0
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert P.scan_count(df) == 1


def test_blobgen_source_declares_parallelism(spark, sf_dir):
    """The custom data source must fan its range out across the declared
    partitions — generation is worker-side, not a single-task scan."""
    from watsondedupe_spark.sources.blobgen import BlobGenDataSource

    try:
        spark.dataSource.register(BlobGenDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("blobgen")
        .option("n", 640).option("parts", 8).option("blob_bytes", 256)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 640


def test_observed_funnel_cascade_plan(spark, sf_dir):
    """One CollectMetrics node per stage rides the single corpus pass:
    no shuffle, no join — the counters must be free at 100 TB."""
    from watsondedupe_spark.queries.pipeline_ext import observed_funnel_cascade
    from watsondedupe_spark.sources import read_table

    staged, obs = observed_funnel_cascade(read_table(spark, sf_dir, "documents"))
    plan = P.physical_plan(staged)
    assert plan.lower().count("collectmetrics") >= 4
    assert P.shuffle_count(staged) == 0
    assert not P.has_cartesian(staged)


def test_tfidf_topk_plan_shapes(spark, sf_dir):
    """tf must partial-aggregate map-side; the only nested-loop join is
    the 1-row corpus-size broadcast; the scan reads just (doc_id, text)."""
    df = q("docs_tfidf_topk", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.uses_broadcast_join(df)
    assert P.max_scan_width(df) <= 2


def test_source_overlap_minhash_plan(spark, sf_dir):
    """Both arms aggregate before any pair join, the sources^2 join is
    a broadcast, and the documents scans stay 2 columns wide."""
    df = q("docs_source_overlap_minhash", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.uses_broadcast_join(df)
    assert P.max_scan_width(df) <= 2


def test_label_centroid_sim_plan(spark, sf_dir):
    """One corpus pass with map-side combine feeding a cached sig table;
    the labels^2 non-equi pair join is a broadcast nested-loop over that
    tiny side (never a shuffle); the scan reads only (embedding, label)."""
    df = q("emb_label_centroid_sim", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert "broadcastnestedloopjoin" in P.physical_plan(df).lower()
    assert P.max_scan_width(df) <= 2
    # BNLJ-of-broadcast-tiny-side is the point; what must NOT appear is
    # an unbroadcast all-pairs product.
    assert P.count_occurrences(df, r"CartesianProduct") == 0


def test_matryoshka_recall_plan(spark, sf_dir):
    """All three arms broadcast the tiny query/dim sides (no shuffle
    join of the corpus against them), the salted two-phase top-k keeps
    partial aggregation, and the scans stay 2 columns wide."""
    df = q("emb_matryoshka_recall", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.max_scan_width(df) <= 2
    assert P.count_occurrences(df, r"CartesianProduct") == 0


def test_ivf_balance_audit_plan(spark, sf_dir):
    """Assignment is the shuffle-free Arrow kernel: the only exchange is
    the 16-key cell aggregate; the 1-row total arrives by broadcast."""
    df = q("emb_ivf_balance_audit", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    report = P.audit(df)
    assert report["shuffle_joins"] == 0


def test_top_pc_power_plan(spark, sf_dir):
    """One corpus pass: posexplode + partial agg means the 64-key shuffle
    carries 64 rows per partition; the 1-row maxabs arrives by broadcast."""
    df = q("emb_top_pc_power", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.audit(df)["shuffle_joins"] == 0
    assert P.max_scan_width(df) <= 2


def test_watermark_lateness_plan(spark, sf_dir):
    """The running max is the two-phase prefix scan: the corpus-sized
    window is partitioned by block (shuffled on block, never collapsed to
    one partition), and the tiny block-prefix table joins by broadcast."""
    df = q("events_watermark_lateness", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.uses_broadcast_join(df)
    assert P.audit(df)["shuffle_joins"] == 0
    plan = P.physical_plan(df)
    # the only SinglePartition exchanges feed the block-level prefix
    # window and the 1-row total — never the event-level window
    import re
    assert len(re.findall(r"Exchange SinglePartition", plan)) <= 2


def test_quality_dup_corr_plan(spark, sf_dir):
    """The 6-moment aggregate collapses map-side; corpus text never joins
    into a shuffle wider than (doc_id, tokens)."""
    df = q("docs_quality_dup_corr", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 2


def test_ivf_probe_sweep_plan(spark, sf_dir):
    """Three bounded arms: the list probes join by broadcast of the
    query sample, and no arm degenerates into a cartesian corpus scan.
    (The exact-vs-approx comparison joins are <= 30-row sets — their
    physical strategy is immaterial, so it is not pinned.)"""
    df = q("emb_ivf_probe_sweep", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.uses_broadcast_join(df)


def test_jl_recall_plan(spark, sf_dir):
    """Projection is row-local (no shuffle to sketch); the kNN arm
    broadcasts the 3-query sample; nothing degenerates into a
    corpus x corpus cartesian."""
    df = q("emb_jl_recall", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 2


def test_oov_rate_plan(spark, sf_dir):
    """Vocab probe arrives by broadcast; both aggregations keep their
    map-side partial phase; no shuffle join of the token stream."""
    df = q("docs_oov_rate", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.uses_broadcast_join(df)
    assert P.audit(df)["shuffle_joins"] == 0
    assert P.count_occurrences(df, r"CartesianProduct") == 0


def test_partitioned_probe_prunes_partitions(spark, sf_dir):
    """The probe scan must carry the centroid_id partition predicate —
    partition pruning is THE point of the persisted layout (at 100 TB
    this is the difference between reading n_probe lists and the whole
    corpus)."""
    df = q("emb_ann_partitioned_probe", spark, sf_dir)
    plan = P.physical_plan(df)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1) and "IN" in m.group(1).upper()
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.uses_broadcast_join(df)


def test_label_impurity_plan(spark, sf_dir):
    """The pair join is keyed by bucket (equi-join, never cartesian) and
    the per-label counts keep their map-side partial phase."""
    df = q("emb_label_impurity", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert not P.has_cartesian(df)
    assert P.max_scan_width(df) <= 3


def test_collocation_lift_plan(spark, sf_dir):
    """Both count passes keep map-side partials; the unigram lookups run
    against the 20-row top-k side; no cartesian."""
    df = q("docs_collocation_lift", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 1


def test_attribution_plan(spark, sf_dir):
    """The carry is one window over the user-keyed union — no join at
    all between purchases and touches, no cartesian, and the channel
    rollup keeps its partial phase."""
    df = q("events_attribution", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert not P.has_cartesian(df)
    assert P.audit(df)["shuffle_joins"] == 0


def test_pq_distortion_plan(spark, sf_dir):
    """One corpus pass against the cached code table: the codebook rides
    as a literal (no join for it), the 8-key rollup keeps its partial
    phase, nothing goes cartesian."""
    df = q("emb_pq_distortion", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0


def test_sq8_recall_plan(spark, sf_dir):
    """The per-dim min/max is one partial-aggregated corpus pass joined
    back by 1-row broadcast (no explode shuffle); the query side
    broadcasts; scans stay 2 columns wide; no cartesian fan-out
    survives (both crossJoins are broadcast-of-tiny)."""
    df = q("emb_sq8_recall", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.max_scan_width(df) <= 2
    assert P.count_occurrences(df, r"CartesianProduct") == 0


def test_hard_negatives_plan(spark, sf_dir):
    """The probe set broadcasts (crossJoin of tiny side), the label
    inequality filters BEFORE the rank windows, the salted two-phase
    top-k keeps partial ranking, and scans stay 2 columns wide."""
    df = q("emb_hard_negatives", spark, sf_dir)
    assert P.max_scan_width(df) <= 2
    assert P.count_occurrences(df, r"CartesianProduct") == 0


def test_token_fertility_plan(spark, sf_dir):
    """One corpus pass: row-local regex counts then a (lang, source)
    partial agg — text itself never shuffles, no joins at all."""
    df = q("docs_token_fertility", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert report["shuffles"] <= 1
    assert report["shuffle_joins"] == 0 and report["broadcast_joins"] == 0


def test_dau_wau_plan(spark, sf_dir):
    """Raw events dedup once at (day, user) grain; the window fan-out is
    the bounded 7-day explode joined to the broadcast day spine — never
    a range join of events against events; aggs keep partials."""
    df = q("events_dau_wau", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert report["cartesian"] is False
    assert P.uses_broadcast_join(df)
    assert P.max_scan_width(df) <= 2


def test_weighted_sample_plan(spark, sf_dir):
    """One scan with row-local hash arithmetic into a distributed
    TakeOrdered — the corpus never shuffles; the only window runs over
    the k surviving rows."""
    df = q("docs_weighted_sample", spark, sf_dir)
    assert P.count_occurrences(df, r"TakeOrderedAndProject") >= 1
    assert P.max_scan_width(df) <= 3
    report = P.audit(df)
    assert report["cartesian"] is False
    assert report["shuffle_joins"] == 0


def test_scd2_intervals_plan(spark, sf_dir):
    """Both window phases share one per-user partitioning — the log
    shuffles once; the user_id filter reaches the scan."""
    df = q("events_scd2_intervals", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert report["shuffles"] <= 1
    pf = " ".join(report["pushed_filters"]).lower()
    assert "user_id" in pf


def test_quality_calibration_plan(spark, sf_dir):
    """Score and source ride one scan (no join back to documents); the
    only exchange is the per-source window partitioning."""
    df = q("docs_quality_calibration", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert report["shuffle_joins"] == 0 and report["broadcast_joins"] == 0
    assert report["shuffles"] <= 1


def test_seasonal_anomaly_plan(spark, sf_dir):
    """The 168-row baseline joins back by broadcast — the fact table
    never shuffles for the join; both aggregates keep partials."""
    df = q("events_seasonal_anomaly", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert P.uses_broadcast_join(df)
    assert report["shuffle_joins"] == 0
    assert report["partial_agg"]


def test_rfm_segments_plan(spark, sf_dir):
    """Thresholds reduce through a partial-aggregable percentile and
    come back as a 1-row broadcast; the orders scan shuffles once for
    the per-customer agg; no unpartitioned window sort anywhere."""
    df = q("orders_rfm_segments", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    # the threshold side is ONE row arriving by broadcast nested-loop —
    # free; what must not appear is a CartesianProduct of real tables
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.count_occurrences(df, r"BroadcastNestedLoopJoin") >= 1
    assert report["shuffle_joins"] == 0
    assert P.count_occurrences(df, r"Window") == 0
    assert P.max_scan_width(df) <= 3


def test_market_basket_plan(spark, sf_dir):
    """The pair join is keyed on the order (equi-join, bounded per-basket
    fan-out), counts keep partials, and the top-k is a distributed
    TakeOrdered — never a global sort of all pairs."""
    df = q("lineitem_market_basket", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.count_occurrences(df, r"TakeOrderedAndProject") >= 1
    assert P.max_scan_width(df) <= 2


def test_skyline_plan(spark, sf_dir):
    """Sort-based skyline: two window specs over one brand partitioning,
    zero joins of any kind — never the quadratic dominance self-join."""
    df = q("part_skyline_by_brand", spark, sf_dir)
    report = P.audit(df)
    assert report["shuffle_joins"] == 0 and report["broadcast_joins"] == 0
    assert report["cartesian"] is False
    assert P.max_scan_width(df) <= 4


def test_minhash_bbit_plan(spark, sf_dir):
    """Joins stay on the bounded candidate-pair set (equi-joins on
    doc ids), bit extraction is row-local — no cartesian, no widening
    of the corpus scan."""
    df = q("docs_minhash_bbit", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert P.max_scan_width(df) <= 2


def test_simhash_accuracy_plan(spark, sf_dir):
    """The exact arm joins the bounded candidate set to per-doc token
    arrays by id and intersects row-locally — tokens never explode into
    posting lists, so no token-keyed self-join appears."""
    df = q("docs_simhash_accuracy", spark, sf_dir)
    report = P.audit(df)
    assert report["cartesian"] is False
    assert P.max_scan_width(df) <= 2


def test_conversion_latency_plan(spark, sf_dir):
    """One user-keyed partial agg, then a single percentile reduce to
    one row — no windows, no joins."""
    df = q("events_conversion_latency", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert report["shuffle_joins"] == 0 and report["broadcast_joins"] == 0
    assert P.count_occurrences(df, r"Window") == 0
    assert P.max_scan_width(df) <= 3


def test_opq_distortion_plan(spark, sf_dir):
    """The permutation is a literal array re-index (no join introduces
    it); the audit is one code-table join + an 8-key partial agg — no
    cartesian of real tables."""
    df = q("emb_opq_distortion", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 3


def test_lsh_precision_recall_plan(spark, sf_dir):
    """Truth-vs-candidate comparison stays on the bounded pair sets
    (equi left join), thresholds broadcast, counts keep partials."""
    df = q("docs_lsh_precision_recall", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 2


def test_pq_adc_sdc_plan(spark, sf_dir):
    """The SDC distance table is a literal (no join builds it); the
    query codes broadcast; ranking keeps the salted two-phase shape;
    no cartesian of real tables."""
    df = q("emb_pq_adc_sdc", spark, sf_dir)
    report = P.audit(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 3


def test_abc_analysis_plan(spark, sf_dir):
    """No global sort of customers: thresholds reduce via partial-agg
    percentile, buckets are row-local comparisons, and the only window
    runs over the ten decile rows (post-aggregation)."""
    df = q("orders_abc_analysis", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert report["shuffle_joins"] == 0
    assert P.max_scan_width(df) <= 2


def test_burst_hours_plan(spark, sf_dir):
    """The trailing frame runs over the HOURLY ROLLUP (one partial agg
    first), never over raw events; no joins."""
    df = q("events_burst_hours", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert report["shuffle_joins"] == 0 and report["broadcast_joins"] == 0
    assert P.max_scan_width(df) <= 1


def test_activity_streaks_plan(spark, sf_dir):
    """Island window and both aggs share one user partitioning; raw
    events dedup once at (user, day) grain; no joins."""
    df = q("events_activity_streaks", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert report["shuffle_joins"] == 0 and report["broadcast_joins"] == 0
    assert P.max_scan_width(df) <= 2


def test_text_vs_embedding_dedup_plan(spark, sf_dir):
    """One equi full-outer join of the two bounded pair sets; no
    cartesian, narrow scans."""
    df = q("docs_text_vs_embedding_dedup", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 2


def test_bloom_fpr_audit_plan(spark, sf_dir):
    """The bit relation (bounded by m) broadcasts into the probe-side
    position join; doc_id parity filters reach the scans; counts keep
    partials."""
    df = q("docs_bloom_fpr_audit", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.uses_broadcast_join(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 2


def test_langid_confusion_plan(spark, sf_dir):
    """Scores and labels join once on doc_id; the language totals join
    back by broadcast; aggs keep partials."""
    df = q("docs_langid_confusion", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.uses_broadcast_join(df)
    assert P.count_occurrences(df, r"CartesianProduct") == 0


def test_vocab_coverage_curve_plan(spark, sf_dir):
    """Corpus text shuffles only into the token-count agg; the rank
    window and cut sums run over the vocabulary-sized relation; cuts
    and the total broadcast."""
    df = q("docs_vocab_coverage_curve", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert report["shuffle_joins"] == 0
    assert P.max_scan_width(df) <= 1


def test_mixture_diversity_plan(spark, sf_dir):
    """Two partial aggs on the (lang, source) grain; the per-lang totals
    broadcast; no corpus-wide shuffle beyond the first agg."""
    df = q("docs_mixture_diversity", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 2


def test_vector_quality_plan(spark, sf_dir):
    """Norms are row-local; the percentile bounds reduce to one row and
    come back by broadcast; one class rollup."""
    df = q("emb_vector_quality", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert report["shuffle_joins"] == 0
    assert P.max_scan_width(df) <= 2


def test_dedup_impact_audit_plan(spark, sf_dir):
    """The audit joins documents once against the canonical set and
    rolls up with partials; the per-source totals broadcast."""
    df = q("docs_dedup_impact_audit", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.uses_broadcast_join(df)


def test_length_ks_drift_plan(spark, sf_dir):
    """The corpus is touched by counting aggs only; ECDF windows run
    over the value-domain spine per source; the 1-row total broadcasts."""
    df = q("docs_length_ks_drift", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.count_occurrences(df, r"CartesianProduct") == 0
    assert P.max_scan_width(df) <= 2


def test_price_regression_plan(spark, sf_dir):
    """One moment pass with partials after a broadcast dim join —
    never per-group iteration; lineitem scan stays 3 columns."""
    df = q("lineitem_price_regression", spark, sf_dir)
    report = P.audit(df)
    assert report["partial_agg"]
    assert P.uses_broadcast_join(df)
    assert report["shuffle_joins"] == 0
    assert P.max_scan_width(df) <= 3


def test_cluster_repair_plan_bounded_no_cartesian(spark, sf_dir):
    """The repair's promise: the exact-Jaccard verify join and the
    re-CC are keyed joins over the flagged sets — no cartesian anywhere.
    Round-8 revision: the flagged-cluster id set is a FIXED FRACTION of
    clusters (corpus-growing), so it must ride shuffle-hash joins, never
    the round-7 F.broadcast() — the strict no-corpus-broadcast rule
    below pins that; here we keep the structural asserts."""
    df = q("docs_cluster_repair", spark, sf_dir)
    assert not P.has_cartesian(df)


def test_segmented_chunker_no_payload_window(spark, sf_dir):
    """Position restore must be the broadcast count-prefix join, not a
    window over chunk rows: a window spec over the payload-bearing
    output would re-shuffle every chunk byte on object_key (the round-7
    regression this pins against)."""
    from pyspark.sql import functions as F

    from watsondedupe_spark.chunking import ChunkSettings, SMALL_FILE_PROFILE, chunk_objects_segmented

    objs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(4)
        .select(
            F.col("doc_id").cast("string").alias("object_key"),
            F.encode(F.repeat("text", 40), "UTF-8").alias("data"),
        )
    )
    df = chunk_objects_segmented(objs, ChunkSettings(*SMALL_FILE_PROFILE), segment_size=32768)
    plan = P.physical_plan(df)
    # exactly one window, and it aggregates the per-frame COUNTS
    # (n_in_frame) — never the payload-bearing chunk rows (the round-7
    # regression: a row_number window over chunk_data re-shuffled every
    # chunk byte on object_key)
    import re

    assert plan.count(") Window") == 1, plan
    win_detail = re.search(r"\(\d+\) Window\n(.*?)\n\n", plan, re.S)
    assert win_detail and "n_in_frame" in win_detail.group(1), plan
    assert "chunk_data" not in win_detail.group(1)
    assert P.uses_broadcast_join(df), "count-prefix table must broadcast"
    assert not P.has_cartesian(df)
    df._cdc_cache.unpersist()


# ---------------------------------------------------------------------------
# The no-corpus-broadcast invariant (round 8) — a RULE, not pinned sites.
#
# Round 7's 100x deep tier caught three graded-green queries whose
# corpus-growing join sides were broadcast; round 8 generalizes: walk
# every BroadcastExchange subtree of the finalized (post-AQE) plan and
# fail unless the side is provably bounded (limit/top-k, bounded-key
# aggregate, point/sample filter, dims-only leaves) or — outside the
# strict families — anchored to a MEASURED shuffle/cache stage (an AQE
# conversion that self-disables as the corpus grows).
#
# The strict families are the corpus-pair machinery (dedup pairs/spans/
# clusters, drift/overlap audits): there even measured-anchored
# conversions are rejected, because the measured-bytes -> hashed-relation
# inflation (~10-30x) turns a <64 MB measured side into a ~1 GB driver
# relation at the wrong scale decade — exactly how round 7's dup-gram
# bug manifested. Their corpus-growing sides are pinned shuffle_hash;
# this test is what keeps the class extinct.
# ---------------------------------------------------------------------------

import pytest

# corpus-pair machinery: STRICT — no corpus-growing broadcast side at
# all, anchored or not (sides are pinned shuffle_hash)
STRICT_NO_BROADCAST = [
    "docs_minhash_pairs", "docs_jaccard_pairs", "docs_shingle_containment",
    "docs_dup_spans", "docs_strip_dup_spans", "docs_winnowing_pairs",
    "docs_lsh_precision_recall", "docs_lsh_levenshtein", "docs_minhash_bbit",
    "docs_simhash_accuracy", "docs_dup_clusters", "docs_cluster_repair",
    "docs_cluster_density_audit", "docs_dup_ratio_by_source",
    "docs_dedup_impact_audit", "docs_dup_graph_pagerank",
    "docs_decontaminate", "docs_text_vs_embedding_dedup",
    "emb_near_dup_pairs", "emb_semantic_dedup", "emb_mutual_knn_pairs",
    "docs_source_overlap_minhash", "docs_token_chi2_drift",
    "docs_length_ks_drift", "docs_incremental_dedup", "docs_ngram_novelty",
    "ddp_coverage",
    # r8 additions: paragraph dedup's first-instance table and source
    # map are both corpus-growing (shuffle_hash-pinned); semantic
    # decontamination must never broadcast anything but the bounded
    # eval capture
    "docs_paragraph_dedup", "docs_strip_paragraphs", "emb_decontaminate",
]

# ANN / retrieval / long-tail heavies: corpus-growing sides may ride an
# AQE measured-shuffle conversion (self-disabling) or a documented
# allowlist entry, but never an unanchored static broadcast
AUDITED_NO_STATIC_BROADCAST = [
    "emb_ann_buckets", "emb_ann_topk_ivf", "emb_ann_topk_pq",
    "emb_ann_topk_ivfpq", "emb_ann_topk_ivfpq_refined",
    "emb_ann_topk_lsh_mp", "emb_ann_recall_audit", "emb_ann_recall_ivfpq",
    "emb_ann_partitioned_probe", "emb_ivf_probe_sweep", "emb_jl_recall",
    "emb_matryoshka_recall", "emb_pq_distortion", "emb_opq_distortion",
    "emb_pq_adc_sdc", "emb_silhouette", "docs_tfidf_topk",
    "docs_token_freq_cms", "docs_bloom_fpr_audit", "docs_heavy_hitters",
    "events_funnel_conversion", "events_attribution_ushape",
    "tpch_q17_small_qty", "tpch_q18_big_orders", "bloom_semi_revenue",
]


@pytest.mark.parametrize("name", STRICT_NO_BROADCAST)
def test_no_corpus_broadcast_strict(spark, sf_dir, name):
    df = q(name, spark, sf_dir)
    df.collect()  # finalize AQE so runtime conversions are visible
    bad = P.corpus_broadcast_violations(df, strict=True)
    assert not bad, (
        f"{name}: corpus-growing relation on a broadcast side "
        f"(strict family — pin shuffle_hash): "
        + "; ".join(f"node {r['node_id']}: {r['reason']}" for r in bad)
    )
    # same finalized plan, second rule: no corpus-sized relation may
    # funnel through an Exchange SinglePartition either
    sp = P.single_partition_violations(df)
    assert not sp, f"{name}: unbounded SinglePartition funnel: " + "; ".join(
        f"node {r['node_id']}: {r['reason']}" for r in sp
    )


@pytest.mark.parametrize("name", AUDITED_NO_STATIC_BROADCAST)
def test_no_corpus_broadcast_unanchored(spark, sf_dir, name):
    df = q(name, spark, sf_dir)
    df.collect()
    # allowlisted queries are no longer skipped outright (round 9): the
    # documented exception excuses only its priced-in shape/count, so an
    # unrelated new violation in the same query still fails here
    bad = P.filter_allowed_violations(
        name, P.corpus_broadcast_violations(df), P.BROADCAST_AUDIT_ALLOW
    )
    assert not bad, (
        f"{name}: UNANCHORED corpus-growing broadcast side (static "
        f"estimate cannot self-correct at scale): "
        + "; ".join(f"node {r['node_id']}: {r['reason']}" for r in bad)
    )
    sp = P.single_partition_violations(df)
    assert not sp, f"{name}: unbounded SinglePartition funnel: " + "; ".join(
        f"node {r['node_id']}: {r['reason']}" for r in sp
    )


# the four queries the round-8 funnel sweep caught (three plan rewrites
# to the two-phase prefix scan / fixed block count, one classifier
# resolution for coarse time grains) — pinned so the funnels stay fixed
FUNNEL_FIXED = [
    "docs_vocab_coverage_curve",
    "events_watermark_lateness",
    "lineitem_equidepth_histogram",
    "events_burst_hours",
]


@pytest.mark.parametrize("name", FUNNEL_FIXED)
def test_no_unbounded_single_partition_funnel(spark, sf_dir, name):
    df = q(name, spark, sf_dir)
    df.collect()
    sp = P.single_partition_violations(df)
    assert not sp, f"{name}: " + "; ".join(
        f"node {r['node_id']}: {r['reason']}" for r in sp
    )
