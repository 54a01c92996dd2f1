"""Engine-native queries with no SQL oracle (driver does rows-only checks).

These exercise operators that are genuinely not ANSI-SQL-expressible —
the CDC chunker UDF, xxhash64-based SimHash, float-exact vector search,
and the multimodal mapInPandas plumbing. Their correctness is covered by
the pytest invariants (tests/test_engine.py, tests/test_operators.py);
registration here makes them part of the graded surface with the weaker
rows-only check the driver records for oracle-less entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from watsondedupe_spark.queries import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@register(
    "cdc_chunk_index",
    None,
    doc="O1/O2: content-defined chunking of the documents corpus (payloads "
    "inflated past min_chunk_size); per-object chunk accounting. The real "
    "engine write path (DedupeLibrary.cs:605-717 semantics).",
)
def cdc_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.chunking import ChunkSettings, SMALL_FILE_PROFILE, chunk_objects

    objs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("object_key"),
        F.encode(F.repeat("text", 20), "UTF-8").alias("data"),
    )
    chunks = chunk_objects(objs, ChunkSettings(*SMALL_FILE_PROFILE))
    return chunks.groupBy("object_key").agg(
        F.count("*").cast("long").alias("chunk_count"),
        F.sum("length").cast("long").alias("total_bytes"),
        F.count_distinct("chunk_key").alias("distinct_chunks"),
    )


@register(
    "docs_simhash",
    None,
    doc="SimHash-64 fingerprints (xxhash64 token hashes, bit-majority "
    "aggregation) + Hamming<=8 candidate pair count per doc.",
)
def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.dedupe import simhash64

    return simhash64(_docs(spark, sf_dir), "text", "doc_id")


@register(
    "docs_simhash_candidates",
    None,
    doc="SimHash Hamming-near pairs via the 4x16-bit band pigeonhole join.",
)
def docs_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.dedupe import simhash64, simhash_candidates

    fp = simhash64(_docs(spark, sf_dir), "text", "doc_id")
    return simhash_candidates(fp, max_hamming=12)


@register(
    "emb_cosine_topk_float",
    None,
    doc="float-exact brute-force cosine top-k (zip_with/aggregate JVM fold) — "
    "the production form of emb_knn_cosine without oracle quantization.",
)
def emb_cosine_topk_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    return cosine_topk(emb, q, k=10)


@register(
    "emb_ann_topk_lsh",
    None,
    doc="LSH-bucketed approximate top-k: probe only the query's sign bucket.",
)
def emb_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.similarity import ann_topk_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    return ann_topk_lsh(emb, q, k=10, n_planes=6)


@register(
    "emb_ann_topk_ivf",
    None,
    doc="IVF approximate top-k: deterministic coarse centroids, corpus "
    "listed per centroid, queries probe n_probe nearest lists (the "
    "partition-pruned scale path alongside sign-LSH).",
)
def emb_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.similarity import ann_topk_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    return ann_topk_ivf(emb, q, k=10, n_centroids=16, n_probe=4)


@register(
    "cdc_chunk_index_segmented",
    None,
    doc="segment-framed CDC (SURVEY §7.3): objects split into frames "
    "JVM-side, frames chunked in parallel, addresses rebased — the "
    "within-object parallelism path for multi-GB objects.",
)
def cdc_chunk_index_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.chunking import (
        ChunkSettings,
        SMALL_FILE_PROFILE,
        chunk_objects_segmented,
    )

    objs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("object_key"),
        F.encode(F.repeat("text", 20), "UTF-8").alias("data"),
    )
    chunks = chunk_objects_segmented(
        objs, ChunkSettings(*SMALL_FILE_PROFILE), segment_size=32768
    )
    return chunks.groupBy("object_key").agg(
        F.count("*").cast("long").alias("chunk_count"),
        F.sum("length").cast("long").alias("total_bytes"),
        F.count_distinct("chunk_key").alias("distinct_chunks"),
    )


@register(
    "multimodal_image_features",
    None,
    doc="multimodal plumbing: documents' bytes wrapped as media structs -> "
    "Arrow-batched decode/featurize (decoder seam stubbed, plumbing real).",
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.multimodal import extract_image_features, wrap_media

    df = _docs(spark, sf_dir).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    media = wrap_media(df, "payload", "image/png", "doc_id")
    return extract_image_features(media)


@register(
    "multimodal_frame_sample",
    None,
    doc="multimodal frame sampling: binary 'video' payloads explode into "
    "bounded per-frame rows via Arrow-batched mapInPandas (splitter seam "
    "is a deterministic fake; schema/fan-out contract is real).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.multimodal import sample_frames, wrap_media

    df = _docs(spark, sf_dir).limit(200).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    media = wrap_media(df, "payload", "video/mp4", "doc_id")
    frames = sample_frames(media, every_ms=500, max_frames=4)
    return frames.select("id", "frame_index", "frame_ts_ms", F.length("frame").alias("frame_bytes"))


@register(
    "multimodal_feature_near_dups",
    None,
    doc="cross-modal integration: binary payloads -> Arrow-batched "
    "featurize (decoder seam stubbed) -> sign-LSH bucketed cosine "
    "near-dup over the 8-dim feature vectors — the image-dedup pipeline "
    "with every Spark stage real and only the codec faked.",
)
def multimodal_feature_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.dedupe import embedding_near_dups
    from watsondedupe_spark.operators.multimodal import extract_image_features, wrap_media

    df = _docs(spark, sf_dir).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    media = wrap_media(df, "payload", "image/png", "doc_id")
    feats = extract_image_features(media).select("id", "feature")
    return embedding_near_dups(
        feats, id_col="id", vec_col="feature", threshold=0.9999, n_planes=6, n_dims=8
    )
