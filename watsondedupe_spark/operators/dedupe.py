"""Deduplication operators for large text corpora.

The reference dedupes *byte streams* by content-defined chunking
(DedupeLibrary.cs:605-717); a training-data pipeline also needs
*document-level* dedup. All operators here are pure DataFrame
compositions (no Python UDFs in the hot path) and are shaped for scale:

- exact/normalized: one hash-groupBy shuffle, keyed on the content hash;
- MinHash-LSH: shingle explode -> per-doc min-aggregation -> band-bucket
  self-join (the shuffle key is the band hash, never all-pairs);
- SimHash: per-token hash -> bit-majority aggregation -> band join on
  16-bit slices for Hamming candidates;
- embedding near-dup: sign-LSH buckets first, exact cosine only within
  a bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# exact + normalized
# ---------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    """Canonical text form: lowercase, strip non-alnum, collapse spaces."""
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(col), "[^a-z0-9 ]", ""), " +", " "))


def exact_dedupe(df: DataFrame, text_col: str, id_col: str, normalized: bool = False) -> DataFrame:
    """Keep one representative (min id) per distinct content hash.

    One shuffle on the 256-bit hash; with billions of documents the
    group cardinality ~= the row count, so this relies on partial
    aggregation — which groupBy(sha2) gets natively.
    """
    text = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    h = F.sha2(text, 256).alias("__h")
    w = Window.partitionBy("__h").orderBy(id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def duplicate_groups(df: DataFrame, text_col: str, id_col: str, normalized: bool = False) -> DataFrame:
    """Groups of byte-identical (or normalized-identical) documents."""
    text = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    return (
        df.groupBy(F.sha2(text, 256).alias("content_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("representative"),
            F.collect_list(id_col).alias("members"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# shingles + MinHash-LSH
# ---------------------------------------------------------------------------


def word_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Distinct word k-gram shingles per document: (id, shingle)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(k)]),
    )
    return (
        df.filter(F.size(toks) >= k)
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, n_hashes: int = 16, n_bands: int = 4) -> DataFrame:
    """MinHash signature per document + LSH band keys.

    The permutation surrogate is the lexicographic minimum of
    md5(seed || shingle) hex strings — uniform, deterministic, and
    portable (no 64-bit hash parity needed). Bands hash consecutive
    signature slices; docs sharing any band key are candidates.
    """
    if n_hashes % n_bands:
        raise ValueError("n_bands must divide n_hashes")
    per = n_hashes // n_bands
    mins = [
        F.min(F.md5(F.concat(F.lit(f"s{j}:"), F.col("shingle")))).alias(f"m{j}")
        for j in range(n_hashes)
    ]
    sig = shingles.groupBy("id").agg(*mins)
    bands = [
        F.md5(F.concat(*[F.col(f"m{b * per + j}") for j in range(per)])).alias(f"band{b}")
        for b in range(n_bands)
    ]
    return sig.select("id", *[f"m{j}" for j in range(n_hashes)], *bands)


def lsh_candidate_pairs(sig: DataFrame, n_hashes: int = 16, n_bands: int = 4) -> DataFrame:
    """Candidate pairs from ONE banded band-bucket self-join, with
    estimated similarity = fraction of matching minhashes.

    Band structs explode into ``(bk, bv)`` rows and a single
    composite-key equijoin replaces ``n_bands`` separate self-joins —
    one shuffle keyed on the band value instead of n_bands, and the
    signature aggregation is evaluated once per side (exchange reuse
    collapses the two sides). Same shape as
    :func:`simhash60_candidates`; all-pairs never materializes.
    """
    banded = sig.select(
        "id",
        *[f"m{j}" for j in range(n_hashes)],
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("bk"), F.col(f"band{k}").alias("bv"))
                    for k in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("id", *[f"m{j}" for j in range(n_hashes)], F.col("b.bk").alias("bk"), F.col("b.bv").alias("bv"))
    a, b = banded.alias("a"), banded.alias("b")
    est = (
        sum(
            F.when(F.col(f"a.m{j}") == F.col(f"b.m{j}"), 1).otherwise(0) for j in range(n_hashes)
        ).cast("double")
        / float(n_hashes)
    ).alias("est_sim")
    return (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), est)
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float = 0.4,
    stop_shingle_max: int = 1000,
) -> DataFrame:
    """Exact Jaccard over shingle sets for pairs sharing >=1 rare shingle.

    ``stop_shingle_max`` drops shingles shared by more than N docs — the
    skew guard: a boilerplate shingle appearing in 1e6 docs would
    otherwise produce 1e12 join rows. At 100 TB this cutoff (plus LSH
    pre-filtering) is what keeps the plan feasible.
    """
    rare = shingles.groupBy("shingle").count().filter(F.col("count") <= stop_shingle_max)
    shr = shingles.join(rare.select("shingle"), "shingle")
    sizes = shr.groupBy("id").agg(F.count("*").alias("sz"))
    x, y = shr.alias("x"), shr.alias("y")
    inter = (
        x.join(y, (F.col("x.shingle") == F.col("y.shingle")) & (F.col("x.id") < F.col("y.id")))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
    return (
        inter.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select("id_a", "id_b", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document, JVM-side end to end.

    Token hash = xxhash64 (Spark built-in, stable across sessions);
    fingerprint bit i is the majority vote of token-hash bit i. The
    per-bit tally is one explode + groupBy(id) aggregation with 64
    conditional-sum columns — no Python, one shuffle.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    tallied = tok.groupBy("id").agg(*votes)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: xor == or
    return tallied.select("id", fp.alias("simhash"))


def simhash_candidates(fp: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Hamming-near pairs via the 4x16-bit band trick: if hamming(a,b) <= 3,
    at least one of the four 16-bit slices is identical (pigeonhole), so a
    banded equijoin finds all candidates; exact popcount filters.

    Band slices explode into ``(bk, bv)`` rows and ONE composite-key
    self-join replaces four separate self-joins + union — one shuffle
    keyed on the band value instead of four, with exchange reuse
    collapsing the two sides (the same shape as
    :func:`simhash60_candidates` and ``lsh_candidate_pairs``)."""
    banded = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("bk"),
                        F.shiftright("simhash", 16 * k)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.bk").alias("bk"), F.col("b.bv").alias("bv"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def simhash60_md5(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Portable 60-bit SimHash: token hash = first 15 hex chars of md5.

    Same bit-majority semantics as :func:`simhash64`, but the token hash
    is derivable in ANSI SQL (``conv(substr(md5(t),1,15),16,10)``), so a
    DuckDB oracle can recompute the fingerprint bit-for-bit — and 60
    bits keep the value strictly positive in a signed int64, so shifts
    and band slicing behave identically across engines. The plan shape
    is unchanged: one explode + one groupBy(id) with 60 conditional
    sums, all JVM-side.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    ).withColumn("h", F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(60)
    ]
    tallied = tok.groupBy("id").agg(*votes)
    fp = None
    for i in range(60):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: xor == or
    return tallied.select("id", fp.alias("simhash"))


def simhash60_candidates(fp: DataFrame, max_hamming: int = 12) -> DataFrame:
    """Hamming-near pairs over 60-bit fingerprints via 4x15-bit bands.

    Pigeonhole guarantee is full recall for hamming <= 3; larger
    thresholds are probed with partial recall (the standard LSH
    trade-off). Shape: the four band slices EXPLODE into (band_idx,
    band_val) rows and ONE equijoin on that composite key replaces four
    separate self-joins — one shuffle keyed on the band value instead
    of four (and the fingerprint aggregation is evaluated once per
    side, not once per band; exchange reuse collapses the two sides).
    """
    banded = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("bk"),
                        F.shiftright("simhash", 15 * k)
                        .bitwiseAND(F.lit(0x7FFF))
                        .alias("bv"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.bk").alias("bk"), F.col("b.bv").alias("bv"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = a.join(
        b,
        (F.col("a.bk") == F.col("b.bk"))
        & (F.col("a.bv") == F.col("b.bv"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.simhash").alias("fp_a"),
        F.col("b.simhash").alias("fp_b"),
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int")
    return (
        cand.distinct()
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_dims: int = 64,
) -> DataFrame:
    """Near-duplicate vectors: sign-LSH bucket first, exact cosine within
    the bucket. Near-dup pairs (cosine ~ 1) collide in all/most sign
    buckets, so the bucket equijoin keeps recall high while reducing the
    pair count by ~2**n_planes. ``n_dims`` must match the vector width —
    the hyperplanes are literal arrays, and zip_with against a wider
    plane would null-pad the products."""
    from watsondedupe_spark.operators.similarity import cosine, sign_lsh_bucket

    withb = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_lsh_bucket(F.col(vec_col), n_planes, n_dims).alias("bucket"),
    )
    a, b = withb.alias("a"), withb.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def salted_bucket_groups(withb: DataFrame, max_bucket_rows: int) -> DataFrame:
    """Split oversized LSH buckets into bounded verify groups.

    Input: ``(id, v, bucket)``. A bucket with ``n <= max_bucket_rows``
    rows becomes one group; a hot bucket is salted into ``nsub =
    ceil(2n / max_bucket_rows)`` sub-buckets by ``xxhash64(id)`` (the
    2x safety factor targets B/2 expected rows per sub-bucket, so the
    binomial fluctuation of hash assignment stays far inside the
    budget), and every sub-bucket PAIR ``(gi <= gj)`` becomes a group
    containing the rows of both sides — the standard cross-product
    salting that keeps all-pairs coverage while capping any single
    group at ``~max_bucket_rows`` expected rows (2x the budget only at
    a >6-sigma hash imbalance). Each row replicates ``nsub`` times
    (once per partner sub-bucket) — the information-theoretic floor for
    bounded-group all-pairs — so the fan-out grows with the SKEW, not
    the corpus. Returns ``(id, v, salt, bucket, gi, gj)``; a pair is
    verified exactly once — in the group where ``{salt_a, salt_b} ==
    {gi, gj}`` (kernel-side filter).

    Bucket sizes ride in via a broadcast join (there are at most
    ``2**n_planes`` buckets — always a dimension table).
    """
    sizes = withb.groupBy("bucket").agg(F.count("*").alias("_n"))
    nsub = F.when(F.col("_n") <= max_bucket_rows, F.lit(1)).otherwise(
        F.ceil(F.col("_n") * 2 / max_bucket_rows)
    )
    return (
        withb.join(F.broadcast(sizes), "bucket")
        .withColumn("nsub", nsub.cast("int"))
        .withColumn("salt", F.pmod(F.xxhash64(F.col("id")), F.col("nsub")).cast("int"))
        .select(
            "bucket",
            "id",
            "v",
            "salt",
            F.explode(F.sequence(F.lit(0), F.col("nsub") - 1)).alias("_other"),
        )
        .select(
            "bucket",
            "id",
            "v",
            "salt",
            F.least("salt", "_other").alias("gi"),
            F.greatest("salt", "_other").alias("gj"),
        )
    )


def embedding_near_dups_np(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_dims: int = 64,
    quantize: int = 1000,
    max_bucket_rows: int = 4096,
) -> DataFrame:
    """Sign-LSH bucketed near-dup pairs, Arrow/numpy within-bucket verify.

    Same candidate semantics as :func:`embedding_near_dups` (bucket
    equijoin — the shuffle key is the bucket, never all-pairs), but the
    in-bucket cosine runs as ONE integer matmul per bucket group instead
    of interpreted per-element JVM lambdas (~10x at bench scale). The
    cosine is the quantized-integer form (floor(x*q + 0.5) int64 dot /
    sqrt / sqrt): dot and norms are exact integers, so the result is
    bit-identical across numpy, Spark, and a SQL oracle — accumulation
    order cannot matter for exact integers, which is what frees the
    kernel to use BLAS.

    The in-group memory bound is ENFORCED, not advisory: buckets larger
    than ``max_bucket_rows`` are salted into sub-bucket pair groups via
    :func:`salted_bucket_groups`, so no pandas group ever exceeds
    ``2 * max_bucket_rows`` rows regardless of n_planes or skew. The
    dominant term is the similarity matrix — at the 4096 default that is
    a <=8192^2 x 8 B = 512 MB worst-case block, sized for a typical
    executor; raise it only with executor memory to match. At 100 TB a
    1/256 bucket would otherwise be ~billions of rows in one group.
    """
    from watsondedupe_spark.operators.similarity import sign_lsh_bucket

    withb = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_lsh_bucket(F.col(vec_col), n_planes, n_dims).alias("bucket"),
    ).localCheckpoint(eager=True)
    # checkpointed because salted_bucket_groups consumes it TWICE (the
    # bucket-size dimension agg + the main scan) and the sign-LSH fold
    # is the expensive projection — without it the n_planes x n_dims
    # bucket arithmetic runs over the corpus twice (house pattern from
    # emb_semantic_dedup; at 100 TB the bucketed corpus is exactly what
    # you materialize before a build anyway)
    grouped = salted_bucket_groups(withb, max_bucket_rows)

    def _pairs(key, pdf):
        import numpy as np
        import pandas as pd

        _, gi, gj = key
        ids = pdf["id"].to_numpy(dtype=np.int64)
        salts = pdf["salt"].to_numpy(dtype=np.int64)
        V = np.floor(np.asarray(list(pdf["v"]), dtype=np.float64) * quantize + 0.5).astype(
            np.int64
        )
        nrm = np.sqrt((V * V).sum(axis=1).astype(np.float64))
        S = (V @ V.T).astype(np.float64)
        S = S / nrm[:, None]
        S = S / nrm[None, :]
        keep = (ids[:, None] < ids[None, :]) & (S >= threshold)
        if gi != gj:
            # cross-sub-bucket group: a same-salt pair belongs to its own
            # (salt, salt) group — keeping it here would double-count
            keep &= salts[:, None] != salts[None, :]
        ai, bj = np.nonzero(keep)
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bj], "cosine": S[ai, bj]})

    return grouped.groupBy("bucket", "gi", "gj").applyInPandas(
        _pairs, schema="id_a long, id_b long, cosine double"
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str = "node",
    src_col: str = "a",
    dst_col: str = "b",
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
    algorithm: str = "label",
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``edges`` is an undirected pair list (``src_col``, ``dst_col``);
    ``nodes`` is the full vertex set (``node_col``) so isolated vertices
    come out as singleton clusters. Returns (node, cluster_id) where
    cluster_id is the smallest node id reachable from the node — the
    canonical representative used by keep-one-per-cluster dedup.

    Each iteration is one equi-join + one aggregate (labels flow across
    edges, every node keeps the min seen so far) and converges in
    O(graph diameter) rounds — near-dup graphs are overwhelmingly tiny
    cliques, so 2-3 rounds in practice. Two shape decisions keep the
    rounds cheap: the symmetrized edge list is materialized ONCE
    (checkpointed) so the upstream candidate pipeline — often a full
    LSH derivation — is not re-executed every round, and the iteration
    runs only over edge-touched nodes (isolated vertices can never
    change label; they rejoin as singletons at the end). So the
    per-round shuffle is bounded by the EDGE LIST (2|E| symmetrized
    rows + |touched nodes| labels), never the corpus.

    ``checkpoint_dir`` selects the materialization tier: ``None`` (local
    testing) uses executor-memory ``localCheckpoint``; a durable path
    (HDFS/S3 on a real cluster) uses reliable ``checkpoint``, which
    survives executor loss — on a 1000-executor run a lost executor
    would otherwise force recomputing the whole candidate pipeline mid-
    iteration. For long-diameter graphs (chain-shaped crawl-splice
    duplication), pass ``algorithm="star"`` — the alternating
    large-star/small-star variant converges in O(log d) rounds instead
    of O(d), with the same (node, cluster_id) result.
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _pin(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    _pin.durable = checkpoint_dir is not None

    if algorithm == "star":
        return _cc_star(
            edges, nodes, node_col, src_col, dst_col, max_iterations, _pin, stats
        )
    if algorithm != "label":
        raise ValueError(f"algorithm must be 'label' or 'star', got {algorithm!r}")

    sym = _pin(
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
    )
    all_nodes = nodes.select(F.col(node_col).alias("node"))
    touched = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .join(all_nodes, "node", "left_semi")  # dangling edge ids get no label
    )
    labels = _pin(touched.select("node", F.col("node").alias("label")))
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
                (F.col("nmin") < F.col("label")).alias("changed"),
            )
        )
        # r13 (guide §1.2): LAZY checkpoint + count in ONE action — the
        # count triggers the checkpoint materialization (all partitions
        # compute, the filter sits above the checkpointed RDD), so each
        # round schedules one job instead of an eager-pin job followed
        # by a count job. Same materialization tier, same lineage cut.
        if checkpoint_dir is not None:
            new_labels = new_labels.checkpoint(eager=False)
        else:
            new_labels = new_labels.localCheckpoint(eager=False)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("node", "label")
        if n_changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("label", F.col("node")).alias("cluster_id")
    )


def _cc_star(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str,
    src_col: str,
    dst_col: str,
    max_iterations: int,
    _pin,
    stats: dict | None,
) -> DataFrame:
    """Alternating large-star/small-star connected components — the
    MapReduce CC algorithm of Kiveris et al., "Connected Components in
    MapReduce and Beyond" (SoCC 2014).

    Min-label propagation (:func:`connected_components`) needs O(graph
    diameter) rounds; a chain of n spliced crawl shards (exactly the
    shape ``docs_boundary_overlap`` detects) makes that O(n). Each
    star round instead rewires edges toward the component minimum:

    - **large-star** (per node u over its symmetric neighborhood):
      connect every neighbor v > u to m = min(N(u) ∪ {u});
    - **small-star** (per node u over its smaller-or-equal neighbors,
      held canonically as (hi, lo) pairs): connect u and every lo
      neighbor to m = min of that set.

    Both are a single groupBy-join per round; the edge set monotonically
    contracts toward stars rooted at each component's minimum in
    O(log d) rounds, and the per-round shuffle stays bounded by the
    CURRENT edge list (which only shrinks or stays, never fans out:
    large-star emits one edge per (u, v>u) slot, small-star one per
    (hi, lo) slot). Convergence = the canonical edge set is stable
    (count + order-free hash sum, two cheap aggregates on the already-
    pinned round output). Result contract is identical to the label
    variant: (node, cluster_id = smallest reachable node id), isolated
    vertices as singletons.
    """
    all_nodes = nodes.select(F.col(node_col).alias("node"))
    node_only = all_nodes  # dangling edge endpoints get no label, as in label-prop
    # canonical undirected form: (hi, lo), self-loops dropped, deduped,
    # endpoints restricted to the declared vertex set
    canon = (
        edges.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .join(node_only.withColumnRenamed("node", "hi"), "hi", "left_semi")
        .join(node_only.withColumnRenamed("node", "lo"), "lo", "left_semi")
        .distinct()
    )
    canon = _pin(canon)
    prev_sig = None
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        # large-star over the symmetric adjacency
        sym = canon.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
            canon.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        nmin = sym.groupBy("u").agg(F.min("v").alias("nmin"))
        large = (
            sym.join(nmin, "u")
            .withColumn("m", F.least("u", "nmin"))
            .filter(F.col("v") > F.col("u"))  # m <= u < v: always canonical
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star over the canonical (hi, lo) orientation
        smin = large.groupBy("hi").agg(F.min("lo").alias("m"))
        joined = large.join(smin, "hi")
        small = (
            joined.select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(joined.select("hi", F.col("m").alias("lo")))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # r13: lazy checkpoint + the signature aggregate in ONE action
        # per round (see the label-prop loop above)
        canon = small.checkpoint(eager=False) if _pin.durable else small.localCheckpoint(eager=False)
        sig = canon.agg(
            F.count("*").alias("n"),
            # decimal sum: order-free and overflow-proof under ANSI mode
            F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        if prev_sig == (sig.n, sig.h):
            break
        prev_sig = (sig.n, sig.h)
    if stats is not None:
        stats["rounds"] = rounds
    # converged state is stars rooted at component minima; the groupBy
    # min is a no-op then, and a safe fallback if max_iterations hit
    labels = canon.groupBy(F.col("hi").alias("node")).agg(F.min("lo").alias("label"))
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("label", F.col("node")).alias("cluster_id")
    )
