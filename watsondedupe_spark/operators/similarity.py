"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline: a broadcast join
of the (small) query set against the corpus with the dot product
evaluated JVM-side via ``zip_with``/``aggregate`` — no Python, no
shuffle except the final per-query top-k.

The scale path is sign-LSH (random hyperplanes): corpus vectors are
bucketed once by sign bits; a query probes only its bucket (optionally
multi-probe neighbors). At 100 TB the bucket column is also the
partition key, so a probe touches one partition instead of the corpus.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float arrays (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / l2_norm(a) / l2_norm(b)


#: batch-KNN paths (cosine_topk_np / ann_topk_pq / ann_topk_ivfpq)
#: materialize the query set on the driver by design — it is the
#: broadcast-small side. Above this many query vectors the collect is
#: refused instead of silently OOMing the driver.
QUERY_COLLECT_CAP = 10_000


def _collect_query_rows(queries: DataFrame, id_col: str, vec_col: str) -> list:
    """Bounded driver-side collect of the query set: fetches at most
    ``QUERY_COLLECT_CAP + 1`` rows (one limit-collect, no extra count
    job) and raises with remediation when the set exceeds the cap."""
    cap = QUERY_COLLECT_CAP
    rows = queries.select(id_col, vec_col).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"query set exceeds the driver-collect cap ({cap} vectors): "
            "the batch-KNN paths ship queries to executors as a closure "
            "capture, which requires materializing them on the driver. "
            "For larger query waves use cosine_topk (JVM broadcast-join "
            "form), split the wave, or raise "
            "similarity.QUERY_COLLECT_CAP if the driver is sized for it."
        )
    return rows


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force).

    Queries are broadcast (they are the small side by construction);
    the corpus is scanned once; the only shuffle is the per-query
    window top-k. Returns (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 from md5 — reproducible across sessions/engines."""
    return 1 if hashlib.md5(f"p{plane}:{dim}".encode()).hexdigest()[0] in "01234567" else -1


def sign_lsh_bucket(vec: Column, n_planes: int = 8, n_dims: int = 64) -> Column:
    """Random-hyperplane sign bucket (0 .. 2**n_planes - 1), JVM-side.

    Hyperplane components are ±1 derived from md5, embedded as literals;
    each projection is an ``aggregate`` fold over the vector, so the
    whole bucket assignment stays inside whole-stage codegen.
    """
    bucket = F.lit(0).cast("long")
    for j in range(1, n_planes + 1):
        signs = [_plane_sign(j, i) for i in range(1, n_dims + 1)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x.cast("double") * s.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, j - 1)
    return bucket


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_dims: int = 64,
    probe_radius: int = 0,
) -> DataFrame:
    """Approximate top-k: probe the query's sign-LSH bucket.

    Trades recall for a ~2**n_planes candidate reduction. With
    ``probe_radius=1`` (multi-probe, Lv et al. 2007's idea in its
    simplest form) each query ALSO probes every bucket at Hamming
    distance 1 — one flipped hyperplane bit — growing the probe list to
    ``1 + n_planes`` buckets per query: near-misses that landed just
    across one hyperplane come back, at (n_planes+1)/2**n_planes of the
    corpus instead of 1/2**n_planes. The probe list stays a broadcast
    (|queries| * (n_planes+1) rows); the corpus is bucketed ONCE and
    never re-hashed — multi-probe trades probe count for index count,
    which is the right 100 TB lever (more tables would re-store the
    corpus). Same output shape as :func:`cosine_topk`.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_lsh_bucket(F.col(vec_col), n_planes, n_dims).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_lsh_bucket(F.col(vec_col), n_planes, n_dims).alias("bucket"),
    )
    if probe_radius:
        if probe_radius != 1:
            raise ValueError("only probe_radius in (0, 1) is implemented")
        masks = [0] + [1 << j for j in range(n_planes)]
        qb = qb.select(
            "query_id",
            "qv",
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("bucket"),
        )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids by cosine.

    ``centroids`` is (centroid_id, cv) and small by construction, so the
    scoring join is a broadcast fan-out of |centroids| per vector followed
    by a per-vector top-n_probe window — no corpus shuffle.
    """
    c = centroids.select(F.col("centroid_id"), F.col("cv"))
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(c)).select(
        id_col, vec_col, "centroid_id", cosine(F.col(vec_col), F.col("cv")).alias("csim")
    )
    if n_probe == 1:
        # top-1 by (csim desc, centroid_id asc) as a hash aggregate:
        # max_by with a (csim, -centroid_id) tiebreak struct combines
        # map-side, ~40% faster than the window sort (parity measured)
        tie = F.struct(F.col("csim"), (-F.col("centroid_id")).alias("nc"))
        assigned = (
            scored.groupBy(id_col)
            .agg(
                F.max_by("centroid_id", tie).alias("centroid_id"),
                F.max_by(vec_col, tie).alias(vec_col),
            )
        )
        return assigned.select(id_col, vec_col, "centroid_id")
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), "centroid_id")
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n_probe)
        .select(id_col, vec_col, "centroid_id")
    )


def ivf_assign_np(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
    quantize: int = 1000,
) -> DataFrame:
    """Centroid assignment as ONE Arrow pass per batch — the scale shape.

    :func:`ivf_assign` scores via a |corpus| x |centroids| crossJoin
    fan-out plus a per-vector window; at 16 centroids that is 16x the
    corpus in intermediate rows and one extra shuffle. Here the (tiny)
    quantized centroid matrix rides in the closure, each Arrow batch
    computes one integer matmul, and the top-``n_probe`` centroids per
    vector are emitted directly — no fan-out, no window, no shuffle.

    The routing metric is the quantized-integer cosine (exact int64
    dot/norms, then double divisions), so numpy here, Spark folds, and
    a SQL oracle produce bit-identical scores; ties break toward the
    smallest centroid_id, matching ``ROW_NUMBER ... ORDER BY csim DESC,
    centroid_id``.
    """
    import numpy as np

    crows = sorted(
        ((int(r["centroid_id"]), [float(x) for x in r["cv"]]) for r in centroids.collect())
    )
    cid_l = [c for c, _ in crows]
    cvec_l = [v for _, v in crows]

    def _assign(batches):
        import numpy as np
        import pandas as pd

        cid = np.asarray(cid_l, dtype=np.int64)
        C = np.floor(np.asarray(cvec_l, dtype=np.float64) * quantize + 0.5).astype(np.int64)
        cnrm = np.sqrt((C * C).sum(axis=1).astype(np.float64))
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.floor(
                np.asarray(list(pdf[vec_col]), dtype=np.float64) * quantize + 0.5
            ).astype(np.int64)
            vnrm = np.sqrt((V * V).sum(axis=1).astype(np.float64))
            S = (V @ C.T).astype(np.float64)
            S = S / vnrm[:, None]
            S = S / cnrm[None, :]
            # stable argsort on -S: ties keep column order == cid ascending
            top = np.argsort(-S, axis=1, kind="stable")[:, :n_probe]
            n, p = top.shape
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64).repeat(p),
                    vec_col: [v for v in pdf[vec_col] for _ in range(p)],
                    "centroid_id": cid[top].reshape(-1),
                }
            )

    return corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _assign, schema=f"{id_col} long, {vec_col} array<float>, centroid_id long"
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids: the ``n_centroids`` corpus vectors
    with the smallest md5-derived key — a uniform pseudo-random sample
    that needs no RNG state and is reproducible across runs AND engines
    (``conv(substr(md5(id),1,15),16,10)`` is ANSI-SQL-derivable, which is
    what lets the IVF queries carry a DuckDB oracle).
    (A k-means refinement loop can start from these; for IVF routing a
    fixed coarse sample already buys the |corpus|/n_centroids probe
    reduction.) ``orderBy().limit()`` executes as a distributed
    TakeOrdered — per-partition top-n then a driver merge of n rows —
    never a global sort.
    """
    key = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    return (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(key, id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"))
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: inverted-file search with coarse centroids.

    Build: corpus vectors are listed under their nearest centroid (one
    broadcast scoring pass; at scale the assignment is precomputed once
    and the corpus is partitioned by ``centroid_id``, so a probe reads
    |corpus| * n_probe / n_centroids instead of everything). Query: each
    query probes its ``n_probe`` nearest centroids' lists and scores
    exactly within them. Same output shape as :func:`cosine_topk`;
    recall rises with ``n_probe`` (== n_centroids is exact search).
    """
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    # assignment via the Arrow-pass kernel: no |corpus| x |centroids|
    # fan-out, no window shuffle; routing metric is the quantized-int
    # cosine (SQL-derivable, see ivf_assign_np)
    corpus_lists = ivf_assign_np(corpus, cents, id_col, vec_col, n_probe=1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "centroid_id"
    )
    query_probes = ivf_assign_np(queries, cents, id_col, vec_col, n_probe=n_probe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "centroid_id"
    )
    scored = (
        corpus_lists.join(F.broadcast(query_probes), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
        # no dedup needed: build side assigns each corpus vector to
        # exactly one list (n_probe=1), so multi-probe on the query side
        # can never surface the same neighbor twice
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
) -> DataFrame:
    """Vectorized brute-force top-k: Arrow-batched numpy matmul.

    Same semantics as :func:`cosine_topk` (exact, per-query global
    top-k, deterministic neighbor_id tiebreak), different physical
    strategy: the query matrix ships to every task as a closure capture
    (it is the small side), each corpus Arrow batch becomes one
    ``batch x queries`` BLAS matmul, and each task emits only its local
    per-query top-k — so the window that produces the global top-k sorts
    at most ``tasks * k`` rows per query instead of the whole corpus.

    This is the ``mapInPandas`` escape hatch the task calls for when the
    built-in operators can't express the semantics *efficiently*: the
    JVM higher-order-function dot product evaluates interpreted per
    element, while one matmul per Arrow batch stays inside optimized
    C loops. Use this form when |corpus| x |queries| is large and dense;
    the IVF/LSH operators remain the sublinear path.

    ``quantize`` switches the metric to the quantized-integer cosine
    (floor(x*q + 0.5) int64 dot/norms, then dot / sqrt(nq) / sqrt(nc)
    double divisions): exact integers make the score independent of
    accumulation order, so BLAS output bit-matches the SQL oracle and
    the JVM fold — the float default keeps last-ulp BLAS rounding and
    stays rows-only.
    """
    import numpy as np  # noqa: F401 — imported here so executors resolve it lazily

    q_rows = _collect_query_rows(queries, id_col, vec_col)
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    q_ids = [r[0] for r in q_rows]
    q_mat = [list(r[1]) for r in q_rows]

    def _score(batches):
        import numpy as np
        import pandas as pd

        Q = np.asarray(q_mat, dtype=np.float64)
        qid = np.asarray(q_ids, dtype=np.int64)
        if quantize:
            Qi = np.floor(Q * quantize + 0.5).astype(np.int64)
            qnrm = np.sqrt((Qi * Qi).sum(axis=1).astype(np.float64))
        else:
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if quantize:
                Ci = np.floor(C * quantize + 0.5).astype(np.int64)
                cnrm = np.sqrt((Ci * Ci).sum(axis=1).astype(np.float64))
                S = (Ci @ Qi.T).astype(np.float64)  # exact integer dots
                S = S / qnrm[None, :]  # same division order as the oracle:
                S = S / cnrm[:, None]  # dot / sqrt(nq) / sqrt(nc)
            else:
                Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
                S = Cn @ Qn.T  # |batch| x |queries|
            out_q, out_n, out_s = [], [], []
            for j in range(S.shape[1]):
                col = S[:, j].copy()
                col[ids == qid[j]] = -np.inf  # exclude self
                take = min(k, len(col))
                # partial select then (score desc, id asc) order
                cand = np.argpartition(-col, take - 1)[:take] if take < len(col) else np.arange(len(col))
                order = cand[np.lexsort((ids[cand], -col[cand]))]
                out_q.extend([qid[j]] * len(order))
                out_n.extend(ids[order].tolist())
                out_s.extend(col[order].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
            )

    local = corpus.select(id_col, vec_col).mapInPandas(
        _score, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .filter(F.col("cosine") != F.lit(float("-inf")))
    )


# ---------------------------------------------------------------------------
# product quantization (PQ) — memory-bounded ANN
# ---------------------------------------------------------------------------


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: ``[m][ks][d/m]`` floats.

    The ``ks`` corpus vectors with the smallest md5-derived key (the
    same RNG-free, engine-reproducible sampling scheme as
    :func:`ivf_centroids` — ``conv(substr(md5(id),1,15),16,10)`` is
    ANSI-SQL-derivable, which is what lets the PQ query carry a DuckDB
    oracle) are sliced into ``m`` subvectors; subspace ``s``'s codebook
    is the ``s``-th slice of every sampled vector, and the CODE of an
    entry is its rank in the sample order. A k-means refinement per
    subspace can start from these; the coarse sample already spans the
    corpus. The whole structure is ``m*ks*(d/m) = ks*d`` doubles —
    driver-side and broadcast-as-literal by construction.
    """
    key = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    sample = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(key, id_col)
        .limit(ks)
        .collect()
    )
    vecs = [[float(x) for x in r[vec_col]] for r in sample]
    d = len(vecs[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return [[v[s * sub : (s + 1) * sub] for v in vecs] for s in range(m)]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector as ``m`` one-byte-sized codes (argmin-L2 per
    subspace): ``(id, codes array<int>)``.

    This is the 100 TB lever: a 64-dim float vector (256 B) compresses
    to ``m`` codes (8 B at m=8, ks<=256) — a 32x working-set reduction,
    so a whole shard's codes fit in executor memory while raw vectors
    would spill. Encoding is an Arrow-batched numpy kernel (one matmul-
    shaped pass per subspace, no Python per row) and runs exactly once
    per corpus build; queries never touch raw vectors again.

    With ``quantize`` set, vectors and codebook entries are first mapped
    through the house ``floor(x*q + 0.5)`` int64 scheme, so every
    subspace distance is an EXACT integer — the same code assignment any
    engine (e.g. a DuckDB oracle) reproduces bit-for-bit. Ties still
    break toward the lowest code.
    """
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])

    def enc(batches):
        if quantize is None:
            cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
        else:
            cbs = [
                np.floor(np.asarray(cb, dtype=np.float64) * quantize + 0.5).astype(np.int64)
                for cb in codebooks
            ]
        for pdf in batches:
            vecs = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if quantize is not None and len(pdf):
                vecs = np.floor(vecs * quantize + 0.5).astype(np.int64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            if len(pdf):
                for s in range(m):
                    x = vecs[:, s * sub : (s + 1) * sub]
                    d2 = ((x[:, None, :] - cbs[s][None, :, :]) ** 2).sum(axis=-1)
                    codes[:, s] = d2.argmin(axis=1)  # ties -> lowest code
            out = {id_col: pdf[id_col], "codes": list(codes.tolist())}
            for c in keep_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    in_cols = [F.col(id_col), F.col(vec_col)] + [F.col(c) for c in keep_cols]
    keep_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in corpus.select(*[F.col(c) for c in keep_cols]).schema.fields
    )
    return corpus.select(*in_cols).mapInPandas(
        enc, schema=f"{id_col} long, codes array<int>{keep_schema}"
    )


def ann_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance (ADC).

    Each query precomputes its ``m x ks`` table of exact subspace
    distances to the codebooks (driver-side — it is ``ks*d`` float ops
    per query), shipped as literal arrays. The scan side then scores a
    vector with ``m`` array lookups and adds — no floats from the corpus
    are read at all, only the code columns — and every query's scores
    come out of ONE pass over the codes via an exploded struct array.
    The only shuffle is the per-query top-k window. Smaller ADC distance
    = nearer; returns (query_id, neighbor_id, adist, rank).

    With ``quantize`` set, codebook entries and query subvectors go
    through ``floor(x*q + 0.5)`` int64 first, so every distance-table
    cell and every ADC score is an EXACT int64 sum — engine-independent
    (``adist`` comes back as BIGINT) and therefore DuckDB-oracle-able,
    the same scheme the IVF and near-dup paths use.

    ``codebooks``/``codes`` accept a prebuilt index (see the query
    layer's shared cache): a real deployment builds the code table once
    per corpus and serves every query wave from it — passing both here
    skips the codebook sample job and the encode pass entirely. A
    ``codes`` table may carry extra columns (e.g. ``centroid_id`` from
    an IVF-PQ build); the scorer reads only ``(id, codes)``.
    """
    if (codebooks is None) != (codes is None):
        raise ValueError("pass codebooks and codes together (a matched index)")
    if codebooks is not None and (
        len(codebooks) != m or any(len(cb) != ks for cb in codebooks)
    ):
        shape = f"{len(codebooks)} subspaces" + (
            f" x {len(codebooks[0])} codes" if codebooks else ""
        )
        raise ValueError(
            f"prebuilt index mismatch: codebooks are {shape} but the "
            f"call asked for m={m}, ks={ks}. `quantize` is also fixed "
            "at build time and must match (part of the index contract "
            "— not detectable from the index shape)."
        )
    cbs = (
        codebooks
        if codebooks is not None
        else pq_codebooks(corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    )
    sub = len(cbs[0][0])
    if codes is None:
        codes = pq_encode(corpus, cbs, id_col=id_col, vec_col=vec_col, quantize=quantize)

    # per-query m x ks tables of exact subspace distances, driver-side
    # (ks*d ops per query) — small enough to ride in the closure
    import numpy as np

    if quantize is None:
        qcbs = [np.asarray(cb, dtype=np.float64) for cb in cbs]
    else:
        qcbs = [
            np.floor(np.asarray(cb, dtype=np.float64) * quantize + 0.5).astype(np.int64)
            for cb in cbs
        ]
    qrows = _collect_query_rows(queries, id_col, vec_col)
    qtabs = []
    for r in qrows:
        qv = np.asarray([float(x) for x in r[vec_col]], dtype=np.float64)
        if quantize is not None:
            qv = np.floor(qv * quantize + 0.5).astype(np.int64)
        tab = [
            ((qv[s * sub : (s + 1) * sub][None, :] - qcbs[s]) ** 2).sum(axis=1).tolist()
            for s in range(m)
        ]
        qtabs.append((int(r[id_col]), tab))

    dtype_np = "float64" if quantize is None else "int64"
    adist_t = "double" if quantize is None else "long"

    # ADC scoring fused into the Arrow pass: per batch, per query, the
    # score is m vectorized table gathers + adds (ascending s, the same
    # accumulation order as a scalar left fold) — no per-row literal
    # array construction, no explode; the codes column is all that is
    # read. One pass over the corpus serves every query.
    def _score(batches):
        import numpy as np
        import pandas as pd

        tabs = [(qid, np.asarray(tab, dtype=dtype_np)) for qid, tab in qtabs]
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            nid = pdf[id_col].to_numpy(dtype=np.int64)
            frames = []
            for qid, T in tabs:
                ad = np.zeros(len(pdf), dtype=tabs[0][1].dtype)
                for s in range(T.shape[0]):
                    ad += T[s][C[:, s]]
                mask = nid != qid
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": nid[mask], "adist": ad[mask]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = codes.mapInPandas(
        _score, schema=f"query_id long, neighbor_id long, adist {adist_t}"
    )
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
    cents: DataFrame | None = None,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k — the billion-vector index layout.

    Composition of the two sublinear levers this module already ships:
    the coarse quantizer (IVF) prunes WHICH vectors are scored, and
    product quantization prunes WHAT is read per vector. Build: each
    corpus vector is routed to its nearest md5-sampled centroid
    (``ivf_assign_np``, one integer-matmul Arrow pass) and encoded as
    ``m`` subspace codes (``pq_encode``) — the raw floats are never
    touched again. Query: each query probes its ``n_probe`` nearest
    cells; the probe list joins the code table on ``centroid_id``
    (broadcast — the probe side is |queries| x n_probe rows), and ADC
    scoring reads ``m`` ints per candidate. Each Arrow batch emits only
    its local per-query top-k, so the global rank window sorts
    ``batches * k`` rows per query, not the probed cells.

    At 100 TB: the corpus is written partitioned by ``centroid_id`` and
    the code column is ~32x smaller than the float vectors, so a probe
    reads ``n_probe / n_centroids`` of a corpus that is itself 32x
    compressed — both pruning levers multiply. Everything is exact
    int64 arithmetic under ``quantize`` (the house ``floor(x*q+0.5)``
    scheme), so routing, codes, and ADC scores are engine-independent
    and the whole pipeline carries a DuckDB oracle.

    Returns (query_id, neighbor_id, adist, rank); smaller adist = nearer.

    ``cents``/``codebooks``/``codes`` accept a prebuilt index (``codes``
    must carry ``centroid_id``): a deployment builds routing + codes
    once per corpus, and every query wave pays only its probe joins —
    passing all three skips the centroid sample, the corpus routing
    pass, and the encode pass.
    """
    import numpy as np
    import pandas as pd

    prebuilt = (cents is not None, codebooks is not None, codes is not None)
    if any(prebuilt) and not all(prebuilt):
        raise ValueError("pass cents, codebooks and codes together (a matched index)")
    if all(prebuilt):
        # A prebuilt index fixes m/ks/quantize at BUILD time: validate
        # the structurally checkable parts (no Spark job — codebooks are
        # driver-local lists) and spell out the rest of the contract, so
        # a mismatched call fails loudly instead of silently mis-routing
        # probes / mis-scoring ADC distances.
        if len(codebooks) != m or any(len(cb) != ks for cb in codebooks):
            shape = f"{len(codebooks)} subspaces" + (
                f" x {len(codebooks[0])} codes" if codebooks else ""
            )
            raise ValueError(
                f"prebuilt index mismatch: codebooks are {shape} but "
                f"the call asked for m={m}, ks={ks}. A prebuilt "
                "index also fixes `quantize` and `n_centroids` at build "
                "time — pass the exact build-time values (they are part "
                "of the index contract; quantize mismatches are not "
                "detectable from the index shape)."
            )
    if codes is None:
        cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
        assigned = ivf_assign_np(
            corpus, cents, id_col, vec_col, n_probe=1, quantize=quantize
        )
        codebooks = pq_codebooks(corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
        codes = pq_encode(
            assigned, codebooks, id_col=id_col, vec_col=vec_col,
            quantize=quantize, keep_cols=("centroid_id",),
        )
    cbs = codebooks
    sub = len(cbs[0][0])

    probes = ivf_assign_np(
        queries, cents, id_col, vec_col, n_probe=n_probe, quantize=quantize
    ).select(F.col(id_col).alias("query_id"), "centroid_id")

    # per-query m x ks ADC tables, driver-side (ks*d int ops per query)
    qcbs = [
        np.floor(np.asarray(cb, dtype=np.float64) * quantize + 0.5).astype(np.int64)
        for cb in cbs
    ]
    qtabs = []
    for r in _collect_query_rows(queries, id_col, vec_col):
        qv = np.floor(
            np.asarray([float(x) for x in r[vec_col]], dtype=np.float64) * quantize + 0.5
        ).astype(np.int64)
        tab = np.stack(
            [((qv[s * sub : (s + 1) * sub][None, :] - qcbs[s]) ** 2).sum(axis=1)
             for s in range(m)]
        )
        qtabs.append((int(r[id_col]), tab))

    cand = (
        codes.join(F.broadcast(probes), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), "codes")
    )

    def _score(batches):
        tabs = dict(qtabs)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            nid = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            qid = pdf["query_id"].to_numpy(dtype=np.int64)
            frames = []
            for q in np.unique(qid):
                T = tabs[int(q)]
                sel = qid == q
                Cq, nq = C[sel], nid[sel]
                ad = np.zeros(len(nq), dtype=np.int64)
                for s in range(T.shape[0]):
                    ad += T[s][Cq[:, s]]
                if len(nq) > k:  # local top-k: keep every global-top-k candidate
                    keep = np.lexsort((nq, ad))[:k]
                    nq, ad = nq[keep], ad[keep]
                frames.append(
                    pd.DataFrame({"query_id": int(q), "neighbor_id": nq, "adist": ad})
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = cand.mapInPandas(_score, schema="query_id long, neighbor_id long, adist long")
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk_ivfpq_refined(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine: int = 4,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
    cents: DataFrame | None = None,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ with an exact re-rank stage — the full production ANN
    recipe (FAISS's ``IVFPQR`` / refine-at-query-time pattern).

    ADC distances are lossy (each vector is reconstructed from ``m``
    codebook entries), so the PQ top-k can mis-order true neighbors.
    The fix every production deployment uses: take an ADC shortlist of
    ``k * refine`` candidates, fetch ONLY those vectors' raw values,
    and re-rank by exact distance. Cost shape at 100 TB: the expensive
    sublinear part (probe + ADC over compressed codes) is unchanged;
    the refine adds one broadcast semi-fetch of ``|queries| * k *
    refine`` vectors out of the corpus scan — the corpus itself is
    never shuffled, and the exact arithmetic runs JVM-side
    (``zip_with``/``aggregate`` over the quantized int64 arrays, no
    Python in the refine path).

    Returns (query_id, neighbor_id, d2, rank); ``d2`` is the exact
    quantized squared L2 distance, smaller = nearer. All arithmetic is
    int64 under ``floor(x * quantize + 0.5)``, so the whole pipeline —
    shortlist AND refine — carries a DuckDB oracle.
    """
    shortlist = ann_topk_ivfpq(
        corpus, queries, k=k * refine, n_centroids=n_centroids, n_probe=n_probe,
        m=m, ks=ks, id_col=id_col, vec_col=vec_col, quantize=quantize,
        cents=cents, codebooks=codebooks, codes=codes,
    ).select("query_id", "neighbor_id")

    def _quant(col):
        return F.transform(
            col, lambda x: F.floor(x.cast("double") * quantize + F.lit(0.5)).cast("long")
        )

    qv = queries.select(F.col(id_col).alias("query_id"), _quant(F.col(vec_col)).alias("qv"))
    # the (query, candidate) list is bounded (|q| * k * refine rows) —
    # broadcast it onto the corpus scan; the corpus never shuffles
    cand = shortlist.join(F.broadcast(qv), "query_id")
    fetched = corpus.select(
        F.col(id_col).alias("neighbor_id"), _quant(F.col(vec_col)).alias("nv")
    ).join(F.broadcast(cand), "neighbor_id")
    d2 = F.aggregate(
        F.zip_with("qv", "nv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        fetched.select("query_id", "neighbor_id", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd refinement of coarse centroids, ``rounds`` iterations.

    Each round: assign every vector to its nearest current centroid by
    cosine (broadcast scoring — the corpus is never shuffled), then
    recompute each centroid as the elementwise mean of its members. The
    mean is computed by exploding (centroid, dim, value) triples and
    partially aggregating — map-side combine reduces the shuffle to
    ``n_centroids * dim * partitions`` partial rows, independent of
    corpus size. A centroid whose cluster empties keeps its previous
    position. Lineage is truncated per round (house pattern from
    connected_components) so the plan does not grow with ``rounds``.

    Returns (centroid_id, cv) like :func:`ivf_centroids` — drop-in
    upgrade for the IVF/SemDeDup/PQ seed sample.
    """
    cents = centroids
    for _ in range(rounds):
        assigned = ivf_assign(corpus, cents, id_col, vec_col, n_probe=1)
        means = (
            assigned.select("centroid_id", F.posexplode(F.col(vec_col)).alias("dim", "x"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s.getField("m").cast("float"),
                ).alias("cv")
            )
        )
        # empty clusters keep their previous centroid
        kept = cents.join(means.select("centroid_id"), "centroid_id", "left_anti")
        cents = means.unionByName(kept).localCheckpoint(eager=True)
    return cents


def quantize_vec(a: Column, quantize: int = 1000) -> Column:
    """House int64 quantization: ``floor(x*q + 0.5)`` per component."""
    return F.transform(
        a, lambda x: F.floor(x.cast("double") * quantize + F.lit(0.5)).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors (order-free)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def int_cosine(a: Column, b: Column) -> Column:
    """Quantized-integer cosine: exact int64 dot/norms, then the house
    double-division order (dot / sqrt(na) / sqrt(nb)) — bit-identical
    across Spark folds, numpy matmuls, and DuckDB list_reduce."""
    return (
        int_dot(a, b).cast("double")
        / F.sqrt(int_dot(a, a).cast("double"))
        / F.sqrt(int_dot(b, b).cast("double"))
    )


def kmeans_refine_exact(
    corpus: DataFrame,
    n_centroids: int = 16,
    rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
) -> DataFrame:
    """Lloyd refinement in EXACT integer arithmetic — the oracle-able form.

    Two observations make a fixed-round Lloyd loop engine-independent
    despite iterative means:

    - Quantized int64 components make every per-dimension SUM exact, so
      accumulation order cannot matter (the float-mean form,
      :func:`kmeans_refine`, is order-dependent and stays rows-only).
    - Cosine is scale-invariant, so the refined 'centroid' can BE the
      member-sum vector — dividing by the member count would change no
      assignment, and skipping it keeps round 2's scoring in exact
      integers too.

    Per round: broadcast integer-cosine scoring (corpus never shuffles;
    ties toward the smallest centroid_id), posexplode + partial-agg
    int64 sums (shuffle bounded by n_centroids * dim * partitions),
    empty clusters keep their previous vector, lineage truncated per
    round. Returns the final per-vector assignment (id, centroid_id) —
    every number on the way is reproducible bit-for-bit by the DuckDB
    oracle that unrolls the same rounds as CTEs.
    """
    key = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    qv = corpus.select(F.col(id_col), quantize_vec(F.col(vec_col), quantize).alias("qv"))
    cents = (
        qv.orderBy(key, id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col("qv").alias("cv"))
    )

    def assign(c: DataFrame) -> DataFrame:
        scored = qv.crossJoin(F.broadcast(c)).select(
            id_col, "qv", "centroid_id", int_cosine(F.col("qv"), F.col("cv")).alias("csim")
        )
        w = Window.partitionBy(id_col).orderBy(F.desc("csim"), "centroid_id")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, "qv", "centroid_id")
        )

    for _ in range(rounds):
        assigned = assign(cents)
        sums = (
            assigned.select("centroid_id", F.posexplode("qv").alias("dim", "x"))
            .groupBy("centroid_id", "dim")
            .agg(F.sum("x").alias("s"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "s"))),
                    lambda st: st.getField("s"),
                ).alias("cv")
            )
        )
        kept = cents.join(sums, "centroid_id", "left_anti")
        cents = sums.unionByName(kept).localCheckpoint(eager=True)
    return assign(cents).select(id_col, "centroid_id")


def cosine_pairs_np(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
) -> DataFrame:
    """Exact all-pairs cosine-threshold join, Arrow/numpy formulation.

    The full (quantized int64) matrix ships to every task as a closure
    capture; each Arrow batch of the streamed side computes one
    ``batch x corpus`` integer matmul and keeps only (a < b, cosine >=
    threshold) survivors. Arithmetic is bit-identical to the JVM
    higher-order-function form (and the DuckDB oracle): floor(x*1000 +
    0.5) int64 quantization, exact integer dot/norm, then the same
    dot / sqrt(na) / sqrt(nb) double-division order — but the inner loop
    is one BLAS call per batch instead of interpreted per-element
    lambdas (~10x at sf0.1).

    Scale posture: this is the exact-verify BASELINE, viable while the
    broadcast matrix fits (n * dim * 8 bytes — ~50M vectors x 64 dims
    per 32 GB executor). Beyond that the candidate set must come from
    the sublinear paths (sign-LSH / IVF / PQ) and only candidates pay
    the dot product (`operators.dedupe.embedding_near_dups`).

    The build side reaches the driver as ONE Arrow table (``toArrow``,
    columnar — no Python Row objects, whose ~10x per-value overhead is
    what kills drivers at scale), is converted straight to packed numpy
    arrays, and ships to executors via ``sparkContext.broadcast`` (one
    torrent-distributed copy per executor) rather than a closure capture
    re-pickled into every task.
    """
    import numpy as np

    tbl = emb.select(id_col, vec_col).toArrow()
    bid_np = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    vecs = tbl.column(vec_col).combine_chunks()
    # ListArray.flatten() yields the packed values buffer (offset-aware);
    # fixed-width vectors reshape to (n, dim) with zero Python objects
    mat_np = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat_np = mat_np.reshape(len(bid_np), -1)
    B_np = np.floor(mat_np * quantize + 0.5).astype(np.int64)

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((bid_np, B_np))
    want = spark.sparkContext.defaultParallelism
    side = emb.select(id_col, vec_col)
    if side.rdd.getNumPartitions() < want:
        side = side.repartition(want)

    def _pairs(batches):
        import numpy as np
        import pandas as pd

        bid, B = bc.value
        bnrm = np.sqrt((B * B).sum(axis=1).astype(np.float64))
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.floor(
                np.asarray(list(pdf[vec_col]), dtype=np.float64) * quantize + 0.5
            ).astype(np.int64)
            aid = pdf[id_col].to_numpy(dtype=np.int64)
            anrm = np.sqrt((A * A).sum(axis=1).astype(np.float64))
            S = (A @ B.T).astype(np.float64)
            S = S / anrm[:, None]
            S = S / bnrm[None, :]
            keep = (aid[:, None] < bid[None, :]) & (S >= threshold)
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {"vec_a": aid[ai], "vec_b": bid[bj], "cosine": S[ai, bj]}
            )

    return side.mapInPandas(_pairs, schema="vec_a long, vec_b long, cosine double")


def max_cosine_vs_set(
    corpus: DataFrame,
    refs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-corpus-vector MAX quantized cosine against a BOUNDED reference
    set — the kernel of semantic decontamination (flag training vectors
    too close to any eval/benchmark vector).

    ``refs`` must be genuinely bounded (an eval benchmark is fixed-size
    by definition, like centroids/codebooks — never corpus-growing): it
    rides to every task as a closure capture and each corpus Arrow batch
    computes ONE ``batch x refs`` integer matmul, emitting a single
    ``max_sim`` per vector. No fan-out, no shuffle, no window — the plan
    is scan -> mapInPandas at any corpus size.

    Arithmetic is the house quantized-integer cosine (floor(x*q + 0.5)
    int64 dot/norms, then dot / sqrt(na) / sqrt(nb) double divisions in
    that order), so the score bit-matches the SQL-oracle fold. ``max``
    over exact-identical doubles is order-free, keeping the output
    hash-comparable across engines.
    """
    import numpy as np

    # the boundedness contract is enforced mechanically, not by docstring:
    # the refs collect rides through the same capped guard as the batch-KNN
    # query waves (limit(cap+1) + remediation error), so an accidentally
    # corpus-sized reference set fails loudly instead of OOMing the driver
    rrows = sorted(
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in _collect_query_rows(refs, id_col, vec_col)
    )
    if not rrows:
        raise ValueError("max_cosine_vs_set: empty reference set")
    rvec_l = [v for _, v in rrows]

    def _maxsim(batches):
        import numpy as np
        import pandas as pd

        R = np.floor(np.asarray(rvec_l, dtype=np.float64) * quantize + 0.5).astype(
            np.int64
        )
        rnrm = np.sqrt((R * R).sum(axis=1).astype(np.float64))
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.floor(
                np.asarray(list(pdf[vec_col]), dtype=np.float64) * quantize + 0.5
            ).astype(np.int64)
            vnrm = np.sqrt((V * V).sum(axis=1).astype(np.float64))
            S = (V @ R.T).astype(np.float64)
            S = S / vnrm[:, None]
            S = S / rnrm[None, :]
            out = {
                id_col: pdf[id_col].to_numpy(dtype=np.int64),
                "max_sim": S.max(axis=1),
            }
            for c in keep_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    in_cols = [F.col(id_col), F.col(vec_col)] + [F.col(c) for c in keep_cols]
    keep_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in corpus.select(*[F.col(c) for c in keep_cols]).schema.fields
    ) if keep_cols else ""
    return corpus.select(*in_cols).mapInPandas(
        _maxsim, schema=f"{id_col} long, max_sim double{keep_schema}"
    )


def pq_index_append(
    codes: DataFrame,
    new_batch: DataFrame,
    cents: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
) -> DataFrame:
    """Incrementally extend an IVF-PQ index with a new vector batch.

    The production maintenance path: routing centroids and PQ codebooks
    are FROZEN at initial build time (retraining them would re-encode
    the whole corpus), so appending a batch costs one routing pass and
    one encode pass over the BATCH ONLY — the standing code table is
    untouched. Because ``ivf_assign_np`` and ``pq_encode`` are
    deterministic given frozen artifacts, an incrementally-built index
    is row-identical to a from-scratch encode of the grown corpus under
    the same artifacts (pinned in test_retrieval_ext), so queries need
    no awareness of how the index was built. At 100 TB this is the
    difference between an O(batch) nightly append and an O(corpus)
    rebuild; periodic centroid retraining (drift) is a separate offline
    decision with its own full re-encode cost.
    """
    assigned = ivf_assign_np(
        new_batch, cents, id_col, vec_col, n_probe=1, quantize=quantize
    )
    fresh = pq_encode(
        assigned, codebooks, id_col=id_col, vec_col=vec_col,
        quantize=quantize, keep_cols=("centroid_id",),
    )
    return codes.unionByName(fresh.select(*codes.columns))
