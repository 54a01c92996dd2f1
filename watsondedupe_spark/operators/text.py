"""Text analysis operators: language-id, quality, tokens, fingerprints.

All column expressions are Spark built-ins (whole-stage codegen); the
DataFrame-level operators add at most one shuffle (the per-doc groupBy
in winnowing). The oracle-pinned variants live in
``queries/llm_pipeline.py``; these are the general, tunable forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is", "to"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "de": ("der", "die", "das", "und", "ist", "zu"),
    "fr": ("le", "la", "de", "et", "est", "un"),
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def alpha_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit("[a-z]+"), 0)).cast("long")


def est_bpe_tokens(text: Column) -> Column:
    """chars/4 heuristic — the standard quick estimate for BPE vocab."""
    return F.ceil(F.length(text) / 4.0).cast("long")


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, "[^a-zA-Z0-9 ]", "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.length(text)


def stopword_ratio(text: Column, stopwords=DEFAULT_STOPWORDS) -> Column:
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("double") / F.size(toks)


def avg_token_len(text: Column) -> Column:
    return F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("double") / F.size(tokens(text))


def quality_score(text: Column, full_tokens: int = 50) -> Column:
    """Composite [0, ~1.5] score: enough tokens, low punctuation noise,
    natural stopword density."""
    return (
        F.least(F.lit(1.0), token_count(text) / float(full_tokens))
        * (1.0 - punct_ratio(text))
        * (0.5 + stopword_ratio(text))
    )


def lang_scores(text: Column, markers=None) -> dict[str, Column]:
    markers = markers or LANG_MARKERS
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")
        for lang, words in markers.items()
    }


def predict_lang(df: DataFrame, text_col: str, markers=None) -> DataFrame:
    """Append per-language marker scores and an argmax ``pred_lang``
    column (deterministic first-wins tie-break in key order)."""
    scores = lang_scores(F.col(text_col), markers)
    out = df
    for lang, col in scores.items():
        out = out.withColumn(f"score_{lang}", col)
    langs = list(scores)
    pred = None
    for lang in reversed(langs):
        cond_cols = [F.col(f"score_{lang}") >= F.col(f"score_{other}") for other in langs if other != lang]
        cond = cond_cols[0]
        for c in cond_cols[1:]:
            cond = cond & c
        pred = F.when(cond, lang) if pred is None else F.when(cond, lang).otherwise(pred)
    # reversed iteration means earlier keys win ties (outermost WHEN last)
    return out.withColumn("pred_lang", pred)


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints: md5 over char k-grams, minimum per
    sliding window of ``window`` positions, distinct per document.

    Returns (id, fp) rows — the classic local-fingerprint set used for
    plagiarism/overlap detection; ``n_fingerprints ~ 2*len/(window+1)``.
    """
    kg = (
        df.select(
            F.col(id_col).alias("id"),
            F.length(text_col).alias("n"),
            F.explode(F.sequence(F.lit(1), F.length(text_col) - k + 1)).alias("pos"),
            F.col(text_col).alias("__t"),
        )
        .select("id", "n", "pos", F.md5(F.expr(f"substr(__t, pos, {k})")).alias("h"))
    )
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        kg.select("id", "n", "pos", F.min("h").over(w).alias("fp"))
        .filter(F.col("pos") <= F.col("n") - k + 1 - (window - 1))
        .select("id", "fp")
        .distinct()
    )


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
    ones: bool = False,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order,
    computed with the two-phase distributed scan:

    1. range-repartition on the order key (partition i holds keys below
       partition i+1's), local exclusive cumsum inside each partition;
    2. aggregate one total per partition, prefix-sum those few numbers
       on the small side, broadcast-join the per-partition base offsets
       back.

    A bare ``Window.orderBy`` with no partitionBy would funnel the whole
    table through ONE task; this shape keeps every stage parallel — the
    only single-point work is the per-partition totals list (``#
    partitions`` rows). Result is independent of where the (sampled)
    range boundaries land, so the output is deterministic even though
    partitioning is not.

    ``ones=True`` declares that every ``value_col`` value is the
    literal 1 (rank/id assignment — the most common call). The local
    cumsum then costs nothing (it is the sorted row position, read off
    ``monotonically_increasing_id``) and the whole scan needs ONE
    exchange instead of two. The caller owns the all-ones contract.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(num_partitions, F.col(order_col))
    if ones:
        # r12 fast path (guide §2.4 — remove shuffles outright): when
        # every value is the literal 1 (rank / id assignment), the
        # local exclusive prefix-sum IS the row's 0-based position in
        # its sorted partition, which monotonically_increasing_id()
        # encodes for free (partition id in the upper 31 bits, position
        # in the lower 33 — the documented layout). The old
        # Window.partitionBy(spark_partition_id()) form forced a SECOND
        # full exchange (hashpartitioning(_pid)) right after the range
        # exchange, because Catalyst cannot know `_pid` is the current
        # partition id; this path has no window, no second exchange,
        # and no Python boundary. Evaluated strictly above the
        # per-partition sort, so position follows ``order_col`` order.
        # _pid from spark_partition_id() — the SAME source the totals
        # branch uses — so the base-offset join can never depend on
        # monotonically_increasing_id's internal partition-id bit
        # layout staying in sync across Spark versions (r13, advisor
        # item); only the low 33 bits (the documented per-partition
        # row position) are read off the mono id.
        mono = F.monotonically_increasing_id()
        local = (
            part.sortWithinPartitions(order_col)
            .withColumn("_mono", mono)
            .withColumn("_pid", F.spark_partition_id())
            .withColumn(
                "_local_excl", F.col("_mono").bitwiseAND(F.lit((1 << 33) - 1))
            )
            .drop("_mono")
        )
    else:
        w_local = (
            Window.partitionBy("_pid")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        local = (
            part.withColumn("_pid", F.spark_partition_id())
            .withColumn(
                "_local_excl", F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
            )
        )
    # totals branch reads `part`, not `local`: the range-shuffle Exchange
    # is reused (ReusedExchange), the per-partition sums combine
    # map-side, and only #partitions tiny rows move
    totals = (
        part.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.sum(value_col).alias("_ptotal"))
    )
    w_parts = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.withColumn("_base", F.coalesce(F.sum("_ptotal").over(w_parts), F.lit(0))).select(
        "_pid", "_base"
    )
    return (
        local.join(F.broadcast(bases), "_pid")
        .withColumn(out_col, (F.col("_base") + F.col("_local_excl")).cast("long"))
        .drop("_pid", "_local_excl", "_base")
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chop sequence packing (LM training-data layout).

    Documents are laid end-to-end in ``id_col`` order as one virtual
    token stream, then chopped into fixed ``capacity``-token training
    sequences. Returns one row per document with its token offset in
    the stream and the first/last sequence ids it lands in — the map a
    packing writer needs to emit examples. Offsets come from
    :func:`global_prefix_sum`, so no stage is single-task.
    """
    t = docs.select(F.col(id_col), token_count(F.col(text_col)).cast("long").alias("n_tokens"))
    with_off = global_prefix_sum(t, id_col, "n_tokens", out_col="offset")
    return with_off.select(
        id_col,
        "n_tokens",
        "offset",
        F.floor(F.col("offset") / capacity).cast("long").alias("first_seq"),
        F.floor((F.col("offset") + F.col("n_tokens") - 1) / capacity).cast("long").alias("last_seq"),
    )


def passage_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Overlapping fixed-stride passage windows over whitespace tokens.

    Starts are ``1, 1+stride, 1+2*stride, ...``; a trailing start is
    emitted only if the previous window did not already reach the end
    of the document (``s + window - stride - 1 < n``), so every token
    is covered and no passage is a strict suffix of its predecessor.
    Documents shorter than ``window`` yield exactly one passage.

    The text-level sibling of the CDC chunker (fixed-stride instead of
    content-defined): pure per-row sequence/filter/slice/md5 column
    ops — zero shuffles, zero UDFs, one whole-stage-codegen scan.
    Registered/oracled as ``docs_passage_chunks`` (w=64, s=48).
    """
    if not 0 < stride <= window:
        raise ValueError(
            f"need 0 < stride <= window, got stride={stride}, window={window}"
        )
    w, s = window, stride
    keep = [F.col(c) for c in keep_cols]
    tok = df.select(
        F.col(id_col), F.split(text_col, " ").alias("t"), *keep
    ).select(id_col, "t", F.size("t").alias("n"), *keep)
    st = tok.select(
        id_col,
        "t",
        "n",
        F.filter(
            F.sequence(F.lit(1), F.col("n"), F.lit(s)),
            lambda x: (x == 1) | (x + F.lit(w - s - 1) < F.col("n")),
        ).alias("starts"),
        *keep,
    )
    p = st.select(
        id_col, "t", "n", *keep, F.posexplode("starts").alias("pos", "start_tok")
    )
    ptoks = F.slice(F.col("t"), F.col("start_tok"), w)
    return p.select(
        id_col,
        (F.col("pos") + 1).cast("int").alias("passage_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(ptoks).cast("long").alias("n_tokens"),
        F.md5(F.array_join(ptoks, " ")).alias("passage_hash"),
        *keep,
    )


def pack_sequences_bestfit(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_groups: int | None = None,
) -> DataFrame:
    """Best-fit-decreasing sequence packing (truncation-free bin layout,
    cf. Ding et al. 2024, "Fewer Truncations Improve Language Modeling").

    :func:`pack_sequences` lays documents end-to-end and CHOPS at
    ``capacity`` (simple, zero padding, but splits documents across
    training sequences). This operator instead bin-packs whole
    documents into ``capacity``-token bins so no document is split:
    docs are hash-assigned to ``num_groups`` independent groups, each
    group runs classic best-fit-decreasing locally (sorted by
    (n_tokens desc, id); each doc goes to the fullest open bin it fits,
    ties to the lowest bin), and local bin ids rebase to global ones by
    prefix-summing per-group bin counts (broadcast of ``num_groups``
    rows). A document longer than ``capacity`` gets a bin of its own
    with ``truncated = true``.

    Scale shape: one shuffle (the group hash partition), one Arrow pass
    per group for the sequential heuristic, one tiny aggregate for the
    rebase. Per-group BFD is the standard distributed relaxation — BFD
    uses at most ``11/9 OPT + 1`` bins per group, and groups only add
    one potentially-underfull final bin each, so waste is bounded by
    ``num_groups`` bins regardless of corpus size. Deterministic for a
    fixed ``num_groups``: group assignment, in-group order, and bin
    choice are all pure functions of (id, n_tokens).

    Returns (id, n_tokens, bin_id, bin_fill, truncated): ``bin_fill``
    is the bin's total tokens (reported on every member row),
    ``bin_id`` is globally unique and dense.
    """
    if capacity <= 0:
        raise ValueError(f"need capacity > 0, got {capacity}")
    spark = docs.sparkSession
    if num_groups is None:
        num_groups = spark.sparkContext.defaultParallelism
    t = docs.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        (F.abs(F.xxhash64(F.col(id_col))) % num_groups).alias("grp"),
    )

    def _bfd(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values(["n_tokens", "id"], ascending=[False, True])
        fills: list[int] = []  # fill per open bin, index = local bin id
        out_bin, out_trunc = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > capacity:
                out_bin.append(len(fills))
                out_trunc.append(True)
                fills.append(capacity)  # closed: nothing else fits
                continue
            # best fit: fullest bin with room; ties -> lowest bin id
            best, best_fill = -1, -1
            for i, f in enumerate(fills):
                if f + n <= capacity and f > best_fill:
                    best, best_fill = i, f
            if best < 0:
                best = len(fills)
                fills.append(0)
            fills[best] += n
            out_bin.append(best)
            out_trunc.append(False)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "n_tokens": pdf["n_tokens"],
                "grp": key[0],
                "local_bin": out_bin,
                "truncated": out_trunc,
            }
        )

    packed = t.groupBy("grp").applyInPandas(
        _bfd, schema="id long, n_tokens long, grp long, local_bin long, truncated boolean"
    )
    # rebase local bin ids to a dense global space: per-group bin counts
    # prefix-summed (num_groups rows — driver-free, broadcast back)
    counts = packed.groupBy("grp").agg((F.max("local_bin") + 1).alias("nb"))
    bases = global_prefix_sum(counts, "grp", "nb", out_col="base", num_partitions=1)
    withbin = packed.join(F.broadcast(bases.select("grp", "base")), "grp").select(
        "id",
        "n_tokens",
        (F.col("base") + F.col("local_bin")).cast("long").alias("bin_id"),
        "truncated",
    )
    wfill = Window.partitionBy("bin_id")
    return withbin.select(
        "id",
        "n_tokens",
        "bin_id",
        F.sum(F.least(F.col("n_tokens"), F.lit(capacity))).over(wfill).cast("long").alias("bin_fill"),
        "truncated",
    )


def bpe_word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Word vocabulary with corpus frequencies and char-level symbol
    arrays — the starting state of a BPE trainer (Sennrich et al. 2016).

    The token stream collapses to distinct word types in ONE shuffle; all
    subsequent merge rounds operate on this vocab-bounded table, so a
    100 TB corpus is scanned exactly once no matter how many merges are
    trained. Returns ``(word, freq, syms array<string>)``.
    """
    words = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word")).filter(
        F.col("word") != ""
    )
    chars = F.expr("transform(sequence(1, char_length(word)), i -> substring(word, i, 1))")
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .select("word", "freq", chars.alias("syms"))
    )


def bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over the vocab, weighted by word
    frequency: ``(a, b, cnt)``. The explode runs over symbol sequences
    of the (bounded) vocabulary, never the corpus token stream."""
    pairs = (
        vocab.filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i-1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
        )
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").cast("long").alias("cnt")
    )


def bpe_merge_step(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge ``(a, b) -> a+b`` to every word's symbol array.

    Greedy left-to-right with correct overlap semantics via a JVM-side
    left fold (``aggregate``): scanning each word once, a merge consumes
    both symbols, so ``aaa`` under merge (a,a) becomes ``[aa, a]`` — the
    freshly merged symbol does NOT immediately re-merge with the next
    input symbol (the standard BPE application rule). Row-local, zero
    shuffle, inside codegen.
    """
    ab = a + b
    merged = F.aggregate(
        "syms",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(ab))),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.select("word", "freq", merged.alias("syms"))


def bpe_train(
    vocab: DataFrame, n_merges: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merge rules over a word vocabulary.

    Per round: one vocab-bounded pair-count aggregation (map-side
    combined), a distributed TakeOrdered argmax with a deterministic
    ``(count DESC, pair ASC)`` tiebreak, and one row-local merge fold.
    The single argmax row is the only thing the driver ever holds per
    round (the merge table IS driver state in every BPE trainer — it is
    the artifact being trained, a few KB for a real vocab). Lineage is
    truncated per round (localCheckpoint, house pattern from
    connected_components), so the plan does not grow with ``n_merges``.

    Returns ``(merges, final_vocab)``; training stops early if no pair
    occurs twice (nothing left to compress).
    """
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            bpe_pair_counts(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < 2:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = bpe_merge_step(vocab, a, b).localCheckpoint(eager=True)
    return merges, vocab


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]], word_col: str = "word") -> DataFrame:
    """Segment words with a trained merge list (inference side): chars,
    then each merge applied in training order via the same row-local
    fold as :func:`bpe_merge_step`. Adds ``syms array<string>``."""
    chars = F.expr(
        f"transform(sequence(1, char_length({word_col})), i -> substring({word_col}, i, 1))"
    )
    out = df.select("*", chars.alias("syms"))

    # closure factory: a default-arg lambda would exceed the 1-3 arg
    # arity F.aggregate requires of a higher-order function (the same
    # pitfall docs_bm25_lite documents)
    def step(a: str, b: str):
        ab = a + b
        return lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(ab))),
        ).otherwise(F.concat(acc, F.array(x)))

    for a, b in merges:
        out = out.withColumn(
            "syms",
            F.aggregate("syms", F.expr("CAST(array() AS array<string>)"), step(a, b)),
        )
    return out
