"""Physical-plan audits — make the 100 TB posture checkable, not aspirational.

The reference has no planner (SURVEY.md §4); on Spark the plan IS the
performance contract. These helpers read ``df._jdf...executedPlan`` /
``explain`` output and assert the properties a plan must keep to survive
a 1000-executor, 100 TB run:

- small dimension tables join by **broadcast**, not shuffle;
- filters/column pruning reach the parquet scan (**PushedFilters** /
  narrow **ReadSchema**);
- no accidental **CartesianProduct** / **BroadcastNestedLoopJoin**;
- hash aggregates keep a map-side **partial** phase (no raw
  single-phase shuffle of every row);
- hot expressions stay inside **WholeStageCodegen** spans.

Tests call these against the headline queries so a regression that
flips a broadcast join to a sort-merge shuffle (or un-pushes a filter)
fails CI, not the cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )


def count_occurrences(df: DataFrame, pattern: str) -> int:
    return len(re.findall(pattern, physical_plan(df)))


def uses_broadcast_join(df: DataFrame) -> bool:
    """At least one join executes as broadcast-hash (dim side shipped,
    no shuffle of the fact side)."""
    return count_occurrences(df, r"BroadcastHashJoin") > 0


def has_shuffle_join(df: DataFrame) -> bool:
    return count_occurrences(df, r"SortMergeJoin|ShuffledHashJoin") > 0


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan degenerates into an all-pairs join — the #1 way a
    query that passes at sf0.01 dies at sf100."""
    return count_occurrences(df, r"CartesianProduct|BroadcastNestedLoopJoin") > 0


def pushed_filters(df: DataFrame) -> list[str]:
    """The filter expressions that reached the parquet scan."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        expr = m.group(1).strip()
        if expr:
            out.extend(s.strip() for s in expr.split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each parquet scan actually reads (column pruning check:
    a scan reading every column for a 2-column projection is a bug)."""
    plan = physical_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def max_scan_width(df: DataFrame) -> int:
    return max((len(s) for s in scan_read_schemas(df)), default=0)


def has_partial_aggregation(df: DataFrame) -> bool:
    """An aggregate operator appears in both partial (map-side) and final
    mode — i.e. combining happens before the shuffle, so shuffle volume
    is |groups|, not |rows|. Any aggregate flavor counts: HashAggregate,
    ObjectHashAggregate, or SortAggregate (Catalyst falls back to the
    sort-based operator when an agg function isn't hash-capable, e.g.
    ``first`` on the Expand multi-distinct path — the map-side combine
    still happens)."""
    plan = physical_plan(df)
    return bool(re.search(r"HashAggregate|SortAggregate", plan)) and bool(
        re.search(r"partial_|Partial", plan)
    )


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fewer, wider spans = more of the
    query compiled into single JVM loops). Formatted explain tags operators
    with ``[codegen id : N]``; simple mode prints ``WholeStageCodegen (N)``.

    Under AQE the pre-execution plan carries no codegen annotation —
    execute the SAME DataFrame first (``df.collect()``) so the adaptive
    plan is final, then this returns the real span count."""
    plan = physical_plan(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    ids.update(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def scan_count(df: DataFrame) -> int:
    """Number of source scans in the plan. Formatted mode prints each
    node twice (tree line + detail header) — count only the numbered
    detail headers, falling back to the simple plan's inline form."""
    plan = physical_plan(df)
    formatted = len(re.findall(r"\(\d+\) Scan ", plan))
    if formatted:
        return formatted
    return len(re.findall(r"Scan ", simple_plan(df)))


def executed_scan_count(df: DataFrame) -> int:
    """Source scans that actually RUN. A DAG whose branches share a
    subtree prints one scan per branch in the initial plan, but AQE's
    exchange reuse collapses them at runtime into ReusedQueryStage
    references — so count tree-level scans in the Final Plan section
    only, after the caller has executed the DataFrame (``df.collect()``).
    Falls back to the whole plan when AQE hasn't finalized one."""
    plan = physical_plan(df)
    final = plan.split("== Initial Plan ==")[0]
    return len(re.findall(r"Scan (?:parquet|csv|json|orc|text|ExistingRDD)", final))


def executed_shuffle_count(df: DataFrame) -> int:
    """Shuffle Exchanges that actually RUN, post-AQE: tree-level Exchange
    nodes in the Final Plan section, excluding BroadcastExchange (not a
    shuffle of the big side) and ReusedExchange / ReusedQueryStage
    (computed once elsewhere). Call after ``df.collect()``; before the
    plan finalizes this degrades to counting the whole initial plan."""
    plan = physical_plan(df)
    final = plan.split("== Initial Plan ==")[0]
    return len(re.findall(r"(?:^|[:+\-] )Exchange \(\d+\)", final, re.MULTILINE))


def shuffle_count(df: DataFrame) -> int:
    """Shuffle Exchange operators in the plan (BroadcastExchange excluded
    — shipping a small table is not a shuffle of the big one). Every one
    is a full network rewrite of its input at scale; audits pin the
    expected count so an accidental extra shuffle fails loudly.

    Matches both explain formats: formatted mode names the operator
    ``(N) Exchange``; simple mode inlines ``Exchange hashpartitioning...``.
    """
    plan = physical_plan(df)
    formatted = len(re.findall(r"\(\d+\) Exchange\b", plan))
    if formatted:
        return formatted
    return len(
        re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)
    )


# --------------------------------------------------------------------------
# The no-corpus-broadcast invariant (round 8).
#
# Round 7's 100x deep scale tier caught three joins whose build side
# grows with the corpus but was BROADCAST — AQE runtime conversion or
# Catalyst's post-aggregation static underestimate made a relation that
# is O(corpus) look tiny (one crossed Spark's 8 GiB broadcast cap, one
# hashed 1.1 GB on the driver). Those three sites are pinned
# shuffle_hash; this audit generalizes the fix into a RULE: walk every
# BroadcastExchange subtree in a finalized plan and fail unless the
# broadcast side is provably cardinality-bounded — by a limit/top-k, by
# an aggregate whose keys have a bounded domain, by a point filter on a
# key column, or because its only leaves are genuinely bounded relations
# (dims, literals, codebooks, centroids, spines).
#
# The detection trick: at TEST scale every corpus-growing side is small,
# so any UNPINNED site shows up as an actual broadcast in the sf0.001
# plan — exactly the latent bug class. The audit therefore finds at
# small sf what previously required a 100x deep-tier run per query.
# --------------------------------------------------------------------------

# Tables whose row count scales with the corpus (TPC-H SF tables, the
# synthetic pipeline tables, and every engine-store table). region and
# nation are fixed-size dims and deliberately absent.
CORPUS_TABLES = frozenset({
    "customer", "supplier", "part", "partsupp", "orders", "lineitem",
    "events", "documents", "embeddings",
    # engine store tables (grow with ingested data)
    "objects", "object_map", "chunk_store", "chunks", "refcounts",
})

# Column names that mark a relation as corpus-derived when the leaf is
# an in-memory substrate (Scan ExistingRDD / LocalTableScan) rather
# than a parquet scan with a recognizable path: per-document ids, pair
# ids, chunk/object keys, gram/shingle hashes.
CORPUS_COL_MARKERS = frozenset({
    "doc_id", "a_id", "b_id", "id_a", "id_b", "object_key", "chunk_key",
    "gram", "shingle", "sig", "minhash",
})

# Grouping keys with a bounded domain: an aggregate keyed ONLY by these
# produces O(domain) rows no matter the corpus size, so its result may
# broadcast. Everything here is either a small categorical (source,
# lang, label, flags), a fixed-width bucket index (band, plane, code,
# cell, centroid), or a calendar grain.
BOUNDED_AGG_KEYS = frozenset({
    "source", "lang", "language", "label", "event_type", "status",
    "o_orderstatus", "o_orderpriority", "l_returnflag", "l_linestatus",
    "l_shipmode", "c_mktsegment", "n_name", "r_name", "p_brand",
    "p_type", "p_size", "p_container", "nation", "region",
    "centroid_id", "cid", "cell", "code", "codebook_id", "subq", "sub",
    "band", "b", "plane", "bit", "bucket_bits", "probe", "m",
    "day", "dow", "hour", "week", "month", "year", "grain", "vocab_cut",
    "quantile", "decile", "bucket_id", "qbucket", "threshold", "thr",
    "source_a", "source_b", "lang_a", "lang_b", "label_a", "label_b",
})

# Key columns where an EqualTo/In pushed filter bounds a corpus scan to
# O(1)/O(probe-list) rows (point lookups, probe sets). For UNIQUE id
# columns a pushed literal UPPER bound is also accepted (``vec_id < 3``
# selects at most 3 rows at every corpus size — the query-vector sample
# convention): the literal is fixed at authoring time, so the selected
# set cannot grow with the corpus.
POINT_FILTER_COLS = frozenset({
    "object_key", "doc_id", "chunk_key", "user_id", "query_id",
    "centroid_id",
})
UNIQUE_ID_COLS = frozenset({"doc_id", "vec_id", "query_id", "id"})

_LEAF_RE = re.compile(
    r"^(?:Scan (?:parquet|csv|json|orc|text|ExistingRDD)|LocalTableScan|Range\b)"
)
_BOUNDING_RE = re.compile(
    r"^(?:GlobalLimit|LocalLimit|CollectLimit|TakeOrderedAndProject|Sample\b)"
)
_AGG_RE = re.compile(r"^(?:HashAggregate|ObjectHashAggregate|SortAggregate)")

# Nodes that BREAK Catalyst's size-estimate tracking: below one of
# these, the static estimate of the subtree's output no longer scales
# with the input files, so a "looks tiny, broadcast it" decision made at
# any one scale does NOT self-correct at 100x (the round-7 bug class:
# post-aggregation and post-join sides). A broadcast side consisting
# only of Filter/Project/scan nodes is scale-safe — its estimate is
# proportional to file size, so the planner flips it to a shuffle join
# on its own once the table is big.
# Only aggregates and joins qualify: every row-count-preserving (or
# constant-factor) operator — Filter, Project, Generate, Window,
# MapInPandas, Expand — inherits a size estimate proportional to its
# child's, which is itself proportional to the input files, so the
# "broadcast it" decision self-corrects as the corpus grows. Aggregates
# and joins are where the estimate decouples from input scale (and
# where round 7's three 100x bugs all lived).
_ESTIMATE_BREAKER_RE = re.compile(
    r"^(?:HashAggregate|ObjectHashAggregate|SortAggregate|.*Join\b)"
)

# Nodes that can EXPAND row count between a measured shuffle stage and a
# BroadcastExchange. When a broadcast's input chain down to a
# ShuffleQueryStage contains only non-expanding nodes, the broadcast was
# an AQE conversion anchored to MEASURED shuffle bytes (every op between
# shrinks or preserves rows, so measured bytes upper-bound the relation)
# — at 100x the measured size is 100x larger and the conversion
# self-disables. That shape is scale-ADAPTIVE; the bug class is the
# unanchored one (static estimates over aggregates/joins, which stay
# "tiny" at every scale).
_EXPANDING_RE = re.compile(
    r"^(?:Generate\b|Expand\b|.*Join\b|Union\b|FlatMapGroupsInPandas"
    r"|MapInPandas|ArrowEvalPython|BatchEvalPython|FlatMapCoGroupsInPandas)"
)


def _final_tree_and_details(df: DataFrame):
    """Parse the formatted plan into (tree nodes of the FINAL plan,
    detail blocks by node id). Tree nodes are (depth, name, id) where
    depth orders parents above their subtrees. Before AQE finalizes, the
    whole (initial) tree is used — runtime broadcast conversions only
    appear post-execution, so auditing callers should collect() first."""
    plan = physical_plan(df)
    tree_part = plan.split("== Initial Plan ==")[0]
    nodes = []
    for line in tree_part.splitlines():
        m = re.match(r"^(?P<pre>[\s:+\-]*)(?:\* )?(?P<name>[A-Za-z][^()]*?)\s*"
                     r"\((?P<id>\d+)\)(?:,.*)?$", line)
        if not m:
            continue
        name = m.group("name").strip()
        if name in ("AdaptiveSparkPlan",):
            continue
        nodes.append((len(m.group("pre")), name, int(m.group("id"))))
    details: dict[int, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) .*?$((?:\n(?!\(\d+\) |== ).*)*)", plan, re.MULTILINE
    ):
        details[int(m.group(1))] = m.group(2)
    return nodes, details


def _detail_field(detail: str, field: str) -> str:
    m = re.search(rf"{field}(?: \[\d+\])?: (.*)", detail or "")
    return m.group(1) if m else ""


def _strip_attr(name: str) -> str:
    """``cast(source#5 as string)`` / ``source#5L`` -> ``source``."""
    name = name.strip()
    m = re.search(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", name)
    return m.group(1) if m else name


def _defining_expr(plan_details: str, attr: str) -> str | None:
    """The expression that defines attribute ``name#id`` somewhere in the
    plan (``pmod(xxhash64(t#5), 4096) AS h#88`` -> the pmod expr).
    Scans backwards from ``AS name#id`` balancing parentheses so nested
    commas don't truncate the expression."""
    for m in re.finditer(rf" AS {re.escape(attr)}(?:#\d+)?\b", plan_details):
        start = m.start()
        depth = 0
        i = start - 1
        while i >= 0:
            c = plan_details[i]
            if c in ")]":
                depth += 1
            elif c in "([":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            elif c == "\n":
                break
            i -= 1
        expr = plan_details[i + 1 : start].strip()
        if expr:
            return expr
    return None


# Expression shapes whose output domain is bounded regardless of input
# cardinality: modulus / bitmask bucketing (fixed bucket count), calendar
# extraction (fixed grain domain), partition ids (cluster-bounded).
_BOUNDED_EXPR_RES = [
    re.compile(r"%\s*\d+\b"),
    re.compile(r"&\s*\d+\b"),
    re.compile(
        r"\b(?:year|quarter|month|dayofweek|weekday|dayofmonth|hour|minute"
        r"|date_trunc|to_date|window)\("
    ),
    re.compile(r"\bSPARK_PARTITION_ID\(\)", re.I),
    # coarse time grain, per unit (grain >= 10 seconds — wall-clock
    # bounded): the digit floor must scale with the unit, or per-second
    # micros buckets (div 1000000, 7 digits) would classify bounded
    # while minute-grain millis (div 60000, 5 digits) got rejected
    re.compile(r"\bunix_micros\(.*div\s+\d{8,}", re.S),
    re.compile(r"\bunix_millis\(.*div\s+\d{5,}", re.S),
    re.compile(r"\bunix_seconds\(.*div\s+\d{2,}", re.S),
]


def _pmod_literal_modulus(expr: str) -> bool:
    """True when some ``pmod(...)`` call in ``expr`` has an INTEGER
    LITERAL as its final top-level argument — the modulus, which bounds
    the output domain. Parsed with balanced parens: a greedy regex
    (``pmod\\(.*, \\d+\\)``) anchors on integer literals belonging to
    OTHER calls — e.g. the seed in ``pmod(xxhash64(g#12, 42), n#9)`` —
    and would bless a COLUMN modulus, which bounds nothing."""
    for m in re.finditer(r"\bpmod\(", expr):
        i = m.end()
        depth = 1
        start = i
        while i < len(expr) and depth:
            c = expr[i]
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            i += 1
        if depth:  # unbalanced tail — truncated plan text proves nothing
            continue
        args = _split_top(expr[start : i - 1])
        if args and re.fullmatch(r"\d+", args[-1].strip()):
            return True
    return False


def _expr_is_bounded(expr: str) -> bool:
    return any(r.search(expr) for r in _BOUNDED_EXPR_RES) or _pmod_literal_modulus(
        expr
    )


def _key_is_bounded(key: str, all_details: str, depth: int = 0) -> bool:
    """A grouping key is bounded when its base name is whitelisted OR its
    defining expression is a bounded shape (bucketing/calendar), chasing
    one level of aliasing (``x AS y`` where x is itself bounded)."""
    base = _strip_attr(key)
    if base in BOUNDED_AGG_KEYS:
        return True
    if depth >= 3:
        return False
    expr = _defining_expr(all_details, base) or (key if "(" in key else None)
    if not expr:
        return False
    if _expr_is_bounded(expr):
        return True
    # plain alias of another attribute: recurse on the underlying name
    m = re.fullmatch(r"(?:cast\()?([A-Za-z_][A-Za-z0-9_]*)#\d+[A-Za-z]*(?: as [a-z()0-9, ]+)?\)?", expr)
    if m:
        return _key_is_bounded(m.group(1), all_details, depth + 1)
    return False


def _split_top(text: str) -> list[str]:
    """Split a bracket-stripped expression list on top-level commas."""
    out, depth, cur = [], 0, []
    for c in text:
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == "," and depth == 0:
            if "".join(cur).strip():
                out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def _leaf_is_corpus(name: str, detail: str) -> bool:
    if name.startswith("Range"):
        return False
    loc = _detail_field(detail, "Location")
    if loc:
        stems = re.findall(r"([A-Za-z_][A-Za-z0-9_]*)(?:\.parquet)?[\]/,]", loc)
        if any(s in CORPUS_TABLES for s in stems):
            return True
        # unknown parquet path: fall through to the column markers
    out_cols = {
        _strip_attr(c)
        for c in _detail_field(detail, "Output").strip("[]").split(",")
        if c.strip()
    }
    return bool(out_cols & CORPUS_COL_MARKERS)


def _leaf_has_point_filter(detail: str) -> bool:
    pf = _detail_field(detail, "PushedFilters")
    if re.search(
        rf"(?:EqualTo|In)\(({'|'.join(sorted(POINT_FILTER_COLS))})[,)]", pf
    ):
        return True
    # literal upper bound on a unique id: a fixed-size sample window
    return bool(
        re.search(
            rf"LessThan(?:OrEqual)?\(({'|'.join(sorted(UNIQUE_ID_COLS))}),\s*-?[\d.]+\)",
            pf,
        )
    )


def broadcast_audit(df: DataFrame) -> list[dict]:
    """One report entry per BroadcastExchange subtree in the finalized
    plan: ``{"ok": bool, "reason": str, "leaves": [...], "node_id": N}``.
    Callers should execute the DataFrame first (``df.collect()``) so
    AQE's runtime broadcast conversions are visible — they are the bug
    class this exists to catch."""
    nodes, details = _final_tree_and_details(df)
    reports = []
    for i, (depth, name, nid) in enumerate(nodes):
        if not name.startswith("BroadcastExchange"):
            continue
        subtree = []
        for d2, n2, id2 in nodes[i + 1:]:
            if d2 <= depth:
                break
            subtree.append((d2, n2, id2))
        entry = {"node_id": nid, "leaves": [], "ok": False, "reason": ""}

        if any(_BOUNDING_RE.match(n2) for _, n2, _ in subtree):
            entry.update(ok=True, reason="limit/top-k bounds the side")
            reports.append(entry)
            continue

        corpus_leaves = []
        for _, n2, id2 in subtree:
            if not _LEAF_RE.match(n2):
                continue
            det = details.get(id2, "")
            is_corpus = _leaf_is_corpus(n2, det)
            loc = _detail_field(det, "Location")
            entry["leaves"].append(
                {"name": n2, "id": id2, "corpus": is_corpus, "location": loc}
            )
            if is_corpus and not _leaf_has_point_filter(det):
                corpus_leaves.append((n2, id2))

        if not corpus_leaves:
            entry.update(
                ok=True,
                reason="bounded leaves only (dims/literals/point-filtered)",
            )
            reports.append(entry)
            continue

        # Corpus leaves present. A pure Filter/Project/scan side is still
        # scale-SAFE: Catalyst's static estimate for it is proportional
        # to file size, so the broadcast decision self-corrects once the
        # table is big (TPC-H dims-to-fact at small sf). The danger is an
        # ESTIMATE BREAKER between the leaf and the exchange — an
        # aggregate/join/explode/window whose output estimate no longer
        # tracks the input scale (the round-7 bug class).
        breakers = [
            (d2, n2, id2)
            for d2, n2, id2 in subtree
            if _ESTIMATE_BREAKER_RE.match(n2)
        ]
        if not breakers:
            entry.update(
                ok=True,
                reason="scan-tracking side (Filter/Project over file scan): "
                "static size estimate scales with the corpus, so the "
                "planner flips to a shuffle join on its own at scale",
            )
            reports.append(entry)
            continue

        # the side is bounded outright if the stream passes through an
        # aggregate whose keys all have bounded domains (or a keyless
        # 1-row aggregate). Use the shallowest aggregate in the subtree
        # (nearest the exchange) — it dominates the output cardinality.
        aggs = [(d2, n2, id2) for d2, n2, id2 in subtree if _AGG_RE.match(n2)]
        keys: list[str] = []
        if aggs:
            d2, n2, id2 = min(aggs)
            keys_raw = _detail_field(details.get(id2, ""), "Keys")
            raw_keys = _split_top(keys_raw.strip().strip("[]"))
            all_details = "\n".join(details.values())
            keys = [_strip_attr(k) for k in raw_keys]
            if all(_key_is_bounded(k, all_details) for k in raw_keys):
                entry.update(
                    ok=True,
                    reason=f"bounded-key aggregate over {keys or 'no keys (1 row)'}",
                )
                reports.append(entry)
                continue

        # anchored-to-measured-shuffle allowance: if the chain from the
        # exchange down to the first ShuffleQueryStage contains no
        # row-expanding node, the broadcast is an AQE conversion keyed
        # off MEASURED bytes — scale-adaptive (measured bytes grow with
        # the corpus, so the conversion self-disables at 100x). Strict
        # consumers (the heavy-family plan test) still treat these as
        # violations via strict=True: measured-bytes -> in-memory-hashed
        # inflation (~10x) makes even an anchored conversion a ~0.6 GB
        # driver relation at the wrong scale point, which round 7 deemed
        # unacceptable for the corpus-pair families.
        stage_idx = next(
            (
                j
                for j, (_, n2, _) in enumerate(subtree)
                if n2.startswith(
                    ("ShuffleQueryStage", "TableCacheQueryStage", "InMemoryTableScan")
                )
            ),
            None,
        )
        if stage_idx is not None and not any(
            _EXPANDING_RE.match(n2) for _, n2, _ in subtree[:stage_idx]
        ):
            entry.update(
                ok=True,
                anchored=True,
                reason="AQE conversion anchored to a measured shuffle/cache stage "
                "(non-expanding chain"
                + (f"; agg keyed by {keys}" if keys else "")
                + "): measured bytes scale with the corpus, so the "
                "conversion self-disables at scale",
            )
            reports.append(entry)
            continue

        if aggs:
            entry.update(
                ok=False,
                reason=f"corpus leaves {[l for _, l in corpus_leaves]} reach the "
                f"broadcast through an aggregate keyed by {keys} — keys not "
                "provably bounded and no measured-shuffle anchor",
            )
            reports.append(entry)
            continue

        entry.update(
            ok=False,
            reason=f"corpus-growing leaves {[l for _, l in corpus_leaves]} behind "
            f"estimate-breaking node(s) {sorted({n2 for _, n2, _ in breakers})} "
            "on a broadcast side",
        )
        reports.append(entry)
    return reports


# Documented per-query exceptions: broadcast sides that ARE bounded by
# construction but whose bound the text classifier cannot see. Every
# entry must state the boundedness argument and, where one exists, the
# dedicated plan test that pins the same shape. Reviewed per round.
#
# Round-9 hardening (advice item): an exception is no longer a blanket
# per-query pass — it excuses at most ``max`` violations whose reason
# matches ``reason_re``, so a NEW, unrelated broadcast violation later
# introduced into an allowlisted query still fails the sweep instead of
# hiding behind the old exemption. Apply with
# :func:`filter_allowed_violations`.
BROADCAST_AUDIT_ALLOW: dict[str, dict] = {
    # The refine stage broadcasts the (query x shortlist_k) candidate
    # list: queries come from the vec_id<3 sample and the shortlist is a
    # WindowGroupLimit rank<=k per query — |queries| * k rows at every
    # corpus size. Pinned by test_ivfpq_refined_fetch_is_broadcast.
    "emb_ann_topk_ivfpq_refined": {
        "note": "bounded (query x shortlist_k) refine list",
        "reason_re": r"estimate-breaking node\(s\) "
        r"\['BroadcastHashJoin Inner BuildRight'\]",
        "max": 1,
    },
    # Same shape: each arm's top-k per sampled query (rank<=k windows
    # over the 3-query sample) joins the exact arm — |queries| * k rows.
    # Pinned by test_matryoshka_recall_plan.
    "emb_matryoshka_recall": {
        "note": "bounded (query x k) per-arm top-k lists",
        "reason_re": r"estimate-breaking node\(s\) "
        r"\['BroadcastNestedLoopJoin Cross BuildRight'\]",
        "max": 1,
    },
}


def filter_allowed_violations(
    name: str, violations: list[dict], allow: dict[str, dict]
) -> list[dict]:
    """Violations that survive the documented exceptions for ``name``:
    an entry excuses at most ``max`` violations whose ``reason`` matches
    ``reason_re`` — anything else (a different shape, or more of the
    same shape than the exception priced in) still fails."""
    import re

    entry = allow.get(name)
    if entry is None:
        return violations
    pat = re.compile(entry.get("reason_re", ""), re.S)
    budget = int(entry.get("max", 1))
    kept = []
    for v in violations:
        if budget > 0 and pat.search(v.get("reason", "")):
            budget -= 1
            continue
        kept.append(v)
    return kept


def corpus_broadcast_violations(df: DataFrame, strict: bool = False) -> list[dict]:
    """Non-ok broadcast sides; ``strict=True`` additionally rejects
    AQE measured-shuffle conversions (``anchored``) — the posture the
    heavy corpus-pair families hold (their sides are pinned
    ``shuffle_hash`` so no broadcast of a corpus-growing relation can
    appear at ANY scale point)."""
    return [
        r
        for r in broadcast_audit(df)
        if not r["ok"] or (strict and r.get("anchored"))
    ]


def single_partition_audit(df: DataFrame) -> list[dict]:
    """One report entry per ``Exchange SinglePartition`` in the finalized
    plan — the OTHER classic scale killer: a corpus-sized relation
    funneled through one task (a bare ``Window.orderBy``, a global sort
    before aggregation, a single-phase global aggregate of raw rows).

    Classification is STRICTER than the broadcast audit: there is no
    scan-tracking or measured-anchor allowance, because the planner
    never undoes a SinglePartition requirement as data grows — if
    unbounded rows reach it at any scale, one task absorbs them all.
    The scan is BRANCH-AWARE: a limit/top-k or a bounded-key aggregate
    bounds exactly ITS OWN subtree (a ``dim.limit(5)`` branch of a join
    must not launder the corpus branch next to it — the round-8 review
    catch); a funnel is fine only when NO unfiltered corpus leaf
    survives outside every bounding operator's subtree.
    Callers should ``df.collect()`` first so the audited tree is the
    final adaptive plan."""
    nodes, details = _final_tree_and_details(df)
    all_details = "\n".join(details.values())
    reports = []
    for i, (depth, name, nid) in enumerate(nodes):
        if not name.startswith("Exchange"):
            continue
        if "SinglePartition" not in _detail_field(details.get(nid, ""), "Arguments"):
            continue
        subtree = []
        for d2, n2, id2 in nodes[i + 1:]:
            if d2 <= depth:
                break
            subtree.append((d2, n2, id2))
        entry = {"node_id": nid, "leaves": [], "ok": False, "reason": ""}

        def _skip_subtree(j: int) -> int:
            """Index just past subtree[j]'s own subtree."""
            d0 = subtree[j][0]
            j += 1
            while j < len(subtree) and subtree[j][0] > d0:
                j += 1
            return j

        bounded_by = []  # what bounded each skipped branch (for the reason)
        survivors = []
        j = 0
        while j < len(subtree):
            d2, n2, id2 = subtree[j]
            if _BOUNDING_RE.match(n2):
                bounded_by.append(f"limit/top-k ({n2.strip()})")
                j = _skip_subtree(j)
                continue
            if _AGG_RE.match(n2):
                keys_raw = _detail_field(details.get(id2, ""), "Keys")
                raw_keys = _split_top(keys_raw.strip().strip("[]"))
                keys = [_strip_attr(k) for k in raw_keys]
                if all(_key_is_bounded(k, all_details) for k in raw_keys):
                    bounded_by.append(
                        f"bounded-key aggregate over {keys or 'no keys (1 row)'}"
                    )
                    j = _skip_subtree(j)
                    continue
                # unbounded-key aggregate bounds nothing: keep scanning
            if _LEAF_RE.match(n2):
                det = details.get(id2, "")
                is_corpus = _leaf_is_corpus(n2, det)
                entry["leaves"].append(
                    {"name": n2, "id": id2, "corpus": is_corpus,
                     "location": _detail_field(det, "Location")}
                )
                if is_corpus and not _leaf_has_point_filter(det):
                    survivors.append((n2, id2))
            j += 1

        if not survivors:
            entry.update(
                ok=True,
                reason="every branch bounded ("
                + "; ".join(sorted(set(bounded_by)))
                + ")"
                if bounded_by
                else "bounded leaves only (dims/literals/point-filtered)",
            )
        else:
            entry.update(
                ok=False,
                reason=f"corpus-growing leaves {[l for _, l in survivors]} reach "
                "the SinglePartition exchange outside every bounding "
                "operator's branch — one task absorbs the whole relation "
                "at every scale",
            )
        reports.append(entry)
    return reports


def single_partition_violations(df: DataFrame) -> list[dict]:
    return [r for r in single_partition_audit(df) if not r["ok"]]


def assert_no_corpus_broadcast(df: DataFrame, context: str = "") -> None:
    """Raise AssertionError when any broadcast side is corpus-growing.
    The failure message carries the offending node ids and reasons so
    the fix (a ``shuffle_hash`` hint with the growing side as build, or
    a whitelist entry with a boundedness argument) is obvious."""
    bad = corpus_broadcast_violations(df)
    if bad:
        msgs = "; ".join(f"node {r['node_id']}: {r['reason']}" for r in bad)
        raise AssertionError(
            f"corpus-growing relation on a broadcast side{' in ' + context if context else ''}: {msgs}"
        )


def audit(df: DataFrame) -> dict:
    """One-call plan summary for tests and notebooks."""
    return {
        "broadcast_joins": count_occurrences(df, r"BroadcastHashJoin"),
        "shuffle_joins": count_occurrences(df, r"SortMergeJoin|ShuffledHashJoin"),
        "cartesian": has_cartesian(df),
        "shuffles": shuffle_count(df),
        "pushed_filters": pushed_filters(df),
        "scan_widths": [len(s) for s in scan_read_schemas(df)],
        "partial_agg": has_partial_aggregation(df),
        "codegen_spans": codegen_span_count(df),
    }
