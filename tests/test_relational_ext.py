"""Semantic invariants for the extended relational/query batch
(queries/relational_ext.py + the text-metric additions) beyond the
value-hash oracle check tools/check.py performs:

- sessionization: within a session every inter-event gap <= 30 min, and
  consecutive sessions of one user are separated by > 30 min
- repetition ratio: bounded in (0, 1], distinct <= total
- cross-source overlap: symmetric-free (a < b), counts positive
- q14 promo share: promo_revenue <= total_revenue, pct in [0, 100]
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from watsondedupe_spark.queries import all_queries

GAP_US = 1_800_000_000


@pytest.fixture(scope="module")
def specs():
    return all_queries()


def test_sessionize_gap_invariants(spark, sf_dir, specs):
    sess = specs["events_sessionize_gap"].spark(spark, sf_dir)
    rows = sess.collect()
    assert rows, "sessionization produced no sessions"
    # rebuild raw per-user ordered events and re-segment in plain Python
    from watsondedupe_spark.sources import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    )
    by_user: dict[int, list[tuple[int, int]]] = {}
    by_user_sessions: dict[int, list[int]] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.us, r.event_id))
    for uid, evs in by_user.items():
        evs.sort()
        sessions = [1]
        for (prev, _), (cur, _) in zip(evs, evs[1:]):
            sessions.append(sessions[-1] + (1 if cur - prev > GAP_US else 0))
        by_user_sessions[uid] = sessions
    # expected: per (user, session_seq) count
    expected: dict[tuple[int, int], int] = {}
    for uid, sessions in by_user_sessions.items():
        for s in sessions:
            expected[(uid, s)] = expected.get((uid, s), 0) + 1
    got = {(r.user_id, r.session_seq): r.n_events for r in rows}
    assert got == expected


def test_repetition_ratio_bounds(spark, sf_dir, specs):
    rep = specs["docs_repetition_ratio"].spark(spark, sf_dir)
    bad = rep.filter(
        (F.col("uniq_ratio") <= 0)
        | (F.col("uniq_ratio") > 1)
        | (F.col("distinct_grams") > F.col("total_grams"))
    ).count()
    assert bad == 0
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.size(F.split("text", " ")) >= 5)
        .count()
    )
    assert rep.count() == n_docs


def test_cross_source_overlap_shape(spark, sf_dir, specs):
    ov = specs["docs_cross_source_overlap"].spark(spark, sf_dir).collect()
    for r in ov:
        assert r.source_a < r.source_b
        assert r.shared_shingles > 0


def test_promo_share_bounds(spark, sf_dir, specs):
    row = specs["tpch_q14_promo"].spark(spark, sf_dir).collect()[0]
    assert 0 <= row.promo_revenue <= row.total_revenue
    assert 0.0 <= row.promo_pct <= 100.0


def test_q6_agrees_with_direct_recount(spark, sf_dir, specs):
    row = specs["tpch_q6_revenue"].spark(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        & (F.col("l_discount").cast("decimal(18,2)").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).count()
    assert row.n_rows == n


def test_attribution_contract(spark, sf_dir):
    """Channel buckets partition the purchase set; a driver-side replay
    of the last-touch rule (latest view/click at-or-before within 1h,
    else direct) reproduces every bucket's count."""
    from collections import Counter, defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type", "event_id", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    want = Counter()
    n_purchases = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, 0 if r.event_type != "purchase" else 1, r.event_id))
        last = None  # (ts, event_type)
        for r in rows:
            if r.event_type in ("view", "click"):
                last = (r.ts, r.event_type)
            elif r.event_type == "purchase":
                n_purchases += 1
                if last is not None and (r.ts - last[0]).total_seconds() <= 3600:
                    want[last[1]] += 1
                else:
                    want["direct"] += 1
    out = all_queries()["events_attribution"].spark(spark, sf_dir).collect()
    assert {r.channel: r.n_purchases for r in out} == dict(want)
    assert sum(r.n_purchases for r in out) == n_purchases


def test_dau_wau_contract(spark, sf_dir):
    """DAU/WAU equal a driver-side set recomputation per active day and
    stickiness is exactly dau/wau; WAU is monotone >= DAU."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").selectExpr(
        "CAST(ts AS DATE) AS day", "user_id"
    ).collect()
    by_day = defaultdict(set)
    for r in ev:
        by_day[r.day].add(r.user_id)
    rows = all_queries()["events_dau_wau"].spark(spark, sf_dir).collect()
    got = {r.day: r for r in rows}
    assert set(got) == set(by_day)
    import datetime as dt

    for day, users in by_day.items():
        week = set()
        for back in range(7):
            week |= by_day.get(day - dt.timedelta(days=back), set())
        r = got[day]
        assert (r.dau, r.wau_7d) == (len(users), len(week))
        assert r.stickiness == len(users) / len(week)
        assert r.wau_7d >= r.dau


def test_scd2_intervals_contract(spark, sf_dir):
    """Intervals tile each user's timeline: versions dense from 1,
    consecutive intervals abut exactly (valid_to == next valid_from),
    exactly one open current row per user, no zero-change rows, and the
    reconstruction matches a driver-side replay of the log."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .filter("user_id < 50")
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS us", "event_id")
        .collect()
    )
    log = defaultdict(list)
    for r in ev:
        log[r.user_id].append((r.us, r.event_id, r.event_type))
    want = {}
    for u, rows in log.items():
        rows.sort()
        segs = []
        for us, _eid, et in rows:
            if not segs or segs[-1][1] != et:
                segs.append([us, et])
        want[u] = segs
    rows = all_queries()["events_scd2_intervals"].spark(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert set(by_user) == set(want)
    for u, segs in want.items():
        got = sorted(by_user[u], key=lambda r: r.version)
        assert [r.version for r in got] == list(range(1, len(segs) + 1))
        assert [(r.valid_from_us, r.event_type) for r in got] == [
            (us, et) for us, et in segs
        ]
        for a, b in zip(got, got[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.event_type != b.event_type
            assert not a.is_current
        assert got[-1].is_current and got[-1].valid_to_us is None


def test_seasonal_anomaly_contract(spark, sf_dir):
    """Bucket stats match a driver-side recomputation (decimal-exact
    moments), outlier counts match the 3-sigma test against each
    event's own calendar bucket, and rates are exactly count/n."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").selectExpr(
        "(dayofweek(ts) - 1) AS dow", "hour(ts) AS hr", "CAST(value AS DECIMAL(18,2)) AS v"
    ).collect()
    buckets = defaultdict(list)
    for r in ev:
        buckets[(r.dow, r.hr)].append(Decimal(r.v))
    rows = all_queries()["events_seasonal_anomaly"].spark(spark, sf_dir).collect()
    got = {(r.dow, r.hr): r for r in rows}
    want_keys = {k for k, vs in buckets.items() if len(vs) > 1}
    assert set(got) == want_keys
    for k in want_keys:
        vs = buckets[k]
        n = len(vs)
        s1 = float(sum(vs))
        s2 = float(sum((v * v).quantize(Decimal("0.0001")) for v in vs))
        mean = s1 / n
        sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
        n_out = sum(1 for v in vs if abs((float(v) - mean) / sd) >= 3.0)
        r = got[k]
        assert r.n == n
        assert r.mean == mean and r.sd == sd
        assert r.n_outliers == n_out
        assert r.outlier_rate == n_out / n


def test_rfm_segments_contract(spark, sf_dir):
    """Scores match a driver-side quintile recomputation (percentile_disc
    thresholds, strict-greater bucketing), rfm composes the digits, and
    every score sits in 1..5 with all three dimensions populated."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    orders = read_table(spark, sf_dir, "orders").selectExpr(
        "o_custkey",
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS day",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price",
    ).collect()
    agg = defaultdict(lambda: [0, 0, Decimal(0)])
    for r in orders:
        a = agg[r.o_custkey]
        a[0] = max(a[0], r.day)
        a[1] += 1
        a[2] += Decimal(r.price)

    def disc(vals, q):
        vs = sorted(vals)
        return vs[max(0, math.ceil(q * len(vs)) - 1)]

    def bucket(v, ts):
        return 1 + sum(1 for t in ts if v > t)

    rs = [a[0] for a in agg.values()]
    fs = [a[1] for a in agg.values()]
    ms = [a[2] for a in agg.values()]
    qs = (0.2, 0.4, 0.6, 0.8)
    tr = [disc(rs, q) for q in qs]
    tf = [disc(fs, q) for q in qs]
    tm = [disc(ms, q) for q in qs]
    rows = all_queries()["orders_rfm_segments"].spark(spark, sf_dir).collect()
    assert {r.custkey for r in rows} == set(agg)
    for r in rows:
        a = agg[r.custkey]
        assert (r.recency_day, r.frequency) == (a[0], a[1])
        assert Decimal(str(r.monetary)) == a[2]
        want = (bucket(a[0], tr), bucket(a[1], tf), bucket(a[2], tm))
        assert (r.r_score, r.f_score, r.m_score) == want
        assert r.rfm == want[0] * 100 + want[1] * 10 + want[2]
        assert all(1 <= s <= 5 for s in want)


def test_market_basket_contract(spark, sf_dir):
    """Top-k pairs equal a driver-side recount of basket co-occurrence,
    and support/confidence/lift are exactly the declared ratios."""
    from collections import Counter, defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.relational_ext import _BASKET_K
    from watsondedupe_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    item = Counter()
    pair = Counter()
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair[(ps[i], ps[j])] += 1
    n_baskets = len(baskets)
    want = sorted(pair.items(), key=lambda kv: (-kv[1], kv[0]))[:_BASKET_K]
    rows = all_queries()["lineitem_market_basket"].spark(spark, sf_dir).collect()
    got = {(r.part_a, r.part_b): r for r in rows}
    assert set(got) == {k for k, _ in want}
    for (pa, pb), n_ab in want:
        r = got[(pa, pb)]
        assert (r.n_ab, r.n_a, r.n_b) == (n_ab, item[pa], item[pb])
        assert r.support == n_ab / n_baskets
        assert r.confidence == n_ab / item[pa]
        assert r.lift == (n_ab * n_baskets) / (item[pa] * item[pb])


def test_skyline_contract(spark, sf_dir):
    """The frontier equals a brute-force O(n^2) dominance check per
    brand, and every non-frontier part is dominated by some frontier
    part (the frontier is sufficient, not just undominated)."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    parts = read_table(spark, sf_dir, "part").selectExpr(
        "p_brand", "p_partkey", "p_size",
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS pc",
    ).collect()
    by_brand = defaultdict(list)
    for r in parts:
        by_brand[r.p_brand].append((r.pc, r.p_size, r.p_partkey))

    def dominates(a, b):
        return (a[0] <= b[0] and a[1] >= b[1]) and (a[0] < b[0] or a[1] > b[1])

    want = set()
    for brand, ps in by_brand.items():
        for x in ps:
            if not any(dominates(y, x) for y in ps):
                want.add((brand, x[2]))
    rows = all_queries()["part_skyline_by_brand"].spark(spark, sf_dir).collect()
    got = {(r.p_brand, r.p_partkey) for r in rows}
    assert got == want
    # sufficiency: every excluded part is dominated by a frontier member
    front = defaultdict(list)
    for r in rows:
        front[r.p_brand].append((round(r.retail_price * 100), r.size))
    for brand, ps in by_brand.items():
        for x in ps:
            if (brand, x[2]) not in want:
                assert any(dominates(f, x) for f in front[brand])


def test_conversion_latency_contract(spark, sf_dir):
    """The single row equals a driver-side recomputation: conditional
    first-view/first-buy per user, percentile_disc picks actual data
    values at each quantile."""
    import math
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type", "unix_micros(ts) AS us"
    ).collect()
    fv, fb = {}, {}
    for r in ev:
        if r.event_type == "view":
            fv[r.user_id] = min(fv.get(r.user_id, r.us), r.us)
        elif r.event_type == "purchase":
            fb[r.user_id] = min(fb.get(r.user_id, r.us), r.us)
    lats = sorted(
        fb[u] - fv[u] for u in set(fv) & set(fb) if fb[u] >= fv[u]
    )

    def disc(q):
        return lats[max(0, math.ceil(q * len(lats)) - 1)]

    [r] = all_queries()["events_conversion_latency"].spark(spark, sf_dir).collect()
    assert r.n_converting == len(lats)
    assert (r.min_us, r.max_us) == (lats[0], lats[-1])
    assert (r.p25_us, r.p50_us, r.p75_us, r.p90_us) == (
        disc(0.25), disc(0.5), disc(0.75), disc(0.9)
    )
    assert r.min_us <= r.p25_us <= r.p50_us <= r.p75_us <= r.p90_us <= r.max_us


def test_abc_analysis_contract(spark, sf_dir):
    """Deciles partition all customers, shares sum to 1, cum_share is
    monotone ending at 1, decile 1 carries the highest mean revenue,
    and counts match a driver-side threshold recomputation."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    orders = read_table(spark, sf_dir, "orders").selectExpr(
        "o_custkey", "CAST(o_totalprice AS DECIMAL(18,2)) AS p"
    ).collect()
    rev = defaultdict(lambda: Decimal(0))
    for r in orders:
        rev[r.o_custkey] += Decimal(r.p)
    vals = sorted(rev.values())

    def disc(q):
        return vals[max(0, math.ceil(q * len(vals)) - 1)]

    ts = [disc(i / 10) for i in range(1, 10)]
    want = defaultdict(lambda: [0, Decimal(0)])
    for v in rev.values():
        d = 10 - sum(1 for t in ts if v > t)
        want[d][0] += 1
        want[d][1] += v
    rows = sorted(
        all_queries()["orders_abc_analysis"].spark(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert sum(r.n_customers for r in rows) == len(rev)
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-9
    total = sum(rev.values())
    for r in rows:
        assert r.n_customers == want[r.decile][0]
        assert Decimal(str(r.revenue)) == want[r.decile][1]
    assert rows[-1].cum_share == 1.0  # exact: total decimal / itself
    prev = 0.0
    for r in rows:
        assert r.cum_share >= prev
        prev = r.cum_share
    means = {r.decile: r.revenue / r.n_customers for r in rows}
    assert means[1] == max(means.values())


def test_burst_hours_contract(spark, sf_dir):
    """Rows match a driver-side trailing-window recomputation over the
    hourly rollup: sums/counts over [hr-24, hr-1], the integer-exact
    doubling test, and the warm-up guard."""
    from collections import Counter

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").selectExpr(
        "unix_micros(ts) DIV 3600000000 AS hr"
    ).collect()
    hourly = Counter(r.hr for r in ev)
    rows = all_queries()["events_burst_hours"].spark(spark, sf_dir).collect()
    got = {r.hr: r for r in rows}
    want = {}
    for hr in hourly:
        trail = [hourly[h] for h in range(hr - 24, hr) if h in hourly]
        if len(trail) >= 12:
            want[hr] = (sum(trail), len(trail))
    assert set(got) == set(want)
    for hr, (ts_, th) in want.items():
        r = got[hr]
        assert (r.n, r.trail_sum, r.trail_hours) == (hourly[hr], ts_, th)
        assert r.burst_ratio == (hourly[hr] * th) / ts_
        assert r.is_burst == (hourly[hr] * th >= 2 * ts_)


def test_activity_streaks_contract(spark, sf_dir):
    """Streak stats equal a driver-side consecutive-run scan per user:
    longest run of consecutive active days, run count, total active
    days, and the earliest maximal-run start."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").selectExpr(
        "user_id", "datediff(CAST(ts AS DATE), DATE '1970-01-01') AS day"
    ).collect()
    by_user = defaultdict(set)
    for r in ev:
        by_user[r.user_id].add(r.day)
    rows = all_queries()["events_activity_streaks"].spark(spark, sf_dir).collect()
    got = {r.user_id: r for r in rows}
    assert set(got) == set(by_user)
    for u, days in by_user.items():
        ds = sorted(days)
        runs = []
        start = ds[0]
        prev = ds[0]
        for d in ds[1:]:
            if d != prev + 1:
                runs.append((start, prev - start + 1))
                start = d
            prev = d
        runs.append((start, prev - start + 1))
        longest = max(ln for _, ln in runs)
        first_start = min(s for s, ln in runs if ln == longest)
        r = got[u]
        assert (r.n_streaks, r.n_active_days, r.longest_streak, r.longest_streak_start) == (
            len(runs), len(ds), longest, first_start
        )


def test_price_regression_contract(spark, sf_dir):
    """Slope/intercept equal a numpy lstsq-free closed form over exact
    cents moments per brand, and the integer numerators match."""
    from collections import defaultdict
    from decimal import Decimal

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey",
        "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xi",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yi",
    ).collect()
    brand = {
        r.p_partkey: r.p_brand
        for r in read_table(spark, sf_dir, "part").select("p_partkey", "p_brand").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sx, sy, sxy, sxx
    for r in li:
        a = agg[brand[r.l_partkey]]
        a[0] += 1
        a[1] += r.xi
        a[2] += r.yi
        a[3] += r.xi * r.yi
        a[4] += r.xi * r.xi
    rows = all_queries()["lineitem_price_regression"].spark(spark, sf_dir).collect()
    got = {r.p_brand: r for r in rows}
    for b, (n, sx, sy, sxy, sxx) in agg.items():
        covn = n * sxy - sx * sy
        varn = n * sxx - sx * sx
        if n <= 1 or varn == 0:
            assert b not in got
            continue
        r = got[b]
        assert (r.n, r.cov_num, r.var_num) == (n, covn, varn)
        slope = float(covn) / float(varn)
        assert r.slope == slope
        assert r.intercept == (float(sy) - slope * float(sx)) / (100 * n)


def test_cusum_shift_matches_sequential_recurrence(spark, sf_dir):
    """The windowed closed form (prefix - running-extreme) equals the
    textbook sequential CUSUM recurrence S_d = max(0, S_{d-1} + dev_d)
    run in plain Python, in both directions, including the argmax day."""
    import datetime as dt
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily = defaultdict(lambda: defaultdict(int))
    epoch = dt.date(1970, 1, 1)
    for r in ev:
        daily[r.event_type][(r.ts.date() - epoch).days] += 1

    rows = all_queries()["events_cusum_shift"].spark(spark, sf_dir).collect()
    got = {r.event_type: r for r in rows}
    assert set(got) == set(daily)
    for et, counts in daily.items():
        days = sorted(counts)
        n_days = len(days)
        total = sum(counts.values())
        s_up = s_dn = 0
        best_up = best_dn = 0
        up_day = dn_day = days[0]
        for d in days:
            dev = counts[d] * n_days - total
            s_up = max(0, s_up + dev)
            s_dn = max(0, s_dn - dev)
            if s_up > best_up:
                best_up, up_day = s_up, d
            if s_dn > best_dn:
                best_dn, dn_day = s_dn, d
        r = got[et]
        assert (r.n_days, r.total) == (n_days, total)
        assert (r.max_up_scaled, r.max_down_scaled) == (best_up, best_dn)
        assert r.max_up_events == float(best_up) / n_days
        if best_up > 0:
            assert r.up_day == up_day
        if best_dn > 0:
            assert r.down_day == dn_day


def test_pit_features_match_bruteforce(spark, sf_dir):
    """Every label row's trailing features equal a brute-force scan of
    that user's history with the strictly-before bound."""
    from collections import defaultdict
    from decimal import Decimal

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.relational_ext import _PIT_H1, _PIT_H2
    from watsondedupe_spark.sources import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "event_type", "value", "unix_micros(ts) AS us")
        .collect()
    )
    hist = defaultdict(list)
    for r in ev:
        hist[r.user_id].append(r)

    rows = all_queries()["events_pit_features"].spark(spark, sf_dir).collect()
    labels = [r for r in ev if r.event_type == "purchase"]
    assert len(rows) == len(labels)
    got = {r.event_id: r for r in rows}
    for lab in labels:
        h = hist[lab.user_id]
        w1 = [x for x in h if lab.us - _PIT_H1 <= x.us < lab.us]
        w2 = [x for x in h if lab.us - _PIT_H2 <= x.us < lab.us]
        prev = [x.us for x in h if (x.us, x.event_id) < (lab.us, lab.event_id)]
        r = got[lab.event_id]
        assert r.views_24h == sum(1 for x in w1 if x.event_type == "view")
        assert r.clicks_24h == sum(1 for x in w1 if x.event_type == "click")
        assert r.n_72h == len(w2)
        assert r.value_72h == float(
            sum((Decimal(str(x.value)).quantize(Decimal("0.01")) for x in w2), Decimal(0))
        )
        assert r.us_since_prev == (lab.us - max(prev) if prev else -1)


def test_ewma_anomaly_matches_sequential_recurrence(spark, sf_dir):
    """The bounded-lag integer decomposition tracks the true sequential
    EWMA recurrence: forecasts agree to within the 2^-L truncation tail,
    and the integer flags match exact rational comparisons."""
    import datetime as dt
    from collections import defaultdict
    from fractions import Fraction

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.relational_ext import _EWMA_L
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily = defaultdict(lambda: defaultdict(int))
    epoch = dt.date(1970, 1, 1)
    for r in ev:
        daily[r.event_type][(r.ts.date() - epoch).days] += 1

    rows = all_queries()["events_ewma_anomaly"].spark(spark, sf_dir).collect()
    got = {(r.event_type, r.day): r for r in rows}
    n_rows = 0
    for et, counts in daily.items():
        days = sorted(counts)
        for t, d in enumerate(days):
            if t == 0:
                assert (et, d) not in got  # no history -> no forecast row
                continue
            n_rows += 1
            lags = days[max(0, t - _EWMA_L):t]
            fs = sum(counts[x] * (1 << (_EWMA_L - (t - j) )) for j, x in
                     zip(range(max(0, t - _EWMA_L), t), lags))
            ns = sum(1 << (_EWMA_L - (t - j)) for j in range(max(0, t - _EWMA_L), t))
            r = got[(et, d)]
            assert (r.n, r.fs, r.ns) == (counts[d], fs, ns)
            assert r.forecast == fs / ns
            # flags equal the exact rational comparison vs the truncated
            # forecast, and the truncated forecast is within 2^-(L-1) *
            # max_count of the untruncated sequential EWMA
            assert r.flag_hi == (1 if Fraction(counts[d]) > 2 * Fraction(fs, ns) else 0)
            assert r.flag_lo == (1 if Fraction(counts[d]) < Fraction(fs, ns) / 2 else 0)
            exact = Fraction(0)
            wsum = Fraction(0)
            for j in range(1, t + 1):
                exact += Fraction(1, 2**j) * counts[days[t - j]]
                wsum += Fraction(1, 2**j)
            assert abs(float(exact / wsum) - r.forecast) <= max(counts.values()) * 2 ** -(_EWMA_L - 1)
    assert len(got) == n_rows


def test_ushape_attribution_matches_reference(spark, sf_dir):
    """U-shaped credits equal a per-purchase Python reference, and the
    per-purchase credit sum never exceeds the purchase value (floor
    rounding loss is bounded by the middle-touch count)."""
    from collections import defaultdict
    from decimal import Decimal

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .selectExpr("event_id", "user_id", "event_type", "value", "unix_micros(ts) AS us")
        .collect()
    )
    touches = defaultdict(list)
    for r in ev:
        if r.event_type in ("view", "click"):
            touches[r.user_id].append(r)

    agg = defaultdict(lambda: [set(), 0])
    for r in ev:
        if r.event_type != "purchase":
            continue
        cents = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        micro = cents * 1_000_000
        win = sorted(
            (t for t in touches[r.user_id] if r.us - 3_600_000_000 <= t.us < r.us),
            key=lambda t: (t.us, t.event_id),
        )
        k = len(win)
        per_purchase = 0
        if k == 0:
            agg["direct"][0].add(r.event_id)
            agg["direct"][1] += micro
            continue
        for i, t in enumerate(win):
            if k == 1:
                c = micro
            elif k == 2:
                c = micro // 2
            elif i == 0 or i == k - 1:
                c = micro * 2 // 5
            else:
                c = micro // (5 * (k - 2))
            agg[t.event_type][0].add(r.event_id)
            agg[t.event_type][1] += c
            per_purchase += c
        assert micro - (5 * max(k - 2, 1)) <= per_purchase <= micro

    got = all_queries()["events_attribution_ushape"].spark(spark, sf_dir).collect()
    assert {r.channel: (r.n_purchases, r.attributed_microcents) for r in got} == {
        ch: (len(ids), total) for ch, (ids, total) in agg.items()
    }
    for r in got:
        assert r.attributed_value == r.attributed_microcents / 1_000_000 / 100


def test_weighted_median_matches_reference(spark, sf_dir):
    """The cumulative-crossing weighted median equals the textbook
    definition computed sequentially per group."""
    from collections import defaultdict
    from decimal import Decimal

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    rows = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    mass = defaultdict(lambda: defaultdict(int))
    for r in rows:
        p = Decimal(str(r.l_extendedprice)).quantize(Decimal("0.01"))
        w = int(Decimal(str(r.l_quantity)).quantize(Decimal("0.01")) * 100)
        mass[r.l_returnflag][p] += w

    got = {
        r.l_returnflag: r
        for r in all_queries()["lineitem_weighted_median_price"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(mass)
    for flag, prices in mass.items():
        tw = sum(prices.values())
        cw = 0
        med = None
        for p in sorted(prices):
            cw += prices[p]
            if cw * 2 >= tw:
                med = p
                break
        r = got[flag]
        assert r.total_weight_scaled == tw
        assert r.weighted_median_price == float(med)
        # the weighted median splits the mass: at least half at-or-below
        below = sum(w for p, w in prices.items() if p <= med)
        above = sum(w for p, w in prices.items() if p >= med)
        assert below * 2 >= tw and above * 2 >= tw - 2 * prices[med]


def test_chi2_assoc_matches_reference(spark, sf_dir):
    """Contingency cells, chi-square, and lift equal a plain-Python
    user-grain reference (exact integer products, one double divide)."""
    from collections import defaultdict
    from fractions import Fraction

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    users = defaultdict(set)
    for r in ev:
        users[r.user_id].add(r.event_type)

    got = {r.feature: r for r in all_queries()["events_chi2_assoc"].spark(spark, sf_dir).collect()}
    for t in ("view", "click", "signup", "error"):
        a = b = c = d = 0
        for types in users.values():
            conv = "purchase" in types
            if t in types:
                a += conv
                b += not conv
            else:
                c += conv
                d += not conv
        marg = (a + b) * (c + d) * (a + c) * (b + d)
        if marg == 0 or c == 0:
            assert t not in got
            continue
        r = got[t]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
        n = a + b + c + d
        det = a * d - b * c
        assert r.chi2 == (n * det * det) / marg
        assert r.conv_lift == (a * (c + d)) / (c * (a + b))
        # lift direction must agree with the sign of the determinant
        assert (Fraction(r.conv_lift) > 1) == (det > 0) or det == 0


def test_inflight_by_day_matches_bruteforce(spark, sf_dir):
    """The sweep-line running count equals a brute-force per-day stab
    count over the order spans at several probe days."""
    import datetime as dt
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").collect()
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate").collect()
    close = defaultdict(lambda: None)
    for r in l:
        d = r.l_shipdate.date()
        if close[r.l_orderkey] is None or d > close[r.l_orderkey]:
            close[r.l_orderkey] = d
    epoch = dt.date(1970, 1, 1)
    spans = [
        (
            (r.o_orderdate.date() - epoch).days,
            max((r.o_orderdate.date() - epoch).days, (close[r.o_orderkey] - epoch).days),
        )
        for r in o
        if close[r.o_orderkey] is not None
    ]

    rows = sorted(
        all_queries()["orders_inflight_by_day"].spark(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    got = {r.day: r for r in rows}
    # every event day present, monotone bookkeeping, and brute-force
    # stab counts agree on a spread of probe days
    assert sum(r.n_opened for r in rows) == len(spans)
    assert sum(r.n_closed for r in rows) == len(spans)
    assert rows[-1].open_orders == 0
    for r in rows[:: max(1, len(rows) // 25)]:
        assert r.open_orders == sum(1 for a, b in spans if a <= r.day <= b)


def test_autocorr_matches_reference(spark, sf_dir):
    """ACF at each lag equals the plain-Python lagged-moment estimator
    (same integer numerators, same declared division order)."""
    import datetime as dt
    import math
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.relational_ext import _ACF_LAGS
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily = defaultdict(lambda: defaultdict(int))
    epoch = dt.date(1970, 1, 1)
    for r in ev:
        daily[r.event_type][(r.ts.date() - epoch).days] += 1

    got = {
        (r.event_type, r.lag): r
        for r in all_queries()["events_autocorr_daily"].spark(spark, sf_dir).collect()
    }
    n_expected = 0
    for et, counts in daily.items():
        nd = len(counts)
        s1 = sum(counts.values())
        s2 = sum(v * v for v in counts.values())
        if nd * s2 <= s1 * s1:
            continue
        for lag in _ACF_LAGS:
            pairs = [(counts[d], counts[d + lag]) for d in counts if d + lag in counts]
            if not pairs:
                assert (et, lag) not in got
                continue
            n_expected += 1
            np_ = len(pairs)
            sxy = sum(x * y for x, y in pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            cov = np_ * sxy - sx * sy
            varn = float(nd * s2 - s1 * s1)
            r = got[(et, lag)]
            assert (r.n_pairs, r.cov_num) == (np_, cov)
            assert r.acf == cov / math.sqrt(varn) / math.sqrt(varn) * nd / np_
    assert len(got) == n_expected


def test_scd2_lookup_exactly_one_version_per_fact(spark, sf_dir):
    """Every purchase matches exactly one dimension version, the state
    equals a sequential replay of the user's change history, and the
    join plan broadcasts the dimension side."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
        .collect()
    )
    hist = defaultdict(list)
    for r in ev:
        hist[r.user_id].append(r)
    for h in hist.values():
        h.sort(key=lambda r: (r.us, r.event_id))

    df = all_queries()["events_scd2_lookup"].spark(spark, sf_dir)
    assert "BroadcastHashJoin" in df._jdf.queryExecution().executedPlan().toString() or \
           "BroadcastNestedLoopJoin" in df._jdf.queryExecution().executedPlan().toString()
    rows = df.collect()
    purchases = [r for r in ev if r.event_type == "purchase" and r.user_id < 50]
    assert len(rows) == len(purchases)  # exactly one version per fact
    got = {r.event_id: r for r in rows}
    for p in purchases:
        # sequential replay: state at p.us is the type of the last
        # change row at-or-before it (ties resolved by (us, event_id))
        state = None
        version = 0
        prev = None
        for r in hist[p.user_id]:
            if r.event_type != prev:
                if (r.us, 0) <= (p.us + 1, 0) and r.us <= p.us:
                    state, version = r.event_type, version + 1
                elif r.us > p.us:
                    break
                else:
                    version += 1
                prev = r.event_type
            else:
                prev = r.event_type
        g = got[p.event_id]
        assert (g.state, g.version) == (state, version)
        assert g.us_into_state >= 0


def test_top_paths_match_sequential_sessionizer(spark, sf_dir):
    """Path counts equal a sequential Python sessionizer producing the
    same first-k ordered signatures."""
    from collections import Counter, defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.relational_ext import _PATH_GAP_US, _PATH_K
    from watsondedupe_spark.sources import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .filter("user_id < 60")
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS us", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)

    counts = Counter()
    truncated = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.us, r.event_id))
        sessions = []
        for r in rows:
            if not sessions or r.us - sessions[-1][-1].us > _PATH_GAP_US:
                sessions.append([])
            sessions[-1].append(r)
        for s in sessions:
            path = ">".join(r.event_type for r in s[:_PATH_K])
            counts[path] += 1
            truncated[path] += len(s) > _PATH_K

    got = all_queries()["events_top_paths"].spark(spark, sf_dir).collect()
    assert {r.path: (r.n_sessions, r.n_truncated) for r in got} == {
        p: (n, truncated[p]) for p, n in counts.items()
    }
    assert any(">" in p for p in counts)  # fixture has multi-event sessions
    # (sessions longer than k exist at sf0.01, where the oracle grades
    # n_truncated; the sf0.001 fixture only reaches k-1)


def test_gini_matches_mean_absolute_difference_definition(spark, sf_dir):
    """The rank-formula Gini equals the O(n^2) mean-absolute-difference
    definition G = sum|xi-xj| / (2*n*sum(x)) computed brute-force."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    counts = defaultdict(Counter)
    for r in ev:
        counts[r.event_type][r.user_id] += 1

    got = {r.event_type: r for r in all_queries()["events_gini_concentration"].spark(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for et, c in counts.items():
        xs = sorted(c.values())
        n, tot = len(xs), sum(xs)
        mad = sum(abs(a - b) for a in xs for b in xs)
        expected = Fraction(mad, 2 * n * tot)
        r = got[et]
        assert (r.n_users, r.total) == (n, tot)
        assert Fraction(r.gini_num, n * tot) == expected
        assert r.gini == r.gini_num / (n * tot)


def test_cohort_ltv_matches_reference(spark, sf_dir):
    """Cohort cells and cumulative LTV equal a plain-Python replay with
    exact decimal accumulation."""
    from collections import defaultdict
    from decimal import Decimal

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    first = {}
    for r in o:
        y = r.o_orderdate.year
        first[r.o_custkey] = min(first.get(r.o_custkey, y), y)

    cells = defaultdict(lambda: [0, set(), Decimal(0)])
    for r in o:
        cy = first[r.o_custkey]
        age = r.o_orderdate.year - cy
        e = cells[(cy, age)]
        e[0] += 1
        e[1].add(r.o_custkey)
        e[2] += Decimal(str(r.o_totalprice)).quantize(Decimal("0.01"))
    cohort_users = defaultdict(int)
    for cy in first.values():
        cohort_users[cy] += 1

    got = {(r.cohort_year, r.age_years): r
           for r in all_queries()["orders_cohort_ltv_curve"].spark(spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for cy in {k[0] for k in cells}:
        cum = Decimal(0)
        for age in sorted(a for c, a in cells if c == cy):
            n, users, rev = cells[(cy, age)]
            cum += rev
            r = got[(cy, age)]
            assert (r.cohort_users, r.n_orders, r.n_active) == (
                cohort_users[cy], n, len(users),
            )
            assert r.revenue == float(rev)
            assert r.cum_revenue == float(cum)
            assert r.ltv_per_user == float(cum) / cohort_users[cy]


def test_pchart_matches_reference(spark, sf_dir):
    """Control flags equal the exact rational 3-sigma binomial test
    computed with Fractions (no float shortcut on the reference side)."""
    import datetime as dt
    from collections import defaultdict
    from fractions import Fraction

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily = defaultdict(lambda: [0, 0])
    epoch = dt.date(1970, 1, 1)
    for r in ev:
        d = daily[(r.ts.date() - epoch).days]
        d[0] += 1
        d[1] += r.event_type == "error"
    nn = sum(v[0] for v in daily.values())
    xx = sum(v[1] for v in daily.values())

    got = {r.day: r for r in all_queries()["events_pchart_error_rate"].spark(spark, sf_dir).collect()}
    assert set(got) == set(daily)
    for day, (n, x) in daily.items():
        r = got[day]
        assert (r.n, r.x, r.dev_num) == (n, x, x * nn - xx * n)
        assert r.p_day == x / n and r.p_bar == xx / nn
        # exact rational form of the 3-sigma test; the engine evaluates
        # the same comparison in doubles built from identical integers
        lhs = (Fraction(x, n) - Fraction(xx, nn)) ** 2
        rhs = 9 * Fraction(xx, nn) * (1 - Fraction(xx, nn)) / n
        if lhs != rhs:  # double rounding can only matter AT the boundary
            assert r.out_of_control == (1 if lhs > rhs else 0)
        assert r.direction == (1 if Fraction(x, n) > Fraction(xx, nn) else -1)


def test_burstiness_matches_reference(spark, sf_dir):
    """CV^2 and the bursty flag equal an exact-Fraction reference over
    the same per-type gap sequences."""
    from collections import defaultdict
    from fractions import Fraction

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .selectExpr("event_type", "unix_micros(ts) AS us", "event_id")
        .collect()
    )
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append((r.us, r.event_id))

    got = {r.event_type: r for r in all_queries()["events_interarrival_burstiness"].spark(spark, sf_dir).collect()}
    for et, rows in by_type.items():
        rows.sort()
        gaps = [b[0] - a[0] for a, b in zip(rows, rows[1:])]
        if not gaps:
            assert et not in got
            continue
        n, s1, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        r = got[et]
        assert (r.n_gaps, r.sum_gap_us) == (n, s1)
        assert r.mean_gap_us == s1 / n
        assert r.cv2 == float(n * s2 - s1 * s1) / (float(s1) * float(s1))
        assert r.is_bursty == (1 if Fraction(n * s2, s1 * s1) > 2 else 0)


def test_bot_screen_matches_reference(spark, sf_dir):
    """Per-user heuristics equal a plain-Python replay: gap stream, modal
    gap, fast-gap share, max daily volume, and the flag logic."""
    from collections import Counter, defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.relational_ext import (
        _BOT_FAST_GAP_US, _BOT_SHARE_SCALE,
    )
    from watsondedupe_spark.sources import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id", "unix_micros(ts) AS us", "event_id",
            "cast(cast(ts as date) as string) AS day",
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)

    got = {r.user_id: r for r in all_queries()["events_bot_screen"].spark(spark, sf_dir).collect()}
    n_checked = 0
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.us, r.event_id))
        gaps = [b.us - a.us for a, b in zip(rows, rows[1:])]
        if not gaps:
            assert uid not in got  # single-event users have no gap row
            continue
        n_checked += 1
        modal = max(Counter(gaps).values())
        fast = sum(1 for g in gaps if g < _BOT_FAST_GAP_US)
        max_day = max(Counter(r.day for r in rows).values())
        r = got[uid]
        assert (r.n_events, r.max_day_events, r.n_fast_gaps, r.modal_gap_count) == (
            len(rows), max_day, fast, modal,
        )
        assert r.modal_gap_share_scaled == modal * _BOT_SHARE_SCALE // len(gaps)
        assert r.is_suspect == (
            1 if fast * 5 > len(gaps) or modal * 2 > len(gaps) else 0
        )
    assert n_checked == len(got)


def test_trigram_search_equals_plain_like_and_candidates_are_superset(spark, sf_dir):
    """The trigram candidate+verify pipeline returns exactly the plain
    LIKE result, and the raw candidate set (pre-verify) is a superset —
    the no-false-negatives guarantee trigram containment provides."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.relational_ext import _TRGM_PATTERN
    from watsondedupe_spark.sources import read_table

    parts = read_table(spark, sf_dir, "part").select("p_partkey", "p_name").collect()
    truth = {r.p_partkey for r in parts if _TRGM_PATTERN in r.p_name}

    got = all_queries()["part_trigram_like_search"].spark(spark, sf_dir).collect()
    assert {r.p_partkey for r in got} == truth
    assert truth  # the fixture must contain matches

    grams = [_TRGM_PATTERN[i:i + 3] for i in range(len(_TRGM_PATTERN) - 2)]
    cands = {
        r.p_partkey
        for r in parts
        if all(g in [r.p_name[j:j + 3] for j in range(len(r.p_name) - 2)] for g in grams)
    }
    assert truth <= cands  # necessity: no true match escapes the index


def test_cramers_v_matches_reference(spark, sf_dir):
    """Ticks, chi2, and V equal a plain-Python contingency computation
    with identical operand order; V lies in [0, 1]."""
    import math
    from collections import Counter

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.relational_ext import _CV_TICKS
    from watsondedupe_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).collect()
    cells = Counter((r.l_returnflag, r.l_linestatus) for r in li)
    rows = Counter()
    cols = Counter()
    for (a, b), o in cells.items():
        rows[a] += o
        cols[b] += o
    nn = sum(cells.values())
    ticks = sum(
        int(math.floor(float(o) * o / rows[a] / cols[b] * _CV_TICKS + 0.5))
        for (a, b), o in cells.items()
    )
    ratio = float(ticks) / _CV_TICKS - 1

    [r] = all_queries()["lineitem_cramers_v"].spark(spark, sf_dir).collect()
    assert (r.n_rows, r.n_cols, r.n_items, r.sum_ratio_ticks) == (
        len(rows), len(cols), nn, ticks,
    )
    assert r.chi2 == ratio * nn
    assert r.cramers_v == math.sqrt(max(ratio / (min(len(rows), len(cols)) - 1), 0.0))
    assert 0.0 <= r.cramers_v <= 1.0 + 1e-9


def test_equidepth_histogram_matches_reference(spark, sf_dir):
    """Bucket assignment equals a sorted-reference equi-depth split:
    boundaries are exact order statistics, depths are near-equal, and
    bucket ranges tile the value domain without overlap."""
    from decimal import Decimal

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.relational_ext import _EQD_BUCKETS
    from watsondedupe_spark.sources import read_table

    prices = sorted(
        Decimal(str(r.l_extendedprice)).quantize(Decimal("0.01"))
        for r in read_table(spark, sf_dir, "lineitem").select("l_extendedprice").collect()
    )
    n = len(prices)
    # percentile_disc(q): smallest value at cumulative position >= q
    import math
    bounds = [prices[math.ceil(n * i / _EQD_BUCKETS) - 1] for i in range(1, _EQD_BUCKETS)]
    expected = {}
    for p in prices:
        b = sum(p > x for x in bounds)
        cnt, lo, hi = expected.get(b, (0, p, p))
        expected[b] = (cnt + 1, min(lo, p), max(hi, p))

    got = {r.bucket: r for r in all_queries()["lineitem_equidepth_histogram"].spark(spark, sf_dir).collect()}
    assert {b: (r.n_rows, Decimal(str(r.lo)).quantize(Decimal("0.01")),
                Decimal(str(r.hi)).quantize(Decimal("0.01")))
            for b, r in got.items()} == expected
    # depths near-equal: every bucket within (n/B)/2 .. 2*(n/B) + ties
    target = n / _EQD_BUCKETS
    for r in got.values():
        assert target * 0.5 <= r.n_rows <= target * 2 + 1
    # ranges tile without overlap
    order = sorted(got.values(), key=lambda r: r.bucket)
    for a, b in zip(order, order[1:]):
        assert a.hi <= b.lo
