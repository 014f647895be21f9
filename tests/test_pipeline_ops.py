"""Value-level invariants for the warehouse pipeline operators —
properties the DuckDB oracle equivalence can't articulate (it proves
"same as the SQL", not "the SQL means what we claim")."""

from __future__ import annotations

from collections import defaultdict

import pcap_to_parquet_spark.operators  # noqa: F401
from pcap_to_parquet_spark.registry import QUERIES
from tests.conftest import SF0001


def test_scd2_rows_partition_each_users_timeline(spark):
    """Per user: intervals are well-formed, non-overlapping, contiguous
    (each eff_to equals the next eff_from), exactly one open-ended
    current row, and consecutive states differ (run-length collapsed)."""
    rows = QUERIES["q_scd2_dimension"](spark, SF0001).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user
    open_end = 253_370_764_800_000_000
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.eff_from)
        assert sum(r.is_current for r in rs) == 1, user
        assert rs[-1].is_current == 1 and rs[-1].eff_to == open_end, user
        for a, b in zip(rs, rs[1:]):
            assert a.eff_from < a.eff_to, user
            assert a.eff_to == b.eff_from, user  # contiguous, no overlap
            assert a.state != b.state, user  # collapsed runs


def test_islands_are_maximal_and_disjoint(spark):
    """Per user: islands are disjoint, separated by at least one silent
    day (maximality), and n_days equals the island's width."""
    rows = QUERIES["q_sequence_islands"](spark, SF0001).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.island_start)
        for r in rs:
            assert r.island_end - r.island_start + 1 == r.n_days, user
        for a, b in zip(rs, rs[1:]):
            assert b.island_start > a.island_end + 1, user  # a real gap


def test_balanced_sample_is_exactly_balanced(spark):
    """Every stratum contributes exactly k = min stratum size."""
    rows = QUERIES["q_balanced_sample"](spark, SF0001).collect()
    counts = defaultdict(int)
    for r in rows:
        counts[r.lang] += 1
    assert len(set(counts.values())) == 1  # all equal
    from pyspark.sql import functions as F

    from pcap_to_parquet_spark.sources.tables import load_table

    d = load_table(spark, SF0001, "documents")
    k = d.groupBy("lang").count().agg(F.min("count")).first()[0]
    assert set(counts.values()) == {k}


def test_resample_grid_is_dense(spark):
    """Every (series, day) cell in the span exists exactly once; gap
    days carry explicit zeros."""
    rows = QUERIES["q_resample"](spark, SF0001).collect()
    days = [r.day for r in rows]
    lo, hi = min(days), max(days)
    series = {r.event_type for r in rows}
    assert len(rows) == len(series) * (hi - lo + 1)
    assert len({(r.event_type, r.day) for r in rows}) == len(rows)
    zeros = [r for r in rows if r.n_events == 0]
    for r in zeros:
        assert r.total_value == 0.0


def test_time_rollup_grains_are_consistent(spark):
    """Each grain's event count sums to the same total; coarser grains
    have no more buckets than finer ones."""
    rows = QUERIES["q_time_rollup"](spark, SF0001).collect()
    totals = defaultdict(int)
    buckets = defaultdict(int)
    for r in rows:
        totals[r.grain] += r.n_events
        buckets[r.grain] += 1
    assert set(totals) == {"hour", "day", "month"}
    assert len(set(totals.values())) == 1
    assert buckets["month"] <= buckets["day"] <= buckets["hour"]


def test_mode_is_the_true_argmax(spark):
    """mode_count is the group's max count and mode_value the smallest
    value achieving it (deterministic tie policy)."""
    from pyspark.sql import functions as F

    from pcap_to_parquet_spark.sources.tables import load_table

    got = {
        r.user_id: (r.mode_value, r.mode_count)
        for r in QUERIES["q_mode_per_group"](spark, SF0001).collect()
    }
    e = load_table(spark, SF0001, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    by_user = defaultdict(list)
    for r in counts:
        by_user[r.user_id].append((r.event_type, r.n))
    assert set(got) == set(by_user)
    for user, pairs in by_user.items():
        best_n = max(n for _, n in pairs)
        best_v = min(v for v, n in pairs if n == best_n)
        assert got[user] == (best_v, best_n), user


def test_cogroup_diff_statuses_and_pruning_safety(spark):
    """All four reconciliation verdicts occur at sf0.01, and a
    downstream projection (which triggers column pruning through the
    cogroup) must not break the pandas function's inputs — the shared-
    lineage crash the per-side aliases exist to prevent."""
    from tests.conftest import SF001

    df = QUERIES["q_cogroup_diff"](spark, SF001)
    # pruned path first: only `status` consumed downstream
    counts = {r.status: r["count"] for r in df.groupBy("status").count().collect()}
    assert set(counts) == {"match", "drift", "only_old", "only_new"}, counts
    # full path: a user absent from one side has NULL (not NaN) metrics
    rows = {r.user_id: r for r in df.collect()}
    only_new = [r for r in rows.values() if r.status == "only_new"]
    assert only_new and all(
        r.old_n is None and r.old_sum is None for r in only_new
    )


def test_ngram_lm_score_orders_quality(spark):
    """Higher-probability documents (made of the corpus's most common
    bigrams) must outscore word-salad; every doc with >=2 tokens is
    scored; scores are finite negatives."""
    import math

    rows = QUERIES["q_ngram_lm_score"](spark, SF0001).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.avg_logp < 0 and math.isfinite(r.avg_logp)


def test_permissive_ingest_quarantines_not_drops(spark):
    """Every 13th line really is malformed: the '_corrupt' bucket holds
    exactly the doc_id%13==0 docs (nothing dropped, nothing leaked into
    language buckets), and its char sum is NULL."""
    rows = {r.lang_key: r for r in QUERIES["q_permissive_ingest"](spark, SF0001).collect()}
    from pcap_to_parquet_spark.sources.tables import load_table

    d = load_table(spark, SF0001, "documents")
    n_corrupt = d.filter(d.doc_id % 13 == 0).count()
    assert rows["_corrupt"].n_docs == n_corrupt > 0
    assert rows["_corrupt"].total_chars is None
    assert sum(r.n_docs for r in rows.values()) == d.count()


def test_scd2_lookup_matches_brute_force(spark):
    """Each purchase's looked-up state equals the chronologically last
    view/error/signup event at-or-before it (brute force per user)."""
    from collections import defaultdict

    from pcap_to_parquet_spark.sources.tables import load_table

    got = {r.state: (r.n_purchases, r.total_value) for r in QUERIES["q_scd2_lookup"](spark, SF0001).collect()}
    ev = load_table(spark, SF0001, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect()
    states = defaultdict(list)
    purchases = []
    for r in ev:
        if r.event_type in ("view", "error", "signup"):
            states[r.user_id].append(r)
        elif r.event_type == "purchase":
            purchases.append(r)
    expect = defaultdict(lambda: [0, 0.0])
    for p in purchases:
        # join semantics compare event TIME only (uts >= eff_from): a
        # state change in the same microsecond as the purchase governs
        # it whatever the event_id order
        prior = [s for s in states[p.user_id] if s.ts <= p.ts]
        if not prior:
            continue
        last = max(prior, key=lambda s: (s.ts, s.event_id))
        expect[last.event_type][0] += 1
        expect[last.event_type][1] += p.value
    assert set(got) == set(expect)
    for st, (n, v) in expect.items():
        assert got[st][0] == n, st
        assert abs(got[st][1] - round(v, 4)) < 1e-6, st


def test_observed_load_metrics_match_independent_scan(spark):
    """The one-pass Observation metrics equal separately computed
    values — no sampling, no approximation."""
    from pyspark.sql import functions as F

    from pcap_to_parquet_spark.sources.tables import load_table

    df = QUERIES["q_observed_load"](spark, SF0001)
    df.collect()  # action materializes the observation
    m = df.observation.get
    e = load_table(spark, SF0001, "events")
    want = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_users"),
        F.sum((F.col("value") <= 0).cast("long")).alias("nonpos_values"),
        F.round(F.max("value"), 4).alias("max_value"),
    ).first()
    assert m["n_rows"] == want.n_rows > 0
    assert m["null_users"] == want.null_users
    assert m["nonpos_values"] == want.nonpos_values
    assert m["max_value"] == want.max_value


def test_table_checksum_is_additive(spark):
    """checksum(T) = checksum(T half A) + checksum(T half B): the
    property that lets a mismatch narrow by partition with the same
    formula."""
    from pyspark.sql import functions as F

    from pcap_to_parquet_spark.sources.tables import load_table

    full = {r.tbl: (r.n_rows, r.checksum) for r in QUERIES["q_table_checksum"](spark, SF0001).collect()}
    d = load_table(spark, SF0001, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.coalesce("text", F.lit("")))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    parts = (
        d.groupBy((F.col("doc_id") % 2).alias("half"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(h).alias("ck"))
        .collect()
    )
    assert sum(r.n for r in parts) == full["documents"][0]
    assert sum(r.ck for r in parts) == full["documents"][1]


def _hostile_docs_dir(spark, tmp_path_factory):
    """A documents.parquet with XML/JSON-hostile content."""
    from pcap_to_parquet_spark.schema import TESTDATA_SCHEMAS

    d = tmp_path_factory.mktemp("hostile_docs")
    nasty = [
        (0, 'amp & lt < gt > quote " apos \' done', "en", "s0", 33),
        (1, "newline\nand\ttab and ]]> cdata-breaker", "de", "s1", 38),
        (2, "unicode é中文 \U0001f600 and <tag attr=\"x\">", "fr", "s2", 30),
        (3, "{} [] \\ backslash \\n literal", "en", "s0", 28),
        (13, "corrupt-slot row (doc_id%13==0)", "es", "s3", 31),
    ]
    spark.createDataFrame(nasty, TESTDATA_SCHEMAS["documents"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    # the loaders expect every table present; only documents is read by
    # these two queries, but keyed_tmp_dirs stats the source file only
    return str(d)


def test_xml_ingest_survives_hostile_text(spark, tmp_path_factory):
    """Entity escaping round-trips &, <, >, quotes, newlines, unicode,
    and ]]> byte-for-byte: per-source aggregates equal the original table."""
    sf = _hostile_docs_dir(spark, tmp_path_factory)
    rows = {r.source: r for r in QUERIES["q_xml_ingest"](spark, sf).collect()}
    assert rows["s0"].n_docs == 2 and rows["s0"].total_chars == 61
    assert set(rows) == {"s0", "s1", "s2", "s3"}
    # the text itself survives the round trip (not just the counts)
    import os

    from pcap_to_parquet_spark.sources import keyed_tmp_dirs

    src = os.path.join(os.path.abspath(sf), "documents.parquet")
    (feed,) = keyed_tmp_dirs("xmlfeed", src, "v2-xml-writer", "feed")
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, lang string, source string, n_chars long, text string")
        .load(feed)
    )
    got = {r.doc_id: r.text for r in back.collect()}
    from pcap_to_parquet_spark.sources.tables import load_table

    want = {r.doc_id: r.text for r in load_table(spark, sf, "documents").collect()}
    assert got == want


def test_permissive_ingest_survives_hostile_text(spark, tmp_path_factory):
    """JSON escaping keeps one record per line even with embedded
    newlines/quotes/backslashes; the %13 corruption still quarantines."""
    sf = _hostile_docs_dir(spark, tmp_path_factory)
    rows = {r.lang_key: r for r in QUERIES["q_permissive_ingest"](spark, sf).collect()}
    assert rows["_corrupt"].n_docs == 2  # doc_id 0 and 13
    assert rows["de"].n_docs == 1 and rows["fr"].n_docs == 1
