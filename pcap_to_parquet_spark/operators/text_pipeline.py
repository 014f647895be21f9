"""Training-data text pipeline: decontamination, tf-idf, repetition,
vocabulary — the corpus-statistics operators a pre-training run needs
beyond dedup (operators/llm.py).

Every operator is shuffle-frugal by construction:
- decontamination pairs ONLY on shared shingles (inverted-index
  semi-join; the held-out side is the small side and broadcasts);
- tf-idf is two aggregations plus a broadcast of the per-token
  document frequencies (vocabulary-sized, not corpus-sized);
- repetition score is pure map-side column algebra;
- vocabulary build is one partial+final aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pcap_to_parquet_spark.functions.text import shingles, whitespace_tokens
from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_table, fan_out

# shared SQL fragments (DuckDB): \s+ tokens and pipe-joined 3-gram
# shingles — identical to functions/text.py's column algebra
_TOK_SQL = r"list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"
_SH_SQL = (
    "list_transform(generate_series(1, len(ws) - 2), "
    "i -> ws[i] || '|' || ws[i+1] || '|' || ws[i+2])"
)
# the md5 split gate, byte-identical to operators/llm.py train_test_split
_GATE_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100"


# ---------------------------------------------------------------------------
# benchmark decontamination: train docs sharing any 3-gram with held-out docs

DECONTAMINATE_ORACLE = rf"""
WITH split AS (
    SELECT doc_id, text,
           CASE WHEN {_GATE_SQL} < 80 THEN 'train' ELSE 'heldout' END AS split
    FROM documents
),
tok AS (SELECT doc_id, split, {_TOK_SQL} AS ws FROM split),
sh AS (
    SELECT DISTINCT doc_id, split, unnest({_SH_SQL}) AS sh
    FROM tok WHERE len(ws) >= 3
),
heldout_sh AS (SELECT DISTINCT sh FROM sh WHERE split = 'heldout')
SELECT s.doc_id, COUNT(*) AS n_shared_shingles
FROM sh s
JOIN heldout_sh h ON s.sh = h.sh
WHERE s.split = 'train'
GROUP BY s.doc_id
"""


@query("q_decontaminate", DECONTAMINATE_ORACLE)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: which TRAIN documents share any
    3-gram shingle with the held-out split (the eval-leak check every
    pre-training run does — n-gram overlap is the standard method).

    Shape at 100 TB: shingle both splits (map-only), dedup per doc,
    then join train shingles against the DISTINCT held-out shingle set
    — held-out is the small split (20%, and distinct shingles compress
    further), so it broadcasts; no all-pairs comparison ever exists.
    Returns one row per contaminated train doc with the overlap size
    (the triage metric real pipelines sort by)."""
    d = load_table(spark, sf_dir, "documents")
    gate = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 100
    toks = fan_out(d).select(
        "doc_id",
        F.when(gate < 80, "train").otherwise("heldout").alias("split"),
        whitespace_tokens("text").alias("toks"),
    )
    sh = (
        toks.select("doc_id", "split", F.explode(shingles("toks", 3)).alias("sh"))
        .distinct()
    )
    heldout_sh = sh.filter(F.col("split") == "heldout").select("sh").distinct()
    return (
        sh.filter(F.col("split") == "train")
        .join(F.broadcast(heldout_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


# ---------------------------------------------------------------------------
# tf-idf: top-5 terms per language

TFIDF_ORACLE = rf"""
WITH tok AS (
    SELECT doc_id, lang, unnest({_TOK_SQL}) AS token
    FROM (SELECT doc_id, lang, text FROM documents)
),
tf AS (SELECT lang, token, COUNT(*) AS tf FROM tok GROUP BY lang, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
    SELECT tf.lang, tf.token, tf.tf, df.df,
           tf.tf * LN(n.n / df.df) AS score
    FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
),
ranked AS (
    SELECT lang, token, tf, df, score,
           ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY ROUND(score, 9) DESC, token) AS rn
    FROM scored
)
SELECT lang, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       ROUND(score, 4) AS tfidf, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 5
"""


@query("q_tfidf_top_terms", TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language by tf-idf (tf over the language's
    corpus slice, idf over all documents) — the term-weighting step of
    corpus analysis / quality filtering.

    Scale shape: two aggregations (tf keyed on (lang, token), df keyed
    on token). df output is vocabulary-sized → broadcast into the
    score join; ranking partitions by lang with Spark's
    WindowGroupLimit pushing the top-5 heap below the shuffle.

    Ranking orders on ROUND(score, 9) in BOTH engines: DuckDB's libm
    log and the JVM's Math.log are each only ~1-ulp accurate and not
    bit-identical, so ranking on the raw double can order near-equal
    scores differently at the rn<=5 cutoff; pre-rounding removes the
    libm-parity dependence."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # one scalar to the driver, like any cost stat
    tok = fan_out(d).select(
        "doc_id", "lang", F.explode(whitespace_tokens("text")).alias("token")
    )
    tf = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "token").select(
        "lang",
        "token",
        "tf",
        "df",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy(F.round("score", 9).desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "lang",
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round("score", 4).alias("tfidf"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# within-document repetition score

REPETITION_ORACLE = rf"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS ws FROM documents),
sh AS (SELECT doc_id, {_SH_SQL} AS shs FROM tok WHERE len(ws) >= 3)
SELECT doc_id,
       CAST(len(shs) AS BIGINT) AS n_shingles,
       CAST(len(list_distinct(shs)) AS BIGINT) AS n_distinct,
       ROUND(1.0 - len(list_distinct(shs))::DOUBLE / len(shs), 6) AS rep_ratio
FROM sh
"""


@query("q_repetition_score", REPETITION_ORACLE)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: 1 - distinct/total 3-gram shingles —
    the boilerplate/loop detector in quality filtering (heavily
    repeated documents hurt training). Pure map-side column algebra:
    zero shuffles at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = fan_out(d).select("doc_id", whitespace_tokens("text").alias("toks"))
    sh = toks.filter(F.size("toks") >= 3).select("doc_id", shingles("toks", 3).alias("shs"))
    total = F.size("shs").cast("bigint")
    distinct = F.size(F.array_distinct("shs")).cast("bigint")
    return sh.select(
        "doc_id",
        total.alias("n_shingles"),
        distinct.alias("n_distinct"),
        F.round(F.lit(1.0) - distinct.cast("double") / total, 6).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# tokenizer vocabulary build

VOCAB_ORACLE = rf"""
WITH tok AS (
    SELECT unnest({_TOK_SQL}) AS token
    FROM (SELECT text FROM documents)
),
counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token HAVING COUNT(*) >= 5)
SELECT token, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS vocab_id
FROM counts
"""


@query("q_vocab_build", VOCAB_ORACLE)
def vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary: tokens with count >= 5, id-assigned by
    frequency rank (count desc, token asc — deterministic). The
    aggregation is partial+final (map-side combine carries one row per
    distinct token per partition); the final ranking operates on the
    vocabulary, which is orders of magnitude smaller than the corpus —
    the single-partition window here is over ~1e5-1e6 rows at ANY
    corpus size, which is exactly when a global window is fine."""
    d = load_table(spark, sf_dir, "documents")
    tok = fan_out(d).select(F.explode(whitespace_tokens("text")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= 5)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return counts.select(
        "token", "n", F.row_number().over(w).cast("bigint").alias("vocab_id")
    )
