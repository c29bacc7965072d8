"""Training-data curation operators: the end-to-end passes a 100 TB
pretraining pipeline runs between "raw crawl" and "tokenizer input" —
stratified sampling, shard packing, benchmark decontamination, and the
composed keep/drop pipeline. All oracle-exact: sampling uses a portable
md5-derived hash (never rand()), packing uses deterministic window
arithmetic, decontamination reuses the shingle machinery.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import text as TX
from . import register
from .common import T

# portable per-row hash in [0, 100): first 8 md5 hex chars of the doc id
# rendered as text -> int64 -> mod 100. Identical in Spark and DuckDB;
# a rand()-based sample could never be oracle-checked, and at scale a
# hash sample is also reproducible across reruns/retries (no RNG state).
_HASH_MOD_SPARK = (
    lambda col: F.conv(
        F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("bigint")
    % 100
)
_HASH_MOD_DUCK = "CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8) AS BIGINT) % 100"

# per-language sampling rates (percent kept)
_RATES = {"en": 60, "fr": 40, "de": 40, "es": 40, "zh": 20}
_RATE_CASE_DUCK = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())
    + " ELSE 30 END"
)


@register(
    "sample_stratified",
    sql=f"""
    SELECT doc_id, lang FROM documents
    WHERE {_HASH_MOD_DUCK.format(col='doc_id')} < {_RATE_CASE_DUCK}
    """,
    tags=("llm", "curation", "sampling"),
)
def sample_stratified(spark, sf_dir):
    """Stratified downsampling by language: keep a per-stratum fraction
    chosen by a content-independent hash of the key. Hash sampling (vs
    F.rand) is reproducible across reruns, retries, and engines — the
    property that makes a 100 TB sample auditable. Map-only: no shuffle,
    the predicate evaluates inside the scan stage."""
    d = T(spark, sf_dir, "documents")
    rate = F.lit(30)
    for k, v in _RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return d.filter(_HASH_MOD_SPARK("doc_id") < rate).select("doc_id", "lang")


@register(
    "shard_packing",
    sql=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '{TX.TOKEN_RE}')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((cum - n_tokens) / 20000.0) AS BIGINT) AS shard_id
    FROM c
    """,
    tags=("llm", "curation", "packing"),
)
def shard_packing(spark, sf_dir):
    """Pack documents into fixed token-budget training shards (20k
    tokens) per language: running token total over a deterministic doc
    order, shard = floor(tokens-before / budget). One shuffle on the
    stratum key; within a stratum the window is a single ordered pass —
    the streaming-friendly shape of sequence packing. (Real packers add
    sequence breaking/padding; the shard assignment is this exact
    computation.)"""
    d = T(spark, sf_dir, "documents", parallel=True)
    toks = TX.token_count("text").cast("bigint")
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    t = d.select("doc_id", "lang", toks.alias("n_tokens"))
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 20000.0)
        .cast("bigint")
        .alias("shard_id"),
    )


@register(
    "decontaminate_overlap",
    sql="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct([ws[i] || '_' || ws[i+1] || '_' || ws[i+2]
             || '_' || ws[i+3] || '_' || ws[i+4] || '_' || ws[i+5] || '_' || ws[i+6]
             || '_' || ws[i+7] for i in range(1, len(ws)-6)])) AS s
      FROM w WHERE len(ws) >= 8),
    ev AS (SELECT doc_id, s FROM sh WHERE doc_id < 50),
    tr AS (SELECT doc_id, s FROM sh WHERE doc_id >= 50)
    SELECT tr.doc_id AS train_doc_id, ev.doc_id AS eval_doc_id,
           COUNT(*) AS n_shared_8grams
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id, ev.doc_id
    """,
    tags=("llm", "curation", "decontamination"),
)
def decontaminate_overlap(spark, sf_dir):
    """Benchmark decontamination: 8-gram overlap between the training
    corpus and a held-out eval set (fixture convention: doc_id < 50
    plays the benchmark). The standard n-gram collision check (as used
    for public-benchmark leakage scans): shingle both sides, equi-join
    on the shingle, count collisions per (train, eval) pair. At 100 TB
    the eval side is tiny -> broadcast, so the scan of the training
    corpus is the whole cost, with no shuffle of the big side."""
    d = T(spark, sf_dir, "documents", parallel=True)
    sh = d.filter(TX.word_count("text") >= 8).select(
        "doc_id", F.explode(TX.word_shingles("text", n=8)).alias("s")
    )
    ev = sh.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("eval_doc_id"), "s"
    )
    tr = sh.filter(F.col("doc_id") >= 50).select(
        F.col("doc_id").alias("train_doc_id"), "s"
    )
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_shared_8grams"))
    )


def _curation_duck() -> str:
    from .llm import _JACCARD_CAPPED_DUCK

    return f"""
    WITH jp AS ({_JACCARD_CAPPED_DUCK}),
    quality AS (
      SELECT d.doc_id, d.lang,
        0.3 * LEAST(d.n_chars / 200.0, 1.0)
        + 0.4 * (SELECT CAST(SUM(CASE WHEN w IN {TX.STOPWORDS!r} THEN 1 ELSE 0 END) AS DOUBLE)
                        / COUNT(*)
                 FROM (SELECT unnest(string_split(d.text, ' ')) AS w) t)
        + 0.3 * (CAST(length(regexp_replace(d.text, '[^a-z ]', '', 'g')) AS DOUBLE)
                 / length(d.text)) AS q,
        ROW_NUMBER() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id) AS rn
      FROM documents d)
    SELECT doc_id, lang, q AS quality FROM quality
    WHERE rn = 1 AND q > 0.5
      AND doc_id NOT IN (SELECT db FROM jp)
    """


@register("curation_pipeline", sql=_curation_duck(), tags=("llm", "curation", "pipeline"))
def curation_pipeline(spark, sf_dir):
    """The composed curation pass a pretraining pipeline runs end-to-end:
    quality scoring -> threshold filter -> exact dedup (keep first by
    content hash) -> near-dup survivorship (drop the higher doc_id of
    every Jaccard>=0.8 pair) -> kept documents with their scores.

    One declarative plan: Catalyst sees all four stages at once, so the
    quality filter prunes rows BEFORE the dedup shuffles, and the
    near-dup drop list (tiny) broadcasts into an anti-join. This is the
    operator the single-purpose entries exist to compose."""
    from .llm import dedup_ngram_jaccard

    d = T(spark, sf_dir, "documents", parallel=True)
    wl = (
        d.select("doc_id", F.explode(TX.words("text")).alias("w"))
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("w").isin(*TX.STOPWORDS), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*")
            ).alias("stop_ratio")
        )
    )
    quality = (
        F.lit(0.3) * F.least(F.col("n_chars") / 200.0, F.lit(1.0))
        + F.lit(0.4) * F.col("stop_ratio")
        + F.lit(0.3) * TX.alpha_ratio("text")
    )
    rn = F.row_number().over(
        W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    )
    scored = (
        d.join(wl, "doc_id")
        .withColumn("rn", rn)
        .withColumn("quality", quality)
        .filter((F.col("rn") == 1) & (F.col("quality") > 0.5))
    )
    drops = dedup_ngram_jaccard(spark, sf_dir).select(F.col("db").alias("doc_id"))
    return scored.join(F.broadcast(drops), "doc_id", "left_anti").select(
        "doc_id", "lang", "quality"
    )
