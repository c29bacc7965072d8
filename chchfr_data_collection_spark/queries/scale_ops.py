"""Scale-engineering operators: physical-layout clustering, mergeable
frequency summaries, weighted sampling, corpus mixing, statistical LM
quality scoring, and an iterative graph ranking pass.

These extend the training-data-pipeline surface (SURVEY.md §2.11) with
the layout / sampling / scoring machinery a 100 TB corpus build needs
around the dedup+similarity core. Cross-engine policy is the catalog's
usual one: integer-quantized arithmetic everywhere (``div`` == ``//``
verified bit-equal), no transcendentals, no unseeded randomness —
"random" draws come from md5, and every division either stays integral
or is a single exactly-rounded IEEE divide of identical operands.

Reference parity note: the reference pipeline (dags/*.py) has no
layout/sampling layer at all — its scale ceiling is one Postgres
instance. These operators are the Spark-first replacements its users
would need at corpus scale (cited throughout SURVEY.md §2.11's
extension list).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from .common import T

# ----------------------------------------------------- z-order layout

_ZBITS = 8  # 8 bits per dimension -> 16-bit z-value


def _z_spark(xc, yc):
    parts = []
    for b in range(_ZBITS):
        parts.append(F.shiftleft(F.shiftright(xc, b).bitwiseAND(F.lit(1)), 2 * b + 1))
        parts.append(F.shiftleft(F.shiftright(yc, b).bitwiseAND(F.lit(1)), 2 * b))
    return reduce(lambda a, c: a + c, parts)


_Z_DUCK = " + ".join(
    f"(((x >> {b}) & 1) << {2 * b + 1}) + (((y >> {b}) & 1) << {2 * b})"
    for b in range(_ZBITS)
)

_ZORDER_DUCK = f"""
WITH pts AS (
  SELECT l_orderkey, l_partkey % 256 AS x, l_suppkey % 256 AS y
  FROM lineitem),
z AS (SELECT l_orderkey, x, y, {_Z_DUCK} AS zval FROM pts),
files AS (
  SELECT 'zorder' AS layout, zval >> 10 AS file_id, x, y FROM z
  UNION ALL
  SELECT 'rowhash' AS layout, l_orderkey % 64 AS file_id, x, y FROM z),
stats AS (
  SELECT layout, file_id,
         MAX(x) - MIN(x) AS span_x, MAX(y) - MIN(y) AS span_y
  FROM files GROUP BY layout, file_id)
SELECT layout, COUNT(*) AS n_files,
       CAST(SUM(span_x) AS DOUBLE) / COUNT(*) AS avg_span_x,
       CAST(SUM(span_y) AS DOUBLE) / COUNT(*) AS avg_span_y
FROM stats GROUP BY layout
"""


@register(
    "layout_zorder_clustering",
    sql=_ZORDER_DUCK,
    tags=("layout", "scale", "audit"),
)
def layout_zorder_clustering(spark, sf_dir):
    """Multi-dimensional clustering audit: interleave the low 8 bits of
    (l_partkey, l_suppkey) into a 16-bit Morton z-value, assign rows to
    64 "files" by z-range (``z >> 10``), and measure the per-file
    min/max span of BOTH dimensions against an unclustered
    (orderkey-hash) layout. Narrow spans are the whole point of
    z-ordering: file-level min/max statistics then prune scans on
    EITHER dimension (Delta/Iceberg OPTIMIZE ZORDER does exactly this;
    the z >> 10 assignment here is the static equivalent of
    repartitionByRange(zval) + sortWithinPartitions at write time).

    Measured at sf0.1: z-order files span ~31/31 of the 256-value x/y
    ranges (top 3 bits of each dimension pinned per file) vs ~255/255
    for the hash layout — an 8× pruning factor per dimension, 64× for
    conjunctive 2-D predicates.

    100 TB plan: the z-value is one map-side integer expression; the
    audit is a groupBy on (layout, file_id) with map-side partial
    min/max — one small shuffle. The write path it models scales the
    same way: range-partition by z, sort within partitions, no global
    sort."""
    li = T(spark, sf_dir, "lineitem")
    x = (F.col("l_partkey") % 256).alias("x")
    y = (F.col("l_suppkey") % 256).alias("y")
    z = _z_spark(F.col("x"), F.col("y"))
    pts = li.select("l_orderkey", x, y).select(
        "l_orderkey", "x", "y", z.alias("zval")
    )
    files = pts.select(
        "x",
        "y",
        F.inline(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(F.col("zval"), 10).cast("bigint").alias("file_id"),
                ),
                F.struct(
                    F.lit("rowhash").alias("layout"),
                    (F.col("l_orderkey") % 64).cast("bigint").alias("file_id"),
                ),
            )
        ),
    )
    stats = files.groupBy("layout", "file_id").agg(
        (F.max("x") - F.min("x")).alias("span_x"),
        (F.max("y") - F.min("y")).alias("span_y"),
    )
    return stats.groupBy("layout").agg(
        F.count("*").alias("n_files"),
        (F.sum("span_x").cast("double") / F.count("*")).alias("avg_span_x"),
        (F.sum("span_y").cast("double") / F.count("*")).alias("avg_span_y"),
    )


# ------------------------------------------- PPS weighted sampling

_PPS_K = 100  # expected sample size


@register(
    "sample_weighted_pps",
    sql=f"""
    WITH tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS w_total FROM documents),
    u AS (
      SELECT doc_id, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS u32
      FROM documents)
    SELECT doc_id, n_chars,
           LEAST(1000000::BIGINT, ({_PPS_K} * n_chars * 1000000) // w_total)
             AS incl_prob_ppm
    FROM u, tot
    WHERE u32 * w_total < {_PPS_K}::BIGINT * n_chars * 4294967296
    """,
    tags=("llm", "curation", "sampling"),
)
def sample_weighted_pps(spark, sf_dir):
    """Probability-proportional-to-size (token-weighted) sampling:
    include a document with probability min(1, k·w/W) where w is its
    n_chars weight and W the corpus total — the standard way to draw a
    fixed TOKEN budget (not a fixed document count) from a corpus, so
    long documents aren't under-represented per token.

    The draw is a deterministic md5 uniform (u32 over doc_id) compared
    in PURE INTEGER arithmetic: include iff u32·W < k·w·2^32 — no
    float probabilities anywhere, so the sample is reproducible across
    engines, retries, and partitionings (same property as
    sample_stratified's hash draw). Emitted incl_prob_ppm is the
    integer-floored inclusion probability for downstream
    Horvitz-Thompson reweighting.

    100 TB plan: W is a 1-row aggregate broadcast to the scan; the
    filter is map-side — one pass, no shuffle of the corpus. Overflow
    headroom: u32·W < 2^32·Σn_chars needs W ≤ 2^31 (≈2.1e9 chars) in
    int64; beyond that quantize W (or go decimal(38,0)) — noted rather
    than hit at fixture scales."""
    d = T(spark, sf_dir, "documents")
    tot = d.agg(F.sum("n_chars").cast("bigint").alias("w_total"))
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (
        d.select("doc_id", "n_chars", u32.alias("u32"))
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("u32") * F.col("w_total")
            < F.lit(_PPS_K).cast("bigint") * F.col("n_chars") * F.lit(4294967296)
        )
        .select(
            "doc_id",
            "n_chars",
            F.least(
                F.lit(1000000).cast("bigint"),
                F.expr(f"({_PPS_K} * n_chars * 1000000) div w_total"),
            ).alias("incl_prob_ppm"),
        )
    )


# ------------------------------------------- corpus mixture rebalance

# Target language mixture (ppm, sums to 1e6) — the Pile/Dolma-style
# source-mixing spec a training run pins before sampling.
_MIX_TARGET_PPM = {"en": 400000, "zh": 150000, "de": 150000, "es": 150000, "fr": 150000}

_MIX_CASE_DUCK = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIX_TARGET_PPM.items()))
    + " ELSE 0 END"
)


@register(
    "mixture_rebalance_weights",
    sql=f"""
    WITH tot AS (SELECT COUNT(*) AS n_total FROM documents),
    g AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
    SELECT lang, n_docs,
           (n_docs * 1000000) // n_total AS observed_ppm,
           CAST({_MIX_CASE_DUCK} AS BIGINT) AS target_ppm,
           (CAST({_MIX_CASE_DUCK} AS BIGINT) * n_total) // n_docs
             AS repeat_factor_ppm
    FROM g, tot
    """,
    tags=("llm", "curation", "sampling"),
)
def mixture_rebalance_weights(spark, sf_dir):
    """Corpus mixture rebalancing: given a target language mixture (the
    ppm table a training run specifies up front), derive each group's
    observed share and the repeat/sampling factor (ppm) that moves the
    corpus to the target — factor >1e6 means upsample (repeat epochs),
    <1e6 means subsample. This is the source-mixing step every
    published corpus recipe runs between curation and tokenization;
    the factors feed sample_weighted_pps / sample_stratified as
    per-group rates.

    All integer: shares and factors are floored ppm, so the plan is one
    groupBy(lang) plus a broadcast 1-row total — no float shares to
    drift across engines. At 100 TB the group count is the number of
    (lang) buckets, so the reduce side is trivially small; the single
    corpus scan is the whole cost."""
    d = T(spark, sf_dir, "documents")
    tot = d.agg(F.count("*").alias("n_total"))
    target = F.coalesce(
        reduce(
            lambda acc, kv: acc.when(F.col("lang") == kv[0], F.lit(kv[1])),
            sorted(_MIX_TARGET_PPM.items()),
            F.when(F.lit(False), F.lit(0)),
        ),
        F.lit(0),
    ).cast("bigint")
    return (
        d.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            F.expr("(n_docs * 1000000) div n_total").alias("observed_ppm"),
            target.alias("target_ppm"),
            F.expr(
                f"(CAST({_MIX_CASE_DUCK} AS BIGINT) * n_total) div n_docs"
            ).alias("repeat_factor_ppm"),
        )
    )


# --------------------------------------------- bigram LM quality score

_BIGRAM_DUCK = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_slice(ws, 1, len(ws) - 1)) AS w1,
         unnest(list_slice(ws, 2, len(ws))) AS w2
  FROM w WHERE len(ws) >= 2),
bgc AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
pre AS (SELECT w1, COUNT(*) AS p FROM bg GROUP BY w1),
prob AS (
  SELECT b.w1, b.w2,
         (2000000000::BIGINT * c + p) // (2 * p) AS prob_ppb
  FROM bgc b JOIN pre USING (w1))
SELECT bg.doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(prob_ppb) AS DOUBLE) / COUNT(*) AS lm_score_ppb
FROM bg JOIN prob ON bg.w1 = prob.w1 AND bg.w2 = prob.w2
GROUP BY bg.doc_id
"""


@register(
    "text_bigram_lm_score",
    sql=_BIGRAM_DUCK,
    tags=("llm", "text", "quality"),
)
def text_bigram_lm_score(spark, sf_dir):
    """Statistical-LM quality scoring (the CCNet/KenLM filter shape):
    train a bigram model on the corpus itself (MLE transition
    frequencies), then score every document by its mean transition
    probability — templated/natural text scores high, shuffled-word
    junk scores near the unigram floor. Production swaps the in-corpus
    model for a clean-reference LM; the join topology is identical.

    Probabilities are integer-quantized to ppb with an EXACT
    round-half-up — (2e9·c + p) div (2p) — so model and scores are
    bit-identical across engines (no log/exp; the final per-doc mean is
    one exactly-rounded IEEE division of identical integers).

    100 TB plan: two groupBys build the model at (w1,w2) / (w1) grain
    (map-side partials collapse to vocab-sized relations), then the
    corpus bigram stream joins the model on its key. The model side is
    vocab²-bounded, not corpus-bounded — broadcast when it fits, else
    an equi-join shuffle that AQE sizes; the per-doc reduce is the only
    corpus-sized shuffle."""
    d = T(spark, sf_dir, "documents", parallel=True)
    ws = F.split("text", " ", -1)
    bg = (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i).alias("w1"),
                        F.element_at("ws", i + 1).alias("w2"),
                    ),
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    pre = bg.groupBy("w1").agg(F.count("*").alias("p"))
    prob = bgc.join(pre, "w1").select(
        "w1", "w2", F.expr("(2000000000 * c + p) div (2 * p)").alias("prob_ppb")
    )
    return (
        bg.join(prob, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("prob_ppb").alias("sp"))
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("sp").cast("double") / F.col("n_bigrams")).alias("lm_score_ppb"),
        )
    )


# --------------------------------------------- heavy hitters (MG pass)

_HH_K = 64  # summary capacity -> guaranteed-complete above N/(K+1)


def _hh_candidates(batches):
    """Per-batch frequent-items summary with the Misra-Gries guarantee:
    emit every word whose in-batch count c satisfies c·(K+1) > n_batch.
    At most K words qualify per batch, and any word with GLOBAL count
    > N/(K+1) must qualify in at least one batch (else summing the
    per-batch bound gives total ≤ N/(K+1)) — so the union of per-batch
    summaries is a complete candidate set for the exact second pass,
    independent of partitioning. Vectorized value_counts, no per-row
    Python."""
    import pandas as pd

    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        vc = pdf["w"].value_counts()
        cand = vc[vc * (_HH_K + 1) > n]
        yield pd.DataFrame({"w": cand.index.astype(str)})


@register(
    "sketch_heavy_hitters",
    sql=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    tot AS (SELECT COUNT(*) AS n_total FROM words)
    SELECT w, COUNT(*) AS exact_n,
           (COUNT(*) * 1000000) // ANY_VALUE(n_total) AS share_ppm
    FROM words, tot
    GROUP BY w
    HAVING COUNT(*) * {_HH_K + 1} > ANY_VALUE(n_total)
    """,
    tags=("llm", "text", "sketch", "audit"),
)
def sketch_heavy_hitters(spark, sf_dir):
    """Exact heavy hitters (words with frequency > N/(K+1), K={_HH_K})
    via the classic two-pass summary scheme: a Misra-Gries-guarantee
    candidate pass (bounded K-sized summary per Arrow batch, union is
    provably complete) followed by an exact count of candidates only —
    the standard way to get EXACT heavy hitters from one summary pass
    plus one semi-join pass, when a plain word-count groupBy would
    shuffle the whole vocabulary.

    100 TB plan: pass 1 is map-only (each task emits ≤K candidate
    words per batch); the distinct candidate set is tiny and
    BROADCASTS into pass 2, so the only shuffle is the groupBy over
    the candidate-filtered stream — vocabulary-of-candidates sized,
    not vocabulary sized. Complements sketch_countmin_words (approx
    point estimates) with a guaranteed-complete threshold query."""
    d = T(spark, sf_dir, "documents", parallel=True)
    words = d.select(F.explode(F.split("text", " ", -1)).alias("w"))
    cand = words.mapInPandas(_hh_candidates, "w string").distinct()
    tot = words.agg(F.count("*").alias("n_total"))
    return (
        words.join(F.broadcast(cand), "w")
        .groupBy("w")
        .agg(F.count("*").alias("exact_n"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("exact_n") * (_HH_K + 1) > F.col("n_total"))
        .select(
            "w",
            "exact_n",
            F.expr("(exact_n * 1000000) div n_total").alias("share_ppm"),
        )
    )


# --------------------------------------------------- PageRank (quantized)

_PR_ITERS = 3
_PR_SCALE = 10**9  # ranks carried as integer billionths


def _pr_iter_duck(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
    c{i} AS (
      SELECT e.dst, SUM(({prev}.rank_q * e.w) // o.out_w) AS sc
      FROM {prev} JOIN edges e ON e.src = {prev}.node
      JOIN outw o ON o.src = e.src
      GROUP BY e.dst),
    r{i} AS (
      SELECT n.node,
             (150000000::BIGINT // nn.n_nodes)
               + (85 * COALESCE(c{i}.sc, 0)) // 100 AS rank_q
      FROM nodes n CROSS JOIN nn LEFT JOIN c{i} ON c{i}.dst = n.node)"""


_PAGERANK_DUCK = (
    """
WITH edges AS (
  SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  GROUP BY cn.n_name, sn.n_name),
outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
nodes AS (SELECT n_name AS node FROM nation),
nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
r0 AS (
  SELECT node, CAST(1000000000::BIGINT // nn.n_nodes AS BIGINT) AS rank_q
  FROM nodes CROSS JOIN nn),"""
    + ",".join(_pr_iter_duck(i) for i in range(1, _PR_ITERS + 1))
    + f"""
SELECT node, CAST(rank_q AS BIGINT) AS rank_q FROM r{_PR_ITERS}
"""
)


@register(
    "graph_pagerank_trade",
    sql=_PAGERANK_DUCK,
    tags=("graph", "iterative", "scale"),
)
def graph_pagerank_trade(spark, sf_dir, checkpoint_dir: str | None = None):
    """PageRank over the nation-level trade graph (customer-nation →
    supplier-nation edges weighted by lineitem count), 3 power
    iterations at damping 0.85 — the canonical iterative-join workload
    (link analysis / influence ranking) expressed as pure DataFrame
    ops: contribution = rank·w div out_w per edge, damped sum per
    destination, repeat.

    Ranks are integer billionths with FLOORED division at every step,
    so all three iterations are bit-exact across engines and
    partitionings (float PageRank is famously order-dependent in the
    sum — quantization is how you make it reproducible; dangling mass
    is dropped, the usual simplification).

    100 TB plan: the edge build is the q7-shaped join (dims broadcast,
    one fact shuffle) followed by a groupBy to the nation² grain —
    after which each iteration joins RANK (N rows) × EDGES (≤N² rows),
    both tiny and auto-broadcast; iterations never re-touch the fact
    table. The same loop at a billion-node grain is edges-partitioned
    with rank co-partitioned on src — shape unchanged, plus a
    materialization per iteration to cut lineage (the
    dedup_connected_components pattern). Pass `checkpoint_dir` to make
    the materializations executor-loss-proof: edges and each
    iteration's ranks round-trip through parquet there instead of
    localCheckpoint blocks, which die with their executor and would
    kill a long 100 TB job mid-iteration (round-9 verdict item 5;
    SCALE.md documents when to flip it). Oracle rows are identical
    either way — materialization changes fault tolerance, never
    values."""
    from ..operators.graph import materialize
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    # materialize the <=N^2-row edge relation ONCE: without this the
    # whole fact join is re-planned under every iteration (verified
    # in the physical plan), and post-materialization size stats let
    # every per-iteration join auto-broadcast
    edges = materialize(edges, checkpoint_dir, "pr-edges")
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    nodes = n.select(F.col("n_name").alias("node"))
    nn = nodes.agg(F.count("*").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr("1000000000 div n_nodes").alias("rank_q")
    )
    for i in range(_PR_ITERS):
        contrib = (
            F.broadcast(ranks)
            .join(edges, ranks.node == edges.src)
            .join(F.broadcast(outw), "src")
            .select("dst", F.expr("(rank_q * w) div out_w").alias("ci"))
            .groupBy("dst")
            .agg(F.sum("ci").alias("sc"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(F.broadcast(contrib), nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.expr("150000000 div n_nodes")
                    + F.expr("(85 * coalesce(sc, 0L)) div 100")
                ).alias("rank_q"),
            )
        )
        if checkpoint_dir is not None:
            # reliable per-iteration state: a billion-node rank relation
            # replays from parquet after executor loss instead of
            # re-deriving every prior iteration (and the fact join)
            ranks = materialize(ranks, checkpoint_dir, f"pr-ranks-{i % 2}")
    return ranks


# ------------------------------------- streaming anomaly maintenance


@register(
    "streaming_anomaly_replay",
    sql="""
    WITH q AS (
      SELECT event_type, CAST(round(value * 100) AS HUGEINT) AS v
      FROM events),
    stats AS (
      SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(v) AS s, SUM(v * v) AS q2
      FROM q GROUP BY event_type)
    SELECT q.event_type, CAST(MAX(t.n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN (t.n * q.v - t.s) * (t.n * q.v - t.s)
                              > 9 * (t.n * t.q2 - t.s * t.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM q JOIN stats t ON t.event_type = q.event_type
    GROUP BY q.event_type
    """,
    tags=("streaming", "events", "anomaly", "stats"),
)
def streaming_anomaly_replay(spark, sf_dir):
    """Streaming anomaly-gate maintenance, replayed end-to-end: the
    event feed streams through foreachBatch, each micro-batch reduces
    to exact integer moment partials (n, Σv, Σv²) per event type which
    APPEND to a stats store; the final 3σ report is the merged stats
    joined back against the feed — per-type population size and outlier
    count, the per-crawl monitoring row a 100 TB ingest keeps live.

    Integer partials make the merge exact and batch-boundary-
    independent (the same |x−μ|>3σ ⇔ (n·v−S)² > 9(nQ−S²) algebra as
    events_anomaly_3sigma), so the replay equals the batch twin
    bit-for-bit — pinned by the oracle and the equivalence test.

    100 TB plan: the streaming side is a per-batch map-side groupBy to
    #types-sized partials (constant-size appends, like the incremental
    rollup); the report join broadcasts the merged per-type constants
    into the scan. Nothing in the loop grows with history except the
    O(#batches × #types) partials file, compacted by re-aggregation."""
    import tempfile
    import uuid

    from ..streaming.events import (
        foreach_batch_moment_partials,
        read_events_stream,
    )

    base = tempfile.mkdtemp(prefix=f"anomaly_{uuid.uuid4().hex[:8]}_")
    target, ck = f"{base}/partials", f"{base}/ck"
    q = foreach_batch_moment_partials(
        read_events_stream(spark, sf_dir), target, ck
    )
    q.awaitTermination()
    big = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = (
        spark.read.parquet(target)
        .groupBy("event_type")
        .agg(
            big(F.sum("n")).alias("n"),
            big(F.sum("s")).alias("s"),
            big(F.sum("q2")).alias("q2"),
        )
    )
    ev = T(spark, sf_dir, "events")
    qd = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v")
    )
    lhs_root = big(F.col("n") * F.col("v")) - F.col("s")
    rhs = F.lit(9).cast("decimal(38,0)") * (
        big(F.col("n") * F.col("q2")) - big(F.col("s") * F.col("s"))
    )
    return (
        qd.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.sum((lhs_root * lhs_root > rhs).cast("int"))
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )


# --------------------------------------- image near-dup (average hash)

# Deterministic 8x8 grayscale test images: docs in the same group of 4
# share a base image; members 1/2 carry small sparse perturbations
# (near-duplicates), member 3 is an unrelated image. Everything integer,
# so the DuckDB oracle reproduces hashes arithmetically with no codec.
_AHASH_V_DUCK = """
      CASE WHEN doc_id % 4 = 3
           THEN xor((doc_id * 2654435761) % 2147483648, k * 83492791) % 251
           ELSE xor(((doc_id // 4) * 73856093) % 2147483648,
                    k * 19349663) % 241
                + CASE WHEN doc_id % 4 = 1 AND k % 7 = 0 THEN 5 ELSE 0 END
                + CASE WHEN doc_id % 4 = 2 AND k % 11 = 0 THEN 7 ELSE 0 END
      END"""

_AHASH_HASH_DUCK = f"""
px AS (
  SELECT doc_id, k, {_AHASH_V_DUCK} AS v
  FROM documents CROSS JOIN LATERAL unnest(range(0, 64)) AS t(k)),
sums AS (SELECT doc_id, SUM(v) AS s FROM px GROUP BY doc_id),
hashes AS (
  SELECT px.doc_id,
         CAST(SUM(CASE WHEN k < 32 AND 64 * v > s THEN 1::BIGINT << k
                       ELSE 0 END) AS BIGINT) AS h_hi,
         CAST(SUM(CASE WHEN k >= 32 AND 64 * v > s THEN 1::BIGINT << (k - 32)
                       ELSE 0 END) AS BIGINT) AS h_lo
  FROM px JOIN sums ON sums.doc_id = px.doc_id
  GROUP BY px.doc_id)"""


def _ahash_pixels(d: int) -> bytes:
    g, m = d // 4, d % 4
    if m == 3:
        dd = (d * 2654435761) % 2147483648
        return bytes((dd ^ (k * 83492791)) % 251 for k in range(64))
    gg = (g * 73856093) % 2147483648
    return bytes(
        ((gg ^ (k * 19349663)) % 241)
        + (5 if m == 1 and k % 7 == 0 else 0)
        + (7 if m == 2 and k % 11 == 0 else 0)
        for k in range(64)
    )


def _ahash_native(df):
    """Average-hash columns from pure native expressions (no Python in
    the hot path), in the explode+aggregate shape: 64 narrow rows per
    image, the mean threshold via a per-doc window sum, bit packing via
    conditional shiftleft sums. A first cut built the hash as one
    64-wide nested-CASE array expression — bit-identical but a
    whole-stage-codegen bomb (~3.4 s to hash 5000 images, recompiled
    per join side); this shape hashes the same input in ~0.3 s and is
    the same one-shuffle plan embedding_centroids uses. The groupBy
    reuses the window's doc_id partitioning, so banding cost dominates
    again."""
    from pyspark.sql.window import Window as SW

    px = df.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("k")
    ).select(
        "doc_id",
        "k",
        F.expr(
            """CAST(CASE WHEN doc_id % 4 = 3
              THEN (((doc_id * 2654435761) % 2147483648)
                    ^ (CAST(k AS BIGINT) * 83492791)) % 251
              ELSE ((((doc_id div 4) * 73856093) % 2147483648)
                    ^ (CAST(k AS BIGINT) * 19349663)) % 241
                   + CASE WHEN doc_id % 4 = 1 AND k % 7 = 0 THEN 5 ELSE 0 END
                   + CASE WHEN doc_id % 4 = 2 AND k % 11 = 0 THEN 7 ELSE 0 END
              END AS BIGINT)"""
        ).alias("v"),
    )
    s = F.sum("v").over(SW.partitionBy("doc_id"))
    withs = px.withColumn("s", s)
    return withs.groupBy("doc_id").agg(
        F.sum(
            F.expr(
                "CASE WHEN k < 32 AND 64 * v > s"
                " THEN shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)) ELSE 0L END"
            )
        ).alias("h_hi"),
        F.sum(
            F.expr(
                "CASE WHEN k >= 32 AND 64 * v > s"
                " THEN shiftleft(CAST(1 AS BIGINT), CAST(k - 32 AS INT)) ELSE 0L END"
            )
        ).alias("h_lo"),
    )


@register(
    "multimodal_image_ahash",
    sql=f"""
    WITH {_AHASH_HASH_DUCK}
    SELECT doc_id, h_hi, h_lo FROM hashes
    """,
    tags=("multimodal", "dedup", "pandas-udf", "decode"),
)
def multimodal_image_ahash(spark, sf_dir):
    """Perceptual image fingerprinting through the REAL codec path:
    per document an 8x8 grayscale image is encoded to BMP, decoded back
    by the pure-stdlib decoder inside an Arrow mapInPandas kernel, and
    reduced to a 64-bit average-hash (bit k set iff pixel k is above
    the image mean — computed as 64·v > Σv, all integer, so the DuckDB
    oracle reproduces the hash arithmetically with no codec and the
    native-expression twin in dedup_image_ahash_pairs is bit-identical,
    pinned by test).

    aHash is the standard first-pass image near-dup fingerprint
    (pHash's DCT refinement slots into the same kernel); at 100 TB the
    decode+hash stage is map-only over Arrow batches — the banded join
    over the emitted halves is dedup_image_ahash_pairs' job."""
    from collections.abc import Iterator

    import pandas as pd

    from ..multimodal import decode_image, encode_bmp24

    docs = T(spark, sf_dir, "documents", parallel=True).select("doc_id")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                gray = _ahash_pixels(d)
                rgb = bytes(b for v in gray for b in (v, v, v))
                _, _, nch, pix = decode_image(encode_bmp24(8, 8, rgb))
                vals = pix[::nch]  # channel 0 of the decoded image
                s = sum(vals)
                h_hi = h_lo = 0
                for k, v in enumerate(vals):
                    if 64 * v > s:
                        if k < 32:
                            h_hi |= 1 << k
                        else:
                            h_lo |= 1 << (k - 32)
                rows.append((d, h_hi, h_lo))
            yield pd.DataFrame(rows, columns=["doc_id", "h_hi", "h_lo"]).astype(
                "int64"
            )

    return docs.mapInPandas(kernel, schema="doc_id bigint, h_hi bigint, h_lo bigint")


_AHASH_HAMMING_MAX = 6


@register(
    "dedup_image_ahash_pairs",
    sql=f"""
    WITH {_AHASH_HASH_DUCK},
    bands AS (
      SELECT doc_id, b AS band_id,
             CASE b WHEN 0 THEN h_hi & 65535 WHEN 1 THEN h_hi >> 16
                    WHEN 2 THEN h_lo & 65535 ELSE h_lo >> 16 END AS band_val,
             h_hi, h_lo
      FROM hashes CROSS JOIN LATERAL unnest(range(0, 4)) AS t(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
             a.h_hi AS ah, a.h_lo AS al, b.h_hi AS bh, b.h_lo AS bl
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id)
    SELECT da, db,
           bit_count(xor(ah, bh)) + bit_count(xor(al, bl)) AS hamming
    FROM cand
    WHERE bit_count(xor(ah, bh)) + bit_count(xor(al, bl))
          <= {_AHASH_HAMMING_MAX}
    """,
    tags=("multimodal", "dedup", "lsh"),
)
def dedup_image_ahash_pairs(spark, sf_dir):
    """Image near-duplicate pairs by banded aHash LSH: the 64-bit
    average hash splits into 4 16-bit bands; documents sharing ANY band
    become candidates (equi-join per band — identical topology to
    dedup_minhash_banded's AND-OR scheme), then exact Hamming distance
    over the full hash keeps pairs within {_AHASH_HAMMING_MAX} bits.
    Hashes here come from the native-expression twin of
    multimodal_image_ahash's kernel (bit-identical, pinned by test) so
    the hot path has no Python.

    100 TB plan: hashing is map-only; the only shuffle is the band
    equi-join at 4 rows/image, and candidates are bounded by band
    collisions, never all-pairs (no cartesian — the sign-LSH/minhash
    scale argument verbatim). Hamming is two xor+bit_counts in
    whole-stage codegen."""
    d = T(spark, sf_dir, "documents", parallel=True).select("doc_id")
    hashes = _ahash_native(d)
    bands = hashes.select(
        "doc_id",
        "h_hi",
        "h_lo",
        F.posexplode(
            F.array(
                F.col("h_hi").bitwiseAND(F.lit(65535)),
                F.shiftright("h_hi", 16),
                F.col("h_lo").bitwiseAND(F.lit(65535)),
                F.shiftright("h_lo", 16),
            )
        ).alias("band_id", "band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("da"), F.col("h_hi").alias("ah"),
        F.col("h_lo").alias("al"), "band_id", "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("db"), F.col("h_hi").alias("bh"),
        F.col("h_lo").alias("bl"), "band_id", "band_val",
    )
    cand = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", "ah", "al", "bh", "bl")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("ah").bitwiseXOR(F.col("bh"))
    ) + F.bit_count(F.col("al").bitwiseXOR(F.col("bl")))
    return (
        cand.select("da", "db", hamming.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= _AHASH_HAMMING_MAX)
    )


# ------------------------------------- boilerplate segment removal

_BP_SEG_W = 10  # words per segment
_BP_DF = 2  # C4 convention: any segment occurring in >1 document


@register(
    "text_boilerplate_removal",
    sql=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    segs AS (
      SELECT doc_id, generate_subscripts(ss, 1) - 1 AS seg_idx, unnest(ss) AS seg
      FROM (SELECT doc_id,
              [array_to_string(ws[{_BP_SEG_W}*i+1 : {_BP_SEG_W}*i+{_BP_SEG_W}], ' ')
               for i in range(0, CAST(ceil(len(ws) / {_BP_SEG_W}.0) AS BIGINT))] AS ss
            FROM w)),
    bo AS (
      SELECT seg FROM segs GROUP BY seg
      HAVING COUNT(DISTINCT doc_id) >= {_BP_DF})
    SELECT s.doc_id, COUNT(*) AS n_segs,
           CAST(SUM(CASE WHEN bo.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           md5(COALESCE(string_agg(s.seg, ' ' ORDER BY s.seg_idx)
                          FILTER (WHERE bo.seg IS NULL), '')) AS cleaned_md5
    FROM segs s LEFT JOIN bo ON bo.seg = s.seg
    GROUP BY s.doc_id
    """,
    tags=("llm", "text", "dedup", "curation"),
)
def text_boilerplate_removal(spark, sf_dir):
    """C4-style cross-document boilerplate removal that EMITS the
    cleaned corpus: split every document into aligned {_BP_SEG_W}-word
    segments, drop any segment occurring in {_BP_DF}+ distinct
    documents (navigation chrome / legal footers / templated headers in
    a web corpus), and rebuild the document from the surviving segments
    in order — the output row carries the removal counts and the md5 of
    the cleaned text, so the oracle pins the exact reconstruction, not
    just the flag set. Complements dedup_duplicate_spans (which REPORTS
    shared spans) by actually producing the retained text.

    100 TB plan: segmentation is map-side; the df count is one shuffle
    at segment grain with map-side partials; the boilerplate set joins
    back WITHOUT a forced broadcast (it scales with corpus size — AQE
    picks broadcast while it fits, the same reasoning as
    curation_pipeline's drop list); the rebuild is a per-doc groupBy
    using sorted-struct collect, never a global sort."""
    d = T(spark, sf_dir, "documents", parallel=True)
    ws = F.split("text", " ", -1)
    n_seg = F.ceil(F.size("ws") / F.lit(float(_BP_SEG_W))).cast("int")
    segs = (
        d.select("doc_id", ws.alias("ws"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda i: F.array_join(
                        F.slice("ws", i * _BP_SEG_W + 1, _BP_SEG_W), " "
                    ),
                )
            ).alias("seg_idx", "seg"),
        )
    )
    bo = (
        segs.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BP_DF)
        .select("seg", F.lit(1).alias("is_bo"))
    )
    flagged = segs.join(bo, "seg", "left")
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("is_bo").isNull(),
                    F.struct(F.col("seg_idx"), F.col("seg")),
                )
            )
        ),
        lambda x: x["seg"],
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"),
        F.sum(F.coalesce("is_bo", F.lit(0))).cast("bigint").alias("n_removed"),
        F.md5(F.array_join(kept_sorted, " ").cast("binary")).alias("cleaned_md5"),
    )


# --------------------------------------- windowed audio features

_AW_FRAMES = 4
_AW_FLEN = 16  # samples per analysis frame


@register(
    "multimodal_audio_windows",
    sql=f"""
    WITH s AS (
      SELECT doc_id, k, k // {_AW_FLEN} AS frame_idx,
             (doc_id * 131 + k * 1777) % 65536 - 32768 AS v
      FROM documents
      CROSS JOIN LATERAL unnest(range(0, {_AW_FRAMES * _AW_FLEN})) AS t(k)),
    lagged AS (
      SELECT doc_id, frame_idx, v,
             LAG(v) OVER (PARTITION BY doc_id, frame_idx ORDER BY k) AS pv
      FROM s)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN pv IS NOT NULL
                          AND CAST(pv AS BIGINT) * v < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_cross
    FROM lagged GROUP BY doc_id, frame_idx
    """,
    tags=("multimodal", "pandas-udf", "decode", "audio"),
)
def multimodal_audio_windows(spark, sf_dir):
    """Windowed audio analysis through the REAL codec path: per
    document a {_AW_FRAMES * _AW_FLEN}-sample PCM16 mono WAV (sample k
    = (doc_id·131 + 1777k) mod 2^16 − 2^15) round-trips the
    pure-stdlib RIFF/WAVE codec inside mapInPandas and is reduced to
    per-frame features — energy (Σv², the RMS numerator) and
    zero-crossing count (sign flips between consecutive samples), the
    two classic cheap VAD/speech-music discriminators. Both are PURE
    INTEGERS, so the DuckDB oracle reproduces them arithmetically with
    no codec and no float tolerance at all — a stricter contract than
    the whole-clip statistics row (multimodal_audio_real).

    100 TB plan: map-only — decode + frame reduction happen inside the
    Arrow batch with a 1:{_AW_FRAMES} row explosion (the
    frame-sampling shape); swap a vectorized DSP library into the same
    kernel slot for production feature sets (MFCC etc.)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..multimodal import decode_audio, encode_wav

    docs = T(spark, sf_dir, "documents", parallel=True).select("doc_id")
    out_schema = (
        "doc_id bigint, frame_idx int, energy bigint, n_zero_cross bigint"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "frame_idx", "energy", "n_zero_cross"]
        n_tot = _AW_FRAMES * _AW_FLEN
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                samples = [
                    (d * 131 + k * 1777) % 65536 - 32768 for k in range(n_tot)
                ]
                _sr, _nch, got = decode_audio(encode_wav(8000, 1, samples))
                v = got.astype("int64")
                for f in range(_AW_FRAMES):
                    fr = v[f * _AW_FLEN : (f + 1) * _AW_FLEN]
                    energy = int((fr * fr).sum())
                    zc = int(((fr[:-1] * fr[1:]) < 0).sum())
                    rows.append((d, f, energy, zc))
            yield pd.DataFrame(rows, columns=cols).astype(
                {
                    "doc_id": "int64",
                    "frame_idx": "int32",
                    "energy": "int64",
                    "n_zero_cross": "int64",
                }
            )

    return docs.mapInPandas(kernel, schema=out_schema)


# ----------------------------------- mixture-calibrated subsampling

_MPS_BUDGET = 30000  # total char budget across the sample


@register(
    "sample_mixture_calibrated",
    sql=f"""
    WITH g AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS w_g
      FROM documents GROUP BY lang),
    tgt AS (
      SELECT lang, w_g,
             ({_MPS_BUDGET}::BIGINT * CAST({_MIX_CASE_DUCK} AS BIGINT))
               // 1000000 AS b_g
      FROM g),
    u AS (
      SELECT doc_id, lang, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               AS u32
      FROM documents)
    SELECT u.doc_id, u.lang, u.n_chars,
           LEAST(1000000::BIGINT, (t.b_g * 1000000) // t.w_g) AS rate_ppm
    FROM u JOIN tgt t ON t.lang = u.lang
    WHERE u.u32 * t.w_g < t.b_g * 4294967296
    """,
    tags=("llm", "curation", "sampling"),
)
def sample_mixture_calibrated(spark, sf_dir):
    """Mixture-calibrated subsampling — the draw that implements
    mixture_rebalance_weights: each language gets a char budget
    B_g = B·target_ppm, and documents of that language are kept with
    probability B_g/W_g (W_g = the language's total chars), so the
    EXPECTED sampled char mass per language hits the target mixture
    regardless of how skewed the raw corpus is. The draw is the same
    integer md5 comparison as sample_weighted_pps (keep iff
    u32·W_g < B_g·2^32) — deterministic, engine- and retry-stable.

    100 TB plan: per-language totals are a #langs-row aggregate
    broadcast back to the scan; the keep decision is map-side. One
    corpus scan, one constant-size shuffle — the sampling step stays
    scan-bound at any corpus size."""
    d = T(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(F.sum("n_chars").cast("bigint").alias("w_g"))
    tgt = g.select(
        "lang",
        "w_g",
        F.expr(
            f"({_MPS_BUDGET}L * CAST({_MIX_CASE_DUCK} AS BIGINT)) div 1000000"
        ).alias("b_g"),
    )
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (
        d.select("doc_id", "lang", "n_chars", u32.alias("u32"))
        .join(F.broadcast(tgt), "lang")
        .filter(F.col("u32") * F.col("w_g") < F.col("b_g") * F.lit(4294967296))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.least(
                F.lit(1000000).cast("bigint"),
                F.expr("(b_g * 1000000) div w_g"),
            ).alias("rate_ppm"),
        )
    )


# ------------------------------------------------- triangle counting

_TRIANGLES_DUCK = """
WITH base AS (
  SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE cn.n_name <> sn.n_name
  GROUP BY 1, 2),
und0 AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS sw
  FROM base GROUP BY 1, 2),
ranked AS (
  SELECT a, b, sw,
         ROW_NUMBER() OVER (ORDER BY sw, a, b) AS rn,
         COUNT(*) OVER () AS ne
  FROM und0),
thr AS (SELECT sw AS t FROM ranked WHERE rn = (ne + 1) // 2),
und AS (SELECT a, b FROM und0, thr WHERE sw > t),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1 JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
m AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
SELECT n.n_name AS node, CAST(COUNT(m.node) AS BIGINT) AS n_triangles
FROM nation n LEFT JOIN m ON m.node = n.n_name
GROUP BY n.n_name
"""


@register(
    "graph_triangles_trade",
    sql=_TRIANGLES_DUCK,
    tags=("graph", "triangles", "scale"),
)
def graph_triangles_trade(spark, sf_dir):
    """Per-node triangle counts over the STRONG-trade graph: undirected
    nation trade edges above the median edge weight (corpus-relative,
    so the graph stays comparably sparse at any SF), triangles
    enumerated with the degree-ordered orientation — every edge points
    from its lower-(degree, name) endpoint to the higher one, so each
    triangle is generated exactly once and the two-path fan-out per
    node is bounded by its ORIENTED out-degree (<= sqrt-ish of edges),
    the compact-forward/Latapy optimization that makes distributed
    triangle counting feasible on power-law graphs.

    The oracle counts the same triangles from the naive name-ordered
    enumeration — orientation changes the join shape, not the triangle
    set, which is exactly the property worth pinning cross-engine.

    100 TB plan: the fact join is the q7 shape (dims broadcast, one
    fact shuffle) collapsing to a nation²-bounded edge relation
    (localCheckpoint'd once); the median threshold is an order
    statistic on that bounded relation; the triangle joins are
    edge-grain equi-joins. On a billion-edge graph the same plan runs
    edges-partitioned by join key — orientation keeps the wedge stage
    from exploding on hubs."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("src"))
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("dst"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    und0 = (
        base.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("sw"))
        # nation²-bounded by construction (<= 300 rows at ANY corpus
        # size) — safe to window unpartitioned and localCheckpoint
        .localCheckpoint(eager=True)
    )
    rw = W.orderBy("sw", "a", "b")
    ranked = und0.select(
        "a",
        "b",
        "sw",
        F.row_number().over(rw).alias("rn"),
        F.count("*").over(W.orderBy(F.lit(1)).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )).alias("ne"),
    )
    thr = ranked.filter(F.col("rn") == F.expr("(ne + 1) div 2")).select(
        F.col("sw").alias("t")
    )
    und = (
        und0.crossJoin(F.broadcast(thr))
        .filter(F.col("sw") > F.col("t"))
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    # orient each edge from its lower-(degree, name) endpoint upward
    lower_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    ori = (
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("x"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("y"),
        )
    )
    e1 = ori.select(F.col("x").alias("u"), F.col("y").alias("v"))
    e2 = ori.select(F.col("x").alias("u"), F.col("y").alias("w2"))
    wedge = e1.join(e2, "u").filter(F.col("v") < F.col("w2"))
    # close the wedge: the third edge may be oriented either way
    e3 = ori.select(F.col("x").alias("v"), F.col("y").alias("w2")).unionByName(
        ori.select(F.col("y").alias("v"), F.col("x").alias("w2"))
    )
    tri = wedge.join(e3, ["v", "w2"]).select("u", "v", "w2")
    members = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w2").alias("node")))
    )
    counts = members.groupBy("node").agg(F.count("*").alias("n_triangles"))
    return (
        n.select(F.col("n_name").alias("node"))
        .join(counts, "node", "left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        )
    )
