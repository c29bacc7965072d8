"""Curation operators: plan shape (scale) + semantic invariants.

The curation pass is the one pipeline that MUST hold at 100 TB — a
stratified sample that shuffles, or a decontamination scan that
shuffles the training corpus, is unusable. Pin those properties here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chchfr_data_collection_spark.plans.audit import (
    assert_max_shuffles,
    assert_read_columns,
    count_nodes,
)
from chchfr_data_collection_spark.queries import catalog


@pytest.fixture(scope="module")
def cat():
    return catalog()


def test_sample_stratified_is_map_only(spark, sf_small, cat):
    """Hash sampling is a pure filter: zero shuffles, scan prunes to the
    two output columns. At 100 TB this is the difference between a
    single pass and a sort."""
    df = cat["sample_stratified"].fn(spark, sf_small)
    assert_max_shuffles(df, 0)
    assert_read_columns(df, "documents", {"doc_id", "lang"})


def test_sample_stratified_rates(spark, sf_small, cat):
    """Per-stratum keep rate lands near the configured percentage and is
    exactly reproducible run-to-run (hash, not RNG)."""
    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = cat["sample_stratified"].fn(spark, sf_small)
    kept1 = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept2 = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept1 == kept2  # deterministic
    for lang, n in totals.items():
        if n < 20:
            continue
        frac = kept1.get(lang, 0) / n
        assert 0.0 <= frac <= 1.0
        # loose band: md5 mod-100 on a small stratum has binomial noise
        assert abs(frac - {"en": 0.6, "fr": 0.4, "de": 0.4, "es": 0.4, "zh": 0.2}.get(lang, 0.3)) < 0.25


def test_shard_packing_budget_invariant(spark, sf_small, cat):
    """Every shard except a stratum's last starts below the 20k budget:
    shard_id equals floor(cumulative-tokens-before / budget), so within
    (lang, shard) the tokens-before of the first doc is < budget."""
    out = cat["shard_packing"].fn(spark, sf_small).collect()
    assert out
    by_stratum: dict = {}
    for r in out:
        by_stratum.setdefault(r["lang"], []).append(r)
    for lang, rows in by_stratum.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["shard_id"] == cum // 20000, (lang, r["doc_id"])
            cum += r["n_tokens"]


def test_shard_packing_one_shuffle(spark, sf_small, cat):
    df = cat["shard_packing"].fn(spark, sf_small)
    # one exchange for the per-lang window (+ the scan repartition)
    assert_max_shuffles(df, 2)
    assert_read_columns(df, "documents", {"doc_id", "lang", "text"})


def test_substratified_packing_budget_and_width(spark, sf_small, cat):
    """Substratified packing: the budget invariant holds per (lang, sub)
    substratum, the union of substrata is exactly the corpus, and the
    widest window partition is strictly narrower than the widest plain
    stratum (the skew mitigation actually bites on this fixture)."""
    out = cat["shard_packing_substratified"].fn(spark, sf_small).collect()
    assert out
    by_sub: dict = {}
    for r in out:
        assert 0 <= r["sub"] < 4
        by_sub.setdefault((r["lang"], r["sub"]), []).append(r)
    for key, rows in by_sub.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["shard_id"] == cum // 20000, (key, r["doc_id"])
            cum += r["n_tokens"]
    plain = cat["shard_packing"].fn(spark, sf_small).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in plain}
    widest_stratum: dict = {}
    for r in plain:
        widest_stratum[r["lang"]] = widest_stratum.get(r["lang"], 0) + 1
    assert max(len(v) for v in by_sub.values()) < max(widest_stratum.values())


def test_substratified_packing_partitions_on_sub(spark, sf_small, cat):
    """The window exchange must hash on (lang, sub) — the substratum is
    in the partitioning key, which is what bounds per-task width."""
    df = cat["shard_packing_substratified"].fn(spark, sf_small)
    assert_max_shuffles(df, 2)
    assert_read_columns(df, "documents", {"doc_id", "lang", "text"})
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"hashpartitioning\(([^)]*)\)", plan)
    assert m and "lang" in m.group(1) and "sub" in m.group(1), plan[:2000]


def test_decontaminate_broadcasts_eval_side(spark, sf_small, cat):
    """The eval/benchmark side is tiny by construction — it must arrive
    at the join as a broadcast, so the training corpus is never
    shuffled on the shingle."""
    df = cat["decontaminate_overlap"].fn(spark, sf_small)
    assert count_nodes(df, "BroadcastHashJoin") >= 1
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "CartesianProduct") == 0


def test_decontaminate_self_overlap_detected(spark, sf_small, cat):
    """A doc duplicated across the eval/train boundary must collide.
    Build the check from the fixture itself: any (train, eval) pair
    sharing >= 1 8-gram appears with a positive count."""
    out = cat["decontaminate_overlap"].fn(spark, sf_small)
    rows = out.collect()
    for r in rows:
        assert r["n_shared_8grams"] >= 1
        assert r["eval_doc_id"] < 50 <= r["train_doc_id"]


def test_repetition_filter_no_joins(spark, sf_small, cat):
    """The repetition pass is explode + two aggregations — it must never
    introduce a join (the whole point is running it before any pairwise
    stage)."""
    df = cat["text_repetition_filter"].fn(spark, sf_small)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert count_nodes(df, node) == 0
    assert_max_shuffles(df, 3)


def test_repetition_filter_flags_degenerate_text(spark, sf_small, cat):
    """The keep flag is exactly the conjunction of the two thresholds
    for every fixture document."""
    rows = {r["doc_id"]: r for r in cat["text_repetition_filter"].fn(spark, sf_small).collect()}
    assert rows
    for r in rows.values():
        if r["keep"]:
            assert r["top_bigram_frac"] <= 0.18 and r["dup_bigram_frac"] <= 0.5
        else:
            assert r["top_bigram_frac"] > 0.18 or r["dup_bigram_frac"] > 0.5


def test_train_split_positions_contiguous(spark, sf_small, cat):
    """Positions are a dense 1..n ranking within each split, the split
    fractions land near 96/2/2, and the assignment is identical across
    two runs (hash, not RNG)."""
    out1 = cat["train_split_assign"].fn(spark, sf_small).collect()
    out2 = cat["train_split_assign"].fn(spark, sf_small).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_split: dict = {}
    for r in out1:
        by_split.setdefault(r["split"], []).append(r["position"])
    assert set(by_split) == {"train", "val", "test"}
    for split, pos in by_split.items():
        assert sorted(pos) == list(range(1, len(pos) + 1)), split
    n = len(out1)
    assert len(by_split["train"]) / n > 0.85


def test_streaming_doc_dedup_watermarked_drops_in_window_dups(spark, sf_small, tmp_path):
    """The watermark-bounded dedup must drop duplicates arriving WITHIN
    the watermark window across micro-batches: the same corpus fed as
    two files (synthetic ingest times identical per doc) yields one row
    per distinct text, matching the unbounded variant on bounded input."""
    import shutil
    import uuid

    from chchfr_data_collection_spark.streaming.documents import (
        DOCUMENTS_SCHEMA,
        dedup_by_content_within_watermark,
    )

    land = tmp_path / "landwm"
    land.mkdir()
    shutil.copy(f"{sf_small}/documents.parquet", land / "b1.parquet")
    shutil.copy(f"{sf_small}/documents.parquet", land / "b2.parquet")
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(land))
    )
    name = "docdedup_wm_t_" + uuid.uuid4().hex[:8]
    q = (
        dedup_by_content_within_watermark(stream)
        .select("content_hash")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2
    got = {r.content_hash for r in spark.sql(f"SELECT * FROM {name}").collect()}
    import pyspark.sql.functions as SF

    expected = {
        r.h
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .select(SF.md5(SF.col("text").cast("binary")).alias("h"))
        .distinct()
        .collect()
    }
    assert got == expected


def test_streaming_doc_dedup_state_spans_batches(spark, sf_small, tmp_path):
    """Content-hash dedup state must survive ACROSS micro-batches: feed
    the same corpus as two files processed one per trigger — every doc in
    batch 2 is a duplicate of batch 1, so the output must equal one row
    per distinct text, not two."""
    import shutil
    import uuid

    from chchfr_data_collection_spark.streaming.documents import (
        dedup_by_content,
    )
    from chchfr_data_collection_spark.streaming.documents import (
        DOCUMENTS_SCHEMA,
    )

    land = tmp_path / "land"
    land.mkdir()
    shutil.copy(f"{sf_small}/documents.parquet", land / "b1.parquet")
    shutil.copy(f"{sf_small}/documents.parquet", land / "b2.parquet")
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(land))
    )
    name = "docdedup_t_" + uuid.uuid4().hex[:8]
    q = (
        dedup_by_content(stream)
        .select("content_hash")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # really ran as >1 micro-batch
    got = spark.sql(f"SELECT * FROM {name}").collect()
    import pyspark.sql.functions as SF

    expected = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select(SF.md5(SF.col("text").cast("binary")).alias("h"))
        .distinct()
        .count()
    )
    assert len(got) == expected
    assert len({r["content_hash"] for r in got}) == len(got)


def test_curation_pipeline_composes(spark, sf_small, cat):
    """End-to-end pass: output is a subset of documents, quality is in a
    sane band, exact dups collapse (distinct texts only), and the plan
    stays cartesian-free (the drop list anti-join is unhinted — AQE
    picks the strategy)."""
    df = cat["curation_pipeline"].fn(spark, sf_small)
    assert count_nodes(df, "CartesianProduct") == 0
    rows = df.collect()
    assert rows
    assert all(r["quality"] > 0.5 for r in rows)
    # exact-dup collapse: kept doc_ids are unique
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_pmi_collocations_vocab_broadcast(spark, sf_small, cat):
    """The vocabulary joins broadcast (vocab grows sublinearly); the only
    cartesian-ish node is the 1-row total attach."""
    from chchfr_data_collection_spark.plans.audit import count_nodes

    df = cat["text_pmi_collocations"].fn(spark, sf_small)
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "BroadcastNestedLoopJoin") <= 1
    rows = df.collect()
    assert len(rows) <= 50
    assert all(r["n12"] >= 5 and r["lift"] > 0 for r in rows)


def test_sequence_boundaries_continuity(spark, sf_small, cat):
    """Sequence packing invariants: within each language stream, doc i+1
    starts exactly where doc i ends (token-contiguous concatenation),
    offsets stay below the 2048 budget, and spans are consistent."""
    rows = cat["pack_sequence_boundaries"].fn(spark, sf_small).collect()
    assert rows
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rs:
            assert r["first_seq"] == pos // 2048
            assert r["offset_in_first"] == pos % 2048
            end = pos + r["n_tokens"]
            expected_last = pos // 2048 if r["n_tokens"] == 0 else (end - 1) // 2048
            assert r["last_seq"] == expected_last, (lang, r["doc_id"])
            assert 0 <= r["offset_in_first"] < 2048
            pos = end


def test_quarantine_loses_no_rows(spark, sf_small, cat):
    """Disposition routing partitions the input exactly: every incoming
    row appears once, with a valid three-way label."""
    out = cat["ingest_with_quarantine"].fn(spark, sf_small).collect()
    n_supp = spark.read.parquet(f"{sf_small}/supplier.parquet").count()
    assert len(out) == n_supp
    assert {r["disposition"] for r in out} <= {"ingested", "duplicate", "quarantined"}
    assert len({r["location_id"] for r in out}) == n_supp


def test_chunk_overlap_covers_every_word(spark):
    """Chunk windows must tile each document: starts advance by STRIDE
    from 1, each chunk is min(SIZE, remaining) words, and the last chunk
    reaches the document's final word."""
    from chchfr_data_collection_spark.queries import catalog
    from chchfr_data_collection_spark.queries.curation import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )

    sf = "/root/testdata/sf0.001"
    n_words = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(sf + "/documents.parquet").collect()
    }
    rows = catalog()["doc_chunk_overlap"].fn(spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_words)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = n_words[doc]
        for k, r in enumerate(chunks):
            assert r.chunk_id == k
            assert r.start_word == 1 + k * _CHUNK_STRIDE
            assert r.n_words == min(_CHUNK_SIZE, n - r.start_word + 1)
        last = chunks[-1]
        assert last.start_word + last.n_words - 1 == n
        assert len(chunks) == 1 or chunks[-2].start_word + _CHUNK_SIZE >= last.start_word


def test_decontaminate_minhash_catches_all_high_jaccard_leaks(spark, sf_small, cat):
    """At J >= 0.8 the b=8/r=4 banding's collision set (deterministic —
    fixed portable permutations) must cover every exact cross-boundary
    pair in this fixture; fuzzy output is a superset check vs the exact
    8-gram scan's pair space restricted to J >= 0.8."""
    got = {
        (r["train_doc_id"], r["eval_doc_id"])
        for r in cat["decontaminate_minhash"].fn(spark, sf_small).collect()
    }
    docs = __import__("pyarrow.parquet", fromlist=["pq"]).read_table(
        f"{sf_small}/documents.parquet"
    )
    texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
    def sh(t):
        w = t.split(" ")
        return {"_".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()
    shs = {i: sh(t) for i, t in texts.items()}
    want = set()
    for e, se in shs.items():
        if e >= 50 or not se:
            continue
        for t, st in shs.items():
            if t < 50 or not st:
                continue
            inter = len(se & st)
            if inter and inter / (len(se) + len(st) - inter) >= 0.8:
                want.add((t, e))
    assert got == want
    assert len(got) > 0


def test_decontaminate_minhash_no_cartesian(spark, sf_small, cat):
    from chchfr_data_collection_spark.plans.audit import count_nodes

    df = cat["decontaminate_minhash"].fn(spark, sf_small)
    assert count_nodes(df, "CartesianProduct") == 0


def test_quality_gate_drops_strictly_below_rank_k(spark, sf_small, cat):
    """The gate keeps exactly the rows at/above the k-th smallest score
    (k = ceil(N/10)): dropped rows are those strictly below the
    threshold, so dropped <= k-1; the threshold column is constant."""
    import math

    import pyarrow.parquet as pq

    rows = cat["quality_percentile_gate"].fn(spark, sf_small).collect()
    n = pq.read_metadata(f"{sf_small}/documents.parquet").num_rows
    k = math.ceil(n / 10)
    thr = {r["p10_ppm"] for r in rows}
    assert len(thr) == 1
    p10 = thr.pop()
    assert all(r["quality_ppm"] >= p10 for r in rows)
    dropped = n - len(rows)
    # dropped = rows strictly below the k-th smallest -> at most k-1;
    # ties at the threshold only ever shrink the drop count
    assert 0 < dropped <= k - 1


def test_blocklist_redaction_is_map_only_and_bites(spark, sf_small, cat):
    """Pure map pass (no shuffle, no join) and the fixture actually
    contains blocklisted tokens; redacted docs recompute exactly."""
    import hashlib

    from chchfr_data_collection_spark.plans.audit import assert_max_shuffles, count_nodes
    from chchfr_data_collection_spark.queries.curation import _BLOCKLIST

    df = cat["text_blocklist_redaction"].fn(spark, sf_small)
    assert_max_shuffles(df, 1)  # the scan repartition only
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert count_nodes(df, node) == 0
    rows = {r["doc_id"]: r for r in df.collect()}
    flagged = [r for r in rows.values() if not r["keep"]]
    assert flagged, "blocklist should bite on this fixture"
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_small}/documents.parquet")
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        ws = text.split(" ")
        n_bad = sum(w in _BLOCKLIST for w in ws)
        cleaned = " ".join("<removed>" if w in _BLOCKLIST else w for w in ws)
        r = rows[doc_id]
        assert r["n_bad"] == n_bad and r["keep"] == (n_bad == 0)
        assert r["clean_hash"] == hashlib.md5(cleaned.encode()).hexdigest()


def test_curriculum_buckets_are_balanced_quartiles(spark, sf_small, cat):
    """Bucket sizes are quartile-balanced up to threshold ties, bucket
    ordering agrees with score ordering, and the worst decile that
    quality_percentile_gate drops sits entirely in bucket 1."""
    rows = cat["curriculum_quality_buckets"].fn(spark, sf_small).collect()
    n = len(rows)
    by_b: dict = {}
    for r in rows:
        by_b.setdefault(r["bucket"], []).append(r["quality_ppm"])
    assert set(by_b) == {1, 2, 3, 4}
    for b in (1, 2, 3):
        assert max(by_b[b]) <= min(by_b[b + 1])
    for b, vs in by_b.items():
        assert len(vs) >= n // 8  # ties can skew, not collapse
    kept = {r["doc_id"] for r in cat["quality_percentile_gate"].fn(spark, sf_small).collect()}
    dropped_buckets = {r["bucket"] for r in rows if r["doc_id"] not in kept}
    assert dropped_buckets <= {1}


def test_pipeline_v2_routing_consistent_with_standalone_ops(spark, sf_small, cat):
    """The routing table is a partition of the corpus and each stage
    agrees with its standalone operator: blocklisted == the blocklist
    pass's flagged train docs; eval_heldout == doc_id < 50; kept docs
    pass every standalone gate."""
    rows = {r["doc_id"]: r["disposition"] for r in cat["curation_pipeline_v2"].fn(spark, sf_small).collect()}
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_small}/documents.parquet").num_rows
    assert len(rows) == n_docs
    bl = {r["doc_id"]: r["n_bad"] for r in cat["text_blocklist_redaction"].fn(spark, sf_small).collect()}
    for d, disp in rows.items():
        if d < 50:
            assert disp == "eval_heldout"
        elif bl[d] > 0:
            assert disp == "blocklisted"
        else:
            assert disp in ("low_quality", "exact_dup", "contaminated", "kept")
    assert sum(1 for v in rows.values() if v == "kept") > 0
    assert len(set(rows.values())) >= 4  # several stages actually bite


def test_pack_sequences_emit_tiles_exactly(spark, sf_small, cat):
    """Per (lang, seq): segments tile the sequence contiguously from
    offset 0, every full sequence sums to exactly 2048 tokens, only the
    last sequence per lang may be short, and per doc the segments
    partition [0, n_tokens)."""
    rows = cat["pack_sequences_emit"].fn(spark, sf_small).collect()
    assert rows
    by_seq: dict = {}
    by_doc: dict = {}
    for r in rows:
        assert r["n_tok"] > 0
        by_seq.setdefault((r["lang"], r["seq_id"]), []).append(r)
        by_doc.setdefault(r["doc_id"], []).append(r)
    for (lang, seq), segs in by_seq.items():
        segs.sort(key=lambda r: r["seq_offset"])
        pos = 0
        for s in segs:
            assert s["seq_offset"] == pos, (lang, seq)
            pos += s["n_tok"]
        max_seq = max(s2 for (l2, s2) in by_seq if l2 == lang)
        if seq < max_seq:
            assert pos == 2048, (lang, seq, pos)
        else:
            assert 0 < pos <= 2048
    for d, segs in by_doc.items():
        segs.sort(key=lambda r: r["doc_start_tok"])
        pos = 0
        for s in segs:
            assert s["doc_start_tok"] == pos, d
            pos += s["n_tok"]
