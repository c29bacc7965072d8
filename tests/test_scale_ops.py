"""Semantic + plan tests for the scale-engineering operators
(queries/scale_ops.py): z-order layout, PPS sampling, mixture
rebalance, bigram-LM scoring, heavy hitters, PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chchfr_data_collection_spark.plans.audit import (
    assert_max_shuffles,
    count_nodes,
)
from chchfr_data_collection_spark.queries import catalog
from chchfr_data_collection_spark.queries.scale_ops import _HH_K, _PPS_K


@pytest.fixture(scope="module")
def cat():
    return catalog()


def test_zorder_files_are_tighter_on_both_dims(spark, sf_med, cat):
    rows = {
        r["layout"]: r
        for r in cat["layout_zorder_clustering"].fn(spark, sf_med).collect()
    }
    z, h = rows["zorder"], rows["rowhash"]
    # z-order pins the top 3 bits of each dimension per file -> spans
    # bounded by 31; the hash layout mixes the full 0..255 range.
    assert z["avg_span_x"] <= 31.0 and z["avg_span_y"] <= 31.0
    assert h["avg_span_x"] > 4 * z["avg_span_x"]
    assert h["avg_span_y"] > 4 * z["avg_span_y"]


def test_zorder_audit_is_two_shuffles_no_window(spark, sf_small, cat):
    df = cat["layout_zorder_clustering"].fn(spark, sf_small)
    # stats groupBy + audit groupBy (plus possible AQE output exchange)
    assert_max_shuffles(df, 2)
    assert count_nodes(df, "Window") == 0


def test_pps_sample_is_reproducible_and_calibrated(spark, sf_med, cat):
    df = cat["sample_weighted_pps"].fn(spark, sf_med)
    a = sorted(r["doc_id"] for r in df.collect())
    b = sorted(r["doc_id"] for r in df.collect())
    assert a == b  # md5 draw: no RNG, identical across runs
    # expected size k; the hash draw should land within a loose band
    assert 0.4 * _PPS_K <= len(a) <= 1.9 * _PPS_K
    assert df.filter(F.col("incl_prob_ppm") > 1000000).count() == 0


def test_pps_inclusion_rule_exact(spark, sf_small, cat):
    # every emitted doc must satisfy u32 * W < k * w * 2^32 recomputed
    # independently
    from chchfr_data_collection_spark.queries.common import T

    d = T(spark, sf_small, "documents")
    w_total = d.agg(F.sum("n_chars")).collect()[0][0]
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint")
    expect = {
        r["doc_id"]
        for r in d.select("doc_id", u32.alias("u"), "n_chars")
        .filter(F.col("u") * w_total < _PPS_K * F.col("n_chars") * 4294967296)
        .collect()
    }
    got = {
        r["doc_id"] for r in cat["sample_weighted_pps"].fn(spark, sf_small).collect()
    }
    assert got == expect


def test_mixture_targets_and_inversion(spark, sf_med, cat):
    rows = cat["mixture_rebalance_weights"].fn(spark, sf_med).collect()
    assert sum(r["target_ppm"] for r in rows) == 1000000
    n_total = sum(r["n_docs"] for r in rows)
    for r in rows:
        assert r["repeat_factor_ppm"] == (r["target_ppm"] * n_total) // r["n_docs"]


def test_bigram_scores_bounded_and_constant_doc_maxes(spark, sf_small, cat):
    df = cat["text_bigram_lm_score"].fn(spark, sf_small)
    assert df.filter(
        (F.col("lm_score_ppb") <= 0) | (F.col("lm_score_ppb") > 1.0e9)
    ).count() == 0
    # a document whose every bigram is unique-with-its-prefix scores
    # the ceiling 1e9 only if each prefix occurs once corpus-wide;
    # cheaper invariant: the best score cannot exceed the ceiling and
    # the mean must be positive
    agg = df.agg(F.max("lm_score_ppb"), F.min("n_bigrams")).collect()[0]
    assert agg[0] <= 1.0e9 and agg[1] >= 1


def test_heavy_hitters_match_exact_groupby(spark, sf_med, cat):
    from chchfr_data_collection_spark.queries.common import T

    d = T(spark, sf_med, "documents")
    words = d.select(F.explode(F.split("text", " ", -1)).alias("w"))
    n_total = words.count()
    exact = {
        (r["w"], r["cnt"])
        for r in words.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * (_HH_K + 1) > n_total)
        .collect()
    }
    got = {
        (r["w"], r["exact_n"])
        for r in cat["sketch_heavy_hitters"].fn(spark, sf_med).collect()
    }
    assert got == exact and len(got) > 0


def test_heavy_hitters_second_pass_broadcasts_candidates(spark, sf_small, cat):
    df = cat["sketch_heavy_hitters"].fn(spark, sf_small)
    assert count_nodes(df, "BroadcastHashJoin") >= 1
    assert count_nodes(df, "SortMergeJoin") == 0


def test_pagerank_mass_and_shape(spark, sf_small, cat):
    rows = cat["graph_pagerank_trade"].fn(spark, sf_small).collect()
    assert len(rows) == 25
    total = sum(r["rank_q"] for r in rows)
    # floored arithmetic and dropped dangling mass only ever LOSE mass
    assert 0 < total <= 1000000000
    assert all(r["rank_q"] > 0 for r in rows)


def test_pagerank_iterations_broadcast_not_sortmerge(spark, sf_small, cat):
    df = cat["graph_pagerank_trade"].fn(spark, sf_small)
    # rank x edges joins are tiny: every per-iteration join broadcasts;
    # the only SMJs allowed are none at all
    assert count_nodes(df, "SortMergeJoin") == 0


def test_streaming_anomaly_equals_batch_twin(spark, sf_small, cat):
    # merged streaming moment partials must reproduce the batch 3-sigma
    # gate exactly: same per-type population and same outlier count as
    # events_anomaly_3sigma computed in one batch pass
    import pyspark.sql.functions as SF

    batch = (
        cat["events_anomaly_3sigma"]
        .fn(spark, sf_small)
        .groupBy("event_type")
        .agg(SF.count("*").alias("n_anomalies"))
    )
    batch_counts = {r["event_type"]: r["n_anomalies"] for r in batch.collect()}
    rep = {
        r["event_type"]: (r["n"], r["n_anomalies"])
        for r in cat["streaming_anomaly_replay"].fn(spark, sf_small).collect()
    }
    from chchfr_data_collection_spark.queries.common import T

    type_n = {
        r["event_type"]: r["n"]
        for r in T(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(SF.count("*").alias("n"))
        .collect()
    }
    assert set(rep) == set(type_n)
    for et, (n, n_anom) in rep.items():
        assert n == type_n[et]
        assert n_anom == batch_counts.get(et, 0)


def test_ahash_kernel_matches_native_expressions(spark, sf_small, cat):
    # the real-codec kernel (encode BMP -> stdlib decode -> hash) and
    # the native-expression twin must produce identical 64-bit hashes
    kernel = {
        r["doc_id"]: (r["h_hi"], r["h_lo"])
        for r in cat["multimodal_image_ahash"].fn(spark, sf_small).collect()
    }
    from chchfr_data_collection_spark.queries.common import T
    from chchfr_data_collection_spark.queries.scale_ops import _ahash_native

    native = {
        r["doc_id"]: (r["h_hi"], r["h_lo"])
        for r in _ahash_native(
            T(spark, sf_small, "documents").select("doc_id")
        ).collect()
    }
    assert kernel == native and len(kernel) > 0


def test_ahash_pairs_no_cartesian_and_near_dups_found(spark, sf_small, cat):
    df = cat["dedup_image_ahash_pairs"].fn(spark, sf_small)
    assert count_nodes(df, "CartesianProduct") == 0
    assert count_nodes(df, "BroadcastNestedLoopJoin") == 0
    rows = df.collect()
    # designed near-duplicates: members 0/1/2 of each doc_id group of 4
    same_group = [r for r in rows if r["da"] // 4 == r["db"] // 4]
    assert len(same_group) > 0
    assert all(r["hamming"] <= 6 for r in rows)


def test_boilerplate_removal_reconstruction(spark, sf_small, cat):
    # independently recompute one doc's cleaned text in Python and
    # match the operator's md5; also require that something was removed
    # somewhere (the fixture embeds cross-doc duplicated spans)
    import hashlib

    from chchfr_data_collection_spark.queries.common import T
    from chchfr_data_collection_spark.queries.scale_ops import _BP_DF, _BP_SEG_W

    docs = {
        r["doc_id"]: r["text"]
        for r in T(spark, sf_small, "documents").select("doc_id", "text").collect()
    }
    seg_docs = {}
    segs = {}
    for d, t in docs.items():
        ws = t.split(" ")
        ss = [
            " ".join(ws[i * _BP_SEG_W : (i + 1) * _BP_SEG_W])
            for i in range((len(ws) + _BP_SEG_W - 1) // _BP_SEG_W)
        ]
        segs[d] = ss
        for s in ss:
            seg_docs.setdefault(s, set()).add(d)
    bo = {s for s, ds in seg_docs.items() if len(ds) >= _BP_DF}
    rows = {
        r["doc_id"]: r
        for r in cat["text_boilerplate_removal"].fn(spark, sf_small).collect()
    }
    assert sum(r["n_removed"] for r in rows.values()) > 0
    for d, ss in segs.items():
        kept = " ".join(s for s in ss if s not in bo)
        r = rows[d]
        assert r["n_segs"] == len(ss)
        assert r["n_removed"] == sum(1 for s in ss if s in bo)
        assert r["cleaned_md5"] == hashlib.md5(kept.encode()).hexdigest()


def test_audio_windows_match_direct_arithmetic(spark, sf_small, cat):
    # recompute one frame's features straight from the sample formula
    # (bypassing the codec) — codec round-trip must be lossless PCM16
    from chchfr_data_collection_spark.queries.scale_ops import _AW_FLEN, _AW_FRAMES

    rows = {
        (r["doc_id"], r["frame_idx"]): (r["energy"], r["n_zero_cross"])
        for r in cat["multimodal_audio_windows"].fn(spark, sf_small).collect()
    }
    assert len(rows) > 0
    some_docs = sorted({d for d, _ in rows})[:10]
    for d in some_docs:
        samples = [
            (d * 131 + k * 1777) % 65536 - 32768
            for k in range(_AW_FRAMES * _AW_FLEN)
        ]
        for f in range(_AW_FRAMES):
            fr = samples[f * _AW_FLEN : (f + 1) * _AW_FLEN]
            energy = sum(v * v for v in fr)
            zc = sum(1 for a, b in zip(fr, fr[1:]) if a * b < 0)
            assert rows[(d, f)] == (energy, zc)


def test_mixture_sampling_is_calibrated_per_lang(spark, sf_med, cat):
    # expected sampled char mass per language ~= its budget B_g
    from chchfr_data_collection_spark.queries.common import T
    from chchfr_data_collection_spark.queries.scale_ops import (
        _MIX_TARGET_PPM,
        _MPS_BUDGET,
    )

    got = cat["sample_mixture_calibrated"].fn(spark, sf_med).collect()
    assert len(got) > 0
    by_lang = {}
    for r in got:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_chars"]
    for lang, chars in by_lang.items():
        b_g = _MPS_BUDGET * _MIX_TARGET_PPM[lang] // 1000000
        # hash-uniform draw: sampled mass within a loose 3x band of target
        assert b_g / 3 <= chars <= 3 * b_g, (lang, chars, b_g)


def test_triangles_match_networkx_free_recompute(spark, sf_small, cat):
    """Independent Python recompute: rebuild the strong-trade graph from
    the fixture with duckdb, count triangles per node by set
    intersection, compare exactly."""
    import duckdb

    rows = {
        r["node"]: r["n_triangles"]
        for r in cat["graph_triangles_trade"].fn(spark, sf_small).collect()
    }
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    und = con.sql("""
    WITH base AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE cn.n_name <> sn.n_name GROUP BY 1,2),
    u AS (SELECT LEAST(src,dst) a, GREATEST(src,dst) b, SUM(w) sw FROM base GROUP BY 1,2)
    SELECT a, b, sw FROM u
    """).fetchall()
    sws = sorted((sw, a, b) for a, b, sw in und)
    t_val = sws[(len(sws) + 1) // 2 - 1][0]
    adj: dict = {}
    for a, b, sw in und:
        if sw > t_val:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    nodes = [r[0] for r in con.sql("SELECT n_name FROM nation").fetchall()]
    want = {}
    for v in nodes:
        nb = adj.get(v, set())
        cnt = sum(len(nb & adj.get(u, set())) for u in nb) // 2
        want[v] = cnt
    assert rows == want
    assert sum(want.values()) > 0
