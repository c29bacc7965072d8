"""bpe_train_merges vs the classic reference BPE trainer (Sennrich-style
dict loop): the distributed set-based merge-apply must learn the exact
same merge table, including greedy leftmost overlap handling."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq
import pytest

from chchfr_data_collection_spark.queries import catalog
from chchfr_data_collection_spark.queries.llm import _BPE_ROUNDS


def _reference_bpe(texts, rounds):
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            vocab[w] += 1
    seqs = {w: [c for c in w] for w in vocab}
    merges = []
    for _ in range(rounds):
        counts = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += vocab[w]
        # argmax with (count desc, pair lexicographic) tie-break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((l, r, c))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2  # greedy leftmost: consume both
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_reference_trainer(spark, sf_small):
    texts = pq.read_table(f"{sf_small}/documents.parquet").column("text").to_pylist()
    want = _reference_bpe(texts, _BPE_ROUNDS)
    got = sorted(
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in catalog()["bpe_train_merges"].fn(spark, sf_small).collect()
    )
    assert got == [(i + 1, l, r, c) for i, (l, r, c) in enumerate(want)]


def test_bpe_greedy_overlap_unit():
    """'aaa' with merge ('a','a') must yield ['aa','a'] — leftmost
    greedy, the semantics both engines implement set-based."""
    merges = _reference_bpe(["aaa aaa"], 1)
    assert merges[0][:2] == ("a", "a")
