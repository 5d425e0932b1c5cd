"""BPE tokenization (operators/bpe.py): trainer determinism against a
hand-checkable corpus, apply ≡ an independent pure-Python reference, and
the vocabulary-boundedness that makes the design scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators import bpe as B


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "low low low low low"),
        (1, "lower lower newest newest"),
        (2, "newest newest newest newest"),
        (3, "widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts_deterministic_order(spark, corpus):
    wc = B.word_counts(corpus)
    assert wc[0] == ("newest", 6) and wc[1] == ("low", 5)
    assert [w for w, _ in wc] == ["newest", "low", "lower", "widest"]


def test_fit_merges_matches_hand_computation(spark, corpus):
    """First rounds on the Sennrich toy corpus are hand-checkable:
    'es' (newest 6 + widest 2 = 8) wins round 1, then 'est' = 8,
    then 'lo' (low 5 + lower 2 = 7)."""
    merges = B.fit_bpe_merges(corpus, n_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o")]


def test_encode_matches_reference_and_respects_rank(spark, corpus):
    merges = B.fit_bpe_merges(corpus, n_merges=5)
    enc = {
        r["w"]: (list(r["pieces"]), r["n_pieces"])
        for r in B.bpe_encode_vocab(
            corpus.select(F.explode(B.tokens("text")).alias("w")), merges
        ).collect()
    }
    # independent reference: same greedy-by-rank loop in plain python
    rank = {p: i for i, p in enumerate(merges)}

    def ref(word):
        seg = list(word)
        while len(seg) > 1:
            pairs = list(zip(seg, seg[1:]))
            ranked = [(rank[p], i) for i, p in enumerate(pairs) if p in rank]
            if not ranked:
                break
            _, i = min(ranked)
            seg = seg[:i] + [seg[i] + seg[i + 1]] + seg[i + 2:]
        return seg

    for w, (pieces, n) in enc.items():
        assert pieces == ref(w), w
        assert n == len(pieces)
    # trained pieces actually compress: 'newest' is far fewer than chars
    assert enc["newest"][1] < len("newest")


def test_encode_runs_once_per_distinct_word(spark, corpus):
    merges = B.fit_bpe_merges(corpus, n_merges=2)
    occ = corpus.select(F.explode(B.tokens("text")).alias("w"))
    out = B.bpe_encode_vocab(occ, merges)
    # 15 occurrences but only 4 distinct words reach the Python stage
    assert occ.count() == 15
    assert out.count() == 4


def test_token_stats_per_doc(spark, corpus):
    merges = B.fit_bpe_merges(corpus, n_merges=5)
    stats = {r["doc_id"]: r for r in B.bpe_token_stats(corpus, merges).collect()}
    assert stats[0]["n_words"] == 5
    # every doc's piece count is >= its word count and <= its char count
    for d, r in stats.items():
        assert r["n_pieces"] >= r["n_words"]
        assert abs(r["pieces_per_word"] - r["n_pieces"] / r["n_words"]) < 1e-9


def test_merges_on_fixture_documents(spark, sf_smoke):
    from market_data_ingestion_scraper_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    merges = B.fit_bpe_merges(docs, n_merges=20, max_vocab=2000)
    assert len(merges) == 20 and len(set(merges)) == 20
    stats = B.bpe_token_stats(docs, merges)
    row = stats.agg(
        F.min("pieces_per_word").alias("lo"), F.max("pieces_per_word").alias("hi")
    ).collect()[0]
    assert 1.0 <= row["lo"] <= row["hi"]


def test_save_tokenizer_rejects_string_merge(tmp_path):
    """r12 advice: a 2-char STRING like "ab" also has len 2 and the
    merge unpack would silently reinterpret it as ("a", "b") — the
    validator must require explicit (left, right) pairs."""
    import pytest

    from market_data_ingestion_scraper_spark.operators.tokenizers import (
        save_tokenizer,
    )

    with pytest.raises(ValueError, match="left, right"):
        save_tokenizer(
            {"kind": "bpe", "merges": ["ab"]}, str(tmp_path / "t.json")
        )
    # genuine pairs still persist
    save_tokenizer(
        {"kind": "bpe", "merges": [("a", "b"), ["ab", "c"]]},
        str(tmp_path / "ok.json"),
    )
