"""X24 unigram-LM tokenizer: Kudo 2018 hard-EM with integer micro-unit
scores.  The trainer+encoder differential vs an independently-written
reference lives in the gate oracle (queries._ulm_reference_encoded_vocab);
these tests pin the operator-level semantics: coverage, compression of
frequent words, Viterbi tie-breaks, and parallelism determinism."""

from __future__ import annotations

from market_data_ingestion_scraper_spark.operators.unigram_lm import (
    fit_unigram_lm,
    unigram_token_stats,
    viterbi_pieces,
)


def test_frequent_word_becomes_one_piece(spark):
    # 'hello' dominates the corpus -> survives pruning as a whole piece
    rows = [(i, "hello " * 5 + "xq") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lp = fit_unigram_lm(df, vocab_size=30, max_piece_len=5)
    assert "hello" in lp
    assert viterbi_pieces("hello", lp, 5) == ["hello"]
    # every single character of the corpus is covered
    for c in "heloxq":
        assert c in lp
    # an unseen word still encodes (char fallback, floor for alien chars)
    assert len(viterbi_pieces("zebra", lp, 5)) == 5


def test_viterbi_tiebreak_prefers_fewer_then_longest_final(spark):
    # equal-score construction: pieces 'ab', 'cd', 'abcd' all present;
    # score(abcd) > score(ab)+score(cd) guarantees the single piece wins
    lp = {"a": -10, "b": -10, "c": -10, "d": -10, "ab": -5, "cd": -5,
          "abcd": -9}
    assert viterbi_pieces("abcd", lp, 4) == ["abcd"]
    # with the whole-word piece removed, the two bigrams win over chars
    lp.pop("abcd")
    assert viterbi_pieces("abcd", lp, 4) == ["ab", "cd"]


def test_token_stats_deterministic_across_partitionings(spark):
    rows = [
        (i, f"alpha beta w{i % 6} gamma delta common common") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lp = fit_unigram_lm(df, vocab_size=60, max_piece_len=4)
    a = {
        (r["doc_id"]): (r["n_words"], r["n_pieces"], r["pieces_per_word"])
        for r in unigram_token_stats(df, lp).collect()
    }
    b = {
        (r["doc_id"]): (r["n_words"], r["n_pieces"], r["pieces_per_word"])
        for r in unigram_token_stats(df.repartition(7), lp).collect()
    }
    assert a == b
    assert all(v[0] == 7 for v in a.values())  # 7 words per doc
    # subword compression: pieces_per_word strictly below the char count
    # (the learned pieces actually compress) but at least 1
    assert all(1 <= v[1] / v[0] < 4 for v in a.values())


def test_fit_is_deterministic(spark):
    rows = [(i, f"w{i % 5} repeated tokens here") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lp1 = fit_unigram_lm(df, vocab_size=40)
    lp2 = fit_unigram_lm(df.repartition(9), vocab_size=40)
    assert lp1 == lp2


def test_viterbi_is_optimal_vs_bruteforce():
    """Property: for short words, Viterbi's segmentation must achieve the
    maximum total score over ALL possible segmentations, and apply the
    spec'd tie-breaks (fewer pieces, then longest final piece)."""
    import itertools

    lp = {
        "a": -120, "b": -90, "c": -200, "ab": -150, "bc": -140,
        "abc": -310, "ca": -100, "aa": -230,
    }

    def all_segmentations(w):
        n = len(w)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pieces, start = [], 0
            for i, cut in enumerate(cuts, 1):
                if cut:
                    pieces.append(w[start:i])
                    start = i
            pieces.append(w[start:])
            yield pieces

    floor = min(lp.values()) - 1_000_000

    def score(pieces):
        s = 0
        for p in pieces:
            v = lp.get(p)
            if v is None:
                if len(p) > 1:
                    return None  # unseen multi-char: not a legal path
                v = floor
            s += v
        return s

    from market_data_ingestion_scraper_spark.operators.unigram_lm import (
        viterbi_pieces,
    )

    for w in ["abc", "abca", "aabbcc", "cabcab", "zabz", "a", "zz"]:
        got = viterbi_pieces(w, lp, 3)
        assert "".join(got) == w
        got_score = score(got)
        legal = [
            (p, score(p)) for p in all_segmentations(w) if score(p) is not None
        ]
        best = max(s for _, s in legal)
        assert got_score == best, (w, got, got_score, best)
        # tie-breaks: among max-score segmentations, fewest pieces; among
        # those, the longest final piece
        tied = [p for p, s in legal if s == best]
        min_len = min(len(p) for p in tied)
        assert len(got) == min_len, (w, got, tied)
        finalists = [p for p in tied if len(p) == min_len]
        assert len(got[-1]) == max(len(p[-1]) for p in finalists), (w, got)
