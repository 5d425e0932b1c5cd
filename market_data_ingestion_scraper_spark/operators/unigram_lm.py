"""Unigram-LM subword tokenization at corpus scale (SURVEY X24) — the
SentencePiece-style sibling of ``operators/bpe.py``.

Algorithm: Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates" (arXiv:1804.10959)
§3 — a unigram language model over subword pieces, trained by EM and
pruned to a target vocabulary; segmentation is the Viterbi-best piece
sequence.  This implementation is the deterministic HARD-EM (Viterbi-EM)
variant with two exactness choices so the result is bit-reproducible in
an independent reference implementation:

- piece scores are int64 MICRO-UNIT log-probs (``round(ln(c/N)·1e6)``,
  the house pattern), so Viterbi compares integer sums — no float-order
  ambiguity anywhere in training or encoding;
- every tie has a spec'd break: seed/prune keep (count desc, piece asc);
  Viterbi prefers higher score, then FEWER pieces, then the longest
  final piece (smallest split start).

Scale design mirrors BPE exactly — the whole point is where Python runs:

- **Training** consumes only the capped (word, count) table (ONE
  map-side-combined groupBy; corpus touched once).  Seeding, EM and
  pruning are driver-side over ≤ max_vocab tiny tuples.
- **Application** runs Python once per DISTINCT word (Arrow-batched
  ``mapInPandas``), then a relational join maps occurrences to piece
  counts; per-document stats are a plain aggregation.  Text never flows
  through Python row-at-a-time.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts
from .text import tokens

# mapInPandas closures must survive executor workers spawned from a
# foreign cwd — register this module for by-value pickling (see
# operators/multimodal.py for the full story).
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


def _lp_micro_table(counts: dict[str, int]) -> dict[str, int]:
    """count table → int64 micro-unit log-prob table."""
    total = sum(counts.values())
    return {
        p: round(math.log(c / total) * 1e6) for p, c in counts.items() if c > 0
    }


def viterbi_pieces(word: str, lp: dict[str, int], max_len: int) -> list[str]:
    """Viterbi-best segmentation under integer micro-unit piece scores.
    Tie-break: higher score, then fewer pieces, then the longest final
    piece (smallest split start).  Assumes every single character of
    ``word`` is in ``lp`` (the trainer guarantees character coverage);
    characters outside the training alphabet fall back to themselves
    with a floor score so encoding never fails on unseen text."""
    n = len(word)
    floor = min(lp.values()) - 1_000_000 if lp else -1_000_000
    # dp[i] = (score, -n_pieces) best for word[:i]; back[i] = split start
    NEG = float("-inf")
    dp: list[tuple[int | float, int]] = [(NEG, 0)] * (n + 1)
    dp[0] = (0, 0)
    back: list[int] = [0] * (n + 1)
    for i in range(1, n + 1):
        best: tuple[int | float, int, int] | None = None
        best_j = 0
        for j in range(max(0, i - max_len), i):
            if dp[j][0] == NEG:
                continue
            piece = word[j:i]
            s = lp.get(piece)
            if s is None:
                if i - j > 1:
                    continue
                s = floor  # unseen single char: floor, never fail
            cand = (dp[j][0] + s, dp[j][1] - 1, -j)
            # maximize (score, -n_pieces, -start) — smaller start wins
            # ties, i.e. the LONGEST final piece
            if best is None or cand > best:
                best, best_j = cand, j
        if best is not None:
            dp[i] = (best[0], best[1])
            back[i] = best_j
    pieces: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1]


def fit_unigram_lm(
    documents: DataFrame,
    vocab_size: int = 200,
    max_piece_len: int = 4,
    seed_size: int = 800,
    em_rounds: int = 2,
    text_col: str = "text",
    max_vocab: int = 100_000,
) -> dict[str, int]:
    """Learn a unigram-LM piece vocabulary; returns piece → int64
    micro-unit log-prob (the tokenizer artifact).

    Stages (all driver-side over the bounded word table):
    1. SEED: every substring of length 1..max_piece_len of every vocab
       word, scored by Σ word_count × occurrences; keep all single
       characters plus the top multi-char candidates to ``seed_size``
       (count desc, piece asc).
    2. HARD EM (``em_rounds``): Viterbi-segment each word under the
       current scores (E), re-count piece usage weighted by word
       frequency (M).  Characters keep a floor count of 1 so coverage
       never collapses.
    3. PRUNE to ``vocab_size``: all single characters plus the
       top multi-char pieces by final count (count desc, piece asc)."""
    vocab = word_counts(documents, text_col, max_vocab)
    # 1. seed candidates
    seed: dict[str, int] = {}
    chars: set[str] = set()
    for w, n in vocab:
        chars.update(w)
        for ln in range(1, min(max_piece_len, len(w)) + 1):
            for i in range(len(w) - ln + 1):
                p = w[i : i + ln]
                seed[p] = seed.get(p, 0) + n
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, seed_size - len(chars))]
    counts = {c: seed[c] for c in chars}
    counts.update(dict(multi))

    # 2. hard EM
    for _ in range(em_rounds):
        lp = _lp_micro_table(counts)
        max_len = max(len(p) for p in lp)
        new: dict[str, int] = {}
        for w, n in vocab:
            for p in viterbi_pieces(w, lp, max_len):
                new[p] = new.get(p, 0) + n
        for c in chars:  # character coverage floor
            new[c] = max(new.get(c, 0), 1)
        counts = {p: c for p, c in new.items() if c > 0}

    # 3. prune
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, vocab_size - len(chars))]
    final = {c: counts.get(c, 1) for c in chars}
    final.update(dict(multi))
    return _lp_micro_table(final)


def unigram_encode_vocab(
    words: DataFrame, lp: dict[str, int], word_col: str = "w"
) -> DataFrame:
    """(w, pieces, n_pieces) for each DISTINCT word — the only Python in
    the pipeline, Arrow-batched over the deduplicated vocabulary."""
    max_len = max((len(p) for p in lp), default=1)
    out_schema = f"{word_col} string, pieces array<string>, n_pieces int"

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pieces = pdf[word_col].map(lambda w: viterbi_pieces(w, lp, max_len))
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col],
                    "pieces": pieces,
                    "n_pieces": pieces.map(len).astype("int32"),
                }
            )

    return words.select(word_col).distinct().mapInPandas(op, out_schema)


def unigram_token_stats(
    documents: DataFrame,
    lp: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document piece accounting under a learned unigram LM:
    (doc_id, n_words, n_pieces, pieces_per_word) — the same relational
    shape as the BPE accounting (occurrences never enter Python)."""
    occ = documents.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
    enc = unigram_encode_vocab(occ.select("w"), lp)
    joined = occ.join(enc.select("w", "n_pieces"), "w")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
        )
        .withColumn(
            "pieces_per_word",
            F.round(F.col("n_pieces") / F.col("n_words"), 6),
        )
    )
