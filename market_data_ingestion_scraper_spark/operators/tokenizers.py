"""Persisted tokenizer artifacts — the fit/serve seam for the two learned
subword tokenizers (X16 character-BPE, X24 unigram-LM).

Same lifecycle discipline as every other persisted model in the repo (the
`_quantizer.json` lesson, see ``operators/importance.save_dsir_model``):
the artifact carries its own kind and parameters, serving derives
EVERYTHING from the artifact, and loading validates kind/shape so
encoding under the wrong tokenizer family raises instead of silently
producing garbage segmentations.

The artifact is one JSON file (vocabularies are bounded by construction —
``vocab_size``/``n_merges`` entries, KBs not GBs), so it broadcasts into
the Arrow encode stage as a plan literal exactly like the trigram
literal model.
"""

from __future__ import annotations

import json

TOKENIZER_KINDS = ("bpe", "unigram")


def save_tokenizer(artifact: dict, path: str, meta: dict | None = None) -> None:
    """Persist a fitted tokenizer.  ``artifact`` is
    ``{"kind": "bpe", "merges": [(a, b), ...]}`` or
    ``{"kind": "unigram", "lp_micro": {piece: int64 micro-logprob}}``."""
    kind = artifact.get("kind")
    if kind not in TOKENIZER_KINDS:
        raise ValueError(f"unknown tokenizer kind {kind!r}; expected {TOKENIZER_KINDS}")
    doc: dict = {"kind": kind}
    if kind == "bpe":
        merges = artifact["merges"]
        # tuple/list EXPLICITLY: a 2-char string "ab" also has len 2 and
        # the unpack below would silently reinterpret it as ("a", "b")
        if not all(isinstance(p, (list, tuple)) and len(p) == 2 for p in merges):
            raise ValueError("bpe merges must be (left, right) pairs")
        doc["merges"] = [[a, b] for a, b in merges]  # rank order IS the list order
    else:
        lp = artifact["lp_micro"]
        if not all(isinstance(v, int) for v in lp.values()):
            raise ValueError("unigram scores must be int64 micro-unit logprobs")
        doc["lp_micro"] = {p: int(v) for p, v in sorted(lp.items())}
    if meta:
        doc["meta"] = dict(meta)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)


def load_tokenizer(path: str) -> dict:
    """Load a ``save_tokenizer`` artifact, validating kind and shape.
    Returns the dict with ``merges`` as tuples / ``lp_micro`` with int
    values — directly consumable by ``bpe_encode_vocab`` /
    ``unigram_encode_vocab``."""
    with open(path) as f:
        doc = json.load(f)
    kind = doc.get("kind")
    if kind not in TOKENIZER_KINDS:
        raise ValueError(f"not a tokenizer artifact (kind={kind!r}): {path}")
    if kind == "bpe":
        if "merges" not in doc:
            raise ValueError("bpe artifact missing 'merges'")
        doc["merges"] = [tuple(p) for p in doc["merges"]]
        if not all(len(p) == 2 for p in doc["merges"]):
            raise ValueError("bpe merges must be (left, right) pairs")
    else:
        if "lp_micro" not in doc:
            raise ValueError("unigram artifact missing 'lp_micro'")
        doc["lp_micro"] = {p: int(v) for p, v in doc["lp_micro"].items()}
    return doc


def tokenizer_fertility(
    documents,
    artifact: dict,
    by: str = "lang",
    text_col: str = "text",
):
    """Tokenizer EVALUATION (the closing step of the X16/X24 lifecycle:
    fit → persist → encode → evaluate): per-``by``-stratum fertility and
    compression under a fitted tokenizer artifact — the numbers that
    decide whether a tokenizer is fair across languages (high fertility
    on a language = more pieces per word = fewer effective tokens of
    context and higher serving cost for it; see e.g. the multilingual
    fertility analyses of Rust et al. 2021, arXiv:2012.15613 — public).

    Per stratum: ``n_words`` (token occurrences), ``n_distinct_words``,
    ``n_chars`` (word characters — whitespace/punctuation excluded, so
    the number is tokenizer-input chars), ``n_pieces`` (subword pieces
    under the artifact), and two EXACT integer ratios (floor-divided
    ppm, engine-portable): ``fertility_ppm`` = 1e6·n_pieces DIV n_words
    and ``chars_per_piece_ppm`` = 1e6·n_chars DIV n_pieces (the
    compression rate — how many characters one piece carries).

    Scale shape: one map-side-combined groupBy to the (stratum, word,
    n_occ) table (vocabulary-bounded shuffle), Python runs once per
    DISTINCT word (the Arrow encode of ``bpe_encode_vocab`` /
    ``unigram_encode_vocab``), the piece counts join back on the word,
    and the final aggregate is |strata| rows.  Occurrences never enter
    Python; corpus text never shuffles."""
    from pyspark.sql import functions as F

    from .bpe import bpe_encode_vocab
    from .text import tokens
    from .unigram_lm import unigram_encode_vocab

    kind = artifact.get("kind")
    if kind not in TOKENIZER_KINDS:
        raise ValueError(
            f"unknown tokenizer kind {kind!r}; expected {TOKENIZER_KINDS}"
        )
    per_word = (
        documents.select(F.col(by), F.explode(tokens(text_col)).alias("w"))
        .groupBy(by, "w")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    if kind == "bpe":
        enc = bpe_encode_vocab(per_word.select("w"), artifact["merges"])
    else:
        enc = unigram_encode_vocab(per_word.select("w"), artifact["lp_micro"])
    joined = per_word.join(enc.select("w", "n_pieces"), "w")
    return (
        joined.groupBy(by)
        .agg(
            F.sum("n_occ").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
            F.sum(F.length("w") * F.col("n_occ")).cast("long").alias("n_chars"),
            F.sum(F.col("n_pieces") * F.col("n_occ")).cast("long").alias("n_pieces"),
        )
        .select(
            by,
            "n_words",
            "n_distinct_words",
            "n_chars",
            "n_pieces",
            F.expr("(1000000 * n_pieces) DIV n_words").alias("fertility_ppm"),
            F.expr("(1000000 * n_chars) DIV n_pieces").alias(
                "chars_per_piece_ppm"
            ),
        )
    )


# mapInPandas closures must survive being shipped to executor workers
# spawned from a foreign cwd (see operators/multimodal.py for the full
# story): register this module for by-value pickling.
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


def fertility_stats_literal(
    documents,
    artifact: dict,
    text_col: str = "text",
):
    """Stateless per-document piece accounting under a PLAN-LITERAL
    tokenizer artifact — the streaming-admission form of X27, the same
    pattern as ``text.score_with_literal_trigram`` (X21): the bounded
    artifact ships inside the closure, each Arrow batch tokenizes its own
    rows and encodes through a per-batch word memo (Zipf: occurrences ≫
    distinct words, so the memo restores near-vocabulary encode cost), no
    explode, no join, no shuffle, no state — stream-legal in append mode.

    Returns the input columns plus ``n_words``, ``n_pieces``, and
    ``fertility_ppm`` (= 1e6·n_pieces DIV n_words, the exact integer
    ratio of :func:`tokenizer_fertility`).  POLICY: documents with zero
    words get (0, 0, NULL) — NULL fertility is undefined, and the
    streaming filter drops them (the shared un-scoreable policy).  Note
    the relational twins (``bpe_token_stats`` / ``unigram_token_stats``)
    OMIT wordless docs entirely (their occurrence join produces no row);
    this form keeps every input row, which an admission filter needs.

    Offline exact accounting should still use the relational forms; this
    is the serve for admission filtering, exactly the X21 split."""
    kind = artifact.get("kind")
    if kind not in TOKENIZER_KINDS:
        raise ValueError(
            f"unknown tokenizer kind {kind!r}; expected {TOKENIZER_KINDS}"
        )
    if kind == "bpe":
        from .bpe import _encode_word

        rank = {tuple(p): i for i, p in enumerate(artifact["merges"])}

        def count_pieces(w: str) -> int:
            return len(_encode_word(w, rank))

    else:
        from .unigram_lm import viterbi_pieces

        lp = artifact["lp_micro"]
        max_len = max((len(p) for p in lp), default=1)

        def count_pieces(w: str) -> int:
            return len(viterbi_pieces(w, lp, max_len))

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from .text import tokens

    out_schema = StructType(
        list(documents.schema.fields)
        + [
            StructField("n_words", LongType()),
            StructField("n_pieces", LongType()),
            StructField("fertility_ppm", LongType()),
        ]
    )
    # tokenization stays in Catalyst (text.tokens — the ONE tokenizer
    # definition every operator shares); Python only sees the staged
    # token array, so admission fertility cannot drift from the offline
    # relational accounting if tokens() ever changes
    staged = documents.select("*", tokens(text_col).alias("_ws"))

    def op(batches):
        import pandas as pd

        memo: dict = {}
        for pdf in batches:
            n_words, n_pieces, fert = [], [], []
            for ws in pdf["_ws"]:
                ws = [] if ws is None else list(ws)
                total = 0
                for w in ws:
                    c = memo.get(w)
                    if c is None:
                        c = count_pieces(w)
                        memo[w] = c
                    total += c
                n_words.append(len(ws))
                n_pieces.append(total)
                fert.append((1_000_000 * total) // len(ws) if ws else None)
            yield pdf.drop(columns=["_ws"]).assign(
                n_words=pd.array(n_words, dtype="Int64"),
                n_pieces=pd.array(n_pieces, dtype="Int64"),
                fertility_ppm=pd.array(fert, dtype="Int64"),
            )

    return staged.mapInPandas(op, out_schema)
