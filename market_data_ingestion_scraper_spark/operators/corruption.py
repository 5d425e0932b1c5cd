"""X34 self-supervised training-example constructors: T5-style span
corruption (Raffel et al. 2020, JMLR — "Exploring the Limits of Transfer
Learning", §3.1.4 objective) and FIM / fill-in-the-middle splits
(Bavarian et al. 2022, arXiv:2207.14255 — "Efficient Training of
Language Models to Fill in the Middle", PSM format) — the two standard
denoising/infilling example shapes a pretraining data pipeline emits
downstream of curation.

Determinism is the design center (these are ORACLE-GATED operators, and
a reshuffled 100 TB corpus must emit bit-identical examples): span and
cut selection is a pure integer function of ``(doc_id, block)`` through
the house portable md5 hash (:func:`~.dedup.portable_token_hash` — the
same primitive the MinHash/DSIR family rides), never an RNG.  Every
document's examples are reproducible from the row alone, so the
operator is partitioning-invariant, retry-safe, and SQL-twinnable.

Span corruption, blockwise (the 100 TB-safe variant of T5's sequential
span sampler): the token stream splits into fixed blocks of
``block_size`` tokens; every block of at least ``min_block`` tokens
contributes EXACTLY ONE masked span of hash-chosen length in
``[1, max_span]`` at a hash-chosen offset.  Spans from distinct blocks
can never overlap — T5's sequential sample-merge loop is inherently
serial per document, while the blockwise rule is a pure per-position
projection — and the corruption density is ``mean_span / block_size``
(defaults: 2.5/16 ≈ 15.6 %, T5's published 15 %).  Sentinels are
``<extra_id_B>`` where B is the block index: qualifying blocks are
consecutive from 0 (only the final short block can fail ``min_block``),
so sentinel numbering matches T5's consecutive convention.

Scale shape: both constructors are pure per-row projections (array ops
and md5 only — no UDF, no shuffle, no join); at 100 TB they run at scan
bandwidth and compose with any upstream curation filter.  The reference
repo (a Selenium market-data scraper, /root/reference/main.py) has no
training-data surface; these exist for the LLM-pipeline mission.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_token_hash
from .text import tokens


def _block_hash(id_col: str, b: Column, salt: str) -> Column:
    """Portable int64 hash of ``doc_id ':' block ':' salt`` — the
    deterministic randomness source (DuckDB twin: PORTABLE_HASH_SQL over
    the same concatenation)."""
    return portable_token_hash(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(":"),
            b.cast("string"),
            F.lit(":" + salt),
        )
    )


def span_corruption_examples(
    documents: DataFrame,
    block_size: int = 16,
    max_span: int = 4,
    min_block: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One T5-style span-corruption example per document:
    ``(doc_id, n_tokens, n_spans, n_masked, input_text, target_text)``.

    ``input_text`` is the token stream with each masked span replaced by
    its ``<extra_id_B>`` sentinel; ``target_text`` is the concatenation
    of ``<extra_id_B> <masked tokens...>`` pieces in block order — the
    exact encoder/decoder pair format of the T5 objective.  Documents
    shorter than ``min_block`` tokens pass through uncorrupted
    (n_spans = 0, input = the full text's token stream, target = '').

    Per block ``b`` covering ``[b·S, b·S + blen)`` with
    ``blen = min(S, n − b·S) ≥ min_block``::

        span_len   = 1 + h(doc, b, 'l') % max_span
        span_start = b·S + h(doc, b, 's') % (blen − span_len + 1)

    integer arithmetic end to end; the only strings built are the
    output texts."""
    if max_span < 1:
        # hash % max_span with a zero modulus is a DIVIDE_BY_ZERO at
        # action time under ANSI; a negative one silently reinterprets
        # as its magnitude (r16 review finding) — refuse eagerly
        raise ValueError(f"max_span must be >= 1, got {max_span}")
    if min_block < max_span:
        # a span must fit inside its qualifying block, or span_start's
        # modulus goes non-positive
        raise ValueError(
            f"min_block ({min_block}) must be >= max_span ({max_span})"
        )
    if block_size < min_block:
        raise ValueError(
            f"block_size ({block_size}) must be >= min_block ({min_block})"
        )
    S = int(block_size)
    staged = documents.select(
        F.col(id_col),
        F.coalesce(tokens(text_col), F.array().cast("array<string>")).alias(
            "_toks"
        ),
    ).select(id_col, "_toks", F.size("_toks").alias("_n"))

    n = F.col("_n")
    n_blocks = ((n + S - 1) / S).cast("int")

    def span_struct(b: Column) -> Column:
        blen = F.least(F.lit(S), n - b * S)
        slen = (_block_hash(id_col, b, "l") % max_span + 1).cast("int")
        # start is guarded behind qual: on a non-qualifying (short final)
        # block the modulus (blen − slen + 1) can reach zero, which is a
        # DIVIDE_BY_ZERO under ANSI mode even though the value is unused
        start = F.when(
            blen >= min_block,
            b * S + _block_hash(id_col, b, "s") % (blen - slen + 1),
        ).otherwise(F.lit(0)).cast("int")
        return F.struct(
            b.cast("int").alias("b"),
            (blen >= min_block).alias("qual"),
            start.alias("start"),
            slen.alias("len"),
        )

    spanned = staged.select(
        id_col,
        "_toks",
        "_n",
        F.when(
            n > 0,
            F.transform(F.sequence(F.lit(0), n_blocks - 1), span_struct),
        )
        .otherwise(F.array().cast(
            "array<struct<b:int,qual:boolean,start:int,len:int>>"
        ))
        .alias("_spans"),
    )

    toks, spans = F.col("_toks"), F.col("_spans")

    def emit_at(i: Column) -> Column:
        s = F.element_at(spans, (i / S).cast("int") + 1)
        sentinel = F.concat(
            F.lit("<extra_id_"), s["b"].cast("string"), F.lit(">")
        )
        return (
            F.when(~s["qual"], F.element_at(toks, i + 1))
            .when(i == s["start"], sentinel)
            .when(
                (i > s["start"]) & (i < s["start"] + s["len"]),
                F.lit(None).cast("string"),
            )
            .otherwise(F.element_at(toks, i + 1))
        )

    input_text = F.array_join(
        F.filter(
            F.when(
                n > 0,
                F.transform(F.sequence(F.lit(0), n - 1), emit_at),
            ).otherwise(F.array().cast("array<string>")),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    qual_spans = F.filter(spans, lambda s: s["qual"])
    target_text = F.array_join(
        F.transform(
            qual_spans,
            lambda s: F.concat(
                F.lit("<extra_id_"),
                s["b"].cast("string"),
                F.lit("> "),
                F.array_join(F.slice(toks, s["start"] + 1, s["len"]), " "),
            ),
        ),
        " ",
    )
    n_masked = F.aggregate(
        qual_spans, F.lit(0), lambda acc, s: acc + s["len"]
    )
    return spanned.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.size(qual_spans).cast("long").alias("n_spans"),
        n_masked.cast("long").alias("n_masked"),
        input_text.alias("input_text"),
        target_text.alias("target_text"),
    )


def fim_examples(
    documents: DataFrame,
    min_tokens: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One FIM (fill-in-the-middle) example per document of at least
    ``min_tokens`` tokens, PSM order (Bavarian et al. 2022 §2):
    ``(doc_id, n_tokens, cut1, cut2, input_text, target_text)`` with::

        cut1 = 1 + h(doc, 'c1') % (n − 1)          ∈ [1, n−1]
        cut2 = cut1 + h(doc, 'c2') % (n − cut1 + 1) ∈ [cut1, n]
        input  = '<fim_prefix> ' + toks[:cut1) + ' <fim_suffix> '
                 + toks[cut2:) + ' <fim_middle>'
        target = toks[cut1:cut2)           (empty when cut1 == cut2)

    Shorter documents emit no row — an infilling example needs a
    non-degenerate prefix position.  Pure projection + filter; the
    selection hashes are block hashes with a fixed block index 0 so the
    SQL twin shares one expression shape with span corruption."""
    if min_tokens < 2:
        # cut1's modulus is (n - 1): a 1-token doc admitted by
        # min_tokens=1 divides by zero at action time (r16 review
        # finding) — the docstring's non-degenerate-prefix requirement,
        # enforced
        raise ValueError(f"min_tokens must be >= 2, got {min_tokens}")
    staged = documents.select(
        F.col(id_col),
        F.coalesce(tokens(text_col), F.array().cast("array<string>")).alias(
            "_toks"
        ),
    ).select(id_col, "_toks", F.size("_toks").alias("_n"))
    n = F.col("_n")
    zero = F.lit(0)
    c1 = (_block_hash(id_col, zero, "c1") % (n - 1) + 1).cast("int")
    c2 = (c1 + _block_hash(id_col, zero, "c2") % (n - c1 + 1)).cast("int")
    toks = F.col("_toks")
    cut = staged.filter(n >= int(min_tokens)).select(
        id_col,
        "_toks",
        "_n",
        c1.alias("cut1"),
        c2.alias("cut2"),
    )
    input_text = F.concat(
        F.lit("<fim_prefix> "),
        F.array_join(F.slice(toks, 1, F.col("cut1")), " "),
        F.lit(" <fim_suffix> "),
        F.array_join(
            F.slice(toks, F.col("cut2") + 1, n - F.col("cut2")), " "
        ),
        F.lit(" <fim_middle>"),
    )
    target_text = F.array_join(
        F.slice(toks, F.col("cut1") + 1, F.col("cut2") - F.col("cut1")), " "
    )
    return cut.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.col("cut1").cast("long").alias("cut1"),
        F.col("cut2").cast("long").alias("cut2"),
        input_text.alias("input_text"),
        target_text.alias("target_text"),
    )
