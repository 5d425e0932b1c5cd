"""Corpus-scaling helpers for scale-curve evidence (SCALE.md): build a
K× corpus whose size AND content diversity both grow K×, the way a real
corpus grows.

A plain self-union (same text, offset ids) would plant K-way exact-dup
groups — C(K,2) near-dup pairs per document, i.e. QUADRATIC candidate
growth by construction — which measures the fixture, not the operator.
:func:`replicate_corpus` instead tags every token with the replica index,
so replicas share no shingles: candidate/verified pair counts must grow
~K× if the operator's banding/indexing is sound, and super-linear growth
in a probe run is a real scale smell, not an artifact.

Because the token remap is a bijection per replica, shingle-set SIZES and
overlap STRUCTURE are preserved exactly: the exact set-similarity join
finds precisely K× the base pairs (a test guard pins this), while
hash-based families (MinHash bands, SimHash chunks) get fresh hash draws
per replica and must stay ~linear within collision noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ID_STRIDE = 100_000_000


def replicate_corpus(
    documents: DataFrame,
    factor: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """K content-distinct copies: ids offset by ``ID_STRIDE`` per replica;
    every token of replica r>0 is prefixed ``z{r}z`` (alnum, survives the
    lowercase tokenizer as one token).  Replica 0 is the original corpus
    byte-for-byte, so 1× results nest inside K× results."""
    parts = []
    for r in range(factor):
        c = documents.withColumn(id_col, F.col(id_col) + F.lit(r * ID_STRIDE))
        if r > 0:
            c = c.withColumn(
                text_col,
                F.regexp_replace(F.col(text_col), "([A-Za-z0-9]+)", f"z{r}z$1"),
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_embeddings(
    embeddings: DataFrame, factor: int, id_col: str = "vec_id"
) -> DataFrame:
    """K copies of the embedding corpus with offset ids (vectors repeat —
    identical vectors share buckets/cells, which only makes bucket sizes
    grow K×, the load pattern a K× corpus produces anyway)."""
    parts = [
        embeddings.withColumn(id_col, F.col(id_col) + F.lit(r * ID_STRIDE))
        for r in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
