"""X34 span-corruption / FIM constructors vs independent pure-Python
twins, plus the reconstruction invariants that make the examples
trustworthy as training data: de-corrupting input with target must give
back the original token stream exactly."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators.corruption import (
    fim_examples,
    span_corruption_examples,
)

SF = "/root/testdata/sf0.001"
HASH_P = 2_147_483_647


def _h(doc_id, b, salt):
    s = f"{doc_id}:{b}:{salt}"
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % HASH_P


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _py_span(doc_id, text, S=16, max_span=4, min_block=4):
    ts = _toks(text)
    n = len(ts)
    spans = []
    for b in range((n + S - 1) // S):
        blen = min(S, n - b * S)
        if blen < min_block:
            continue
        slen = 1 + _h(doc_id, b, "l") % max_span
        start = b * S + _h(doc_id, b, "s") % (blen - slen + 1)
        spans.append((b, start, slen))
    by_block = {b: (s, ln) for b, s, ln in spans}
    inp = []
    for i, t in enumerate(ts):
        blk = i // S
        if blk in by_block:
            s, ln = by_block[blk]
            if i == s:
                inp.append(f"<extra_id_{blk}>")
                continue
            if s < i < s + ln:
                continue
        inp.append(t)
    tgt = [f"<extra_id_{b}> " + " ".join(ts[s:s + ln]) for b, s, ln in spans]
    return (
        n,
        len(spans),
        sum(ln for _, _, ln in spans),
        " ".join(inp),
        " ".join(tgt),
    )


def _py_fim(doc_id, text):
    ts = _toks(text)
    n = len(ts)
    if n < 3:
        return None
    c1 = 1 + _h(doc_id, 0, "c1") % (n - 1)
    c2 = c1 + _h(doc_id, 0, "c2") % (n - c1 + 1)
    inp = (
        f"<fim_prefix> {' '.join(ts[:c1])} <fim_suffix> "
        f"{' '.join(ts[c2:])} <fim_middle>"
    )
    return (n, c1, c2, inp, " ".join(ts[c1:c2]))


def test_span_corruption_matches_python_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_spans"], r["n_masked"],
            r["input_text"], r["target_text"],
        )
        for r in span_corruption_examples(docs).collect()
    }
    assert set(got) == set(rows)
    for doc_id, text in rows.items():
        assert got[doc_id] == _py_span(doc_id, text), doc_id


def test_span_corruption_reconstruction_invariant(spark):
    """De-corruption round-trip: substituting each sentinel in input_text
    with its target span reproduces the original token stream — no token
    is lost or duplicated by the constructor."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = span_corruption_examples(docs).collect()
    texts = {
        r["doc_id"]: _toks(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    assert len(out) == len(texts)
    for r in out:
        spans = {}
        cur = None
        for piece in r["target_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", piece)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(piece)
        rebuilt = []
        for tok in r["input_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            rebuilt.extend(spans[int(m.group(1))] if m else [tok])
        assert rebuilt == texts[r["doc_id"]], r["doc_id"]
        assert r["n_masked"] == sum(len(v) for v in spans.values())
        assert r["n_spans"] == len(spans)


def test_span_corruption_density_and_edges(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    agg = span_corruption_examples(docs).agg(
        F.sum("n_masked").alias("m"), F.sum("n_tokens").alias("n")
    ).collect()[0]
    # blockwise design density = mean_span/block = 2.5/16 ~ 15.6%
    assert 0.10 <= agg["m"] / agg["n"] <= 0.22
    edge = spark.createDataFrame(
        [(1, ""), (2, "one two three"), (3, None),
         (4, "a b c d e"), (5, "!!! ???")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_corruption_examples(edge).collect()}
    assert len(got) == 5
    for d in (1, 2, 3, 5):  # < min_block tokens: uncorrupted pass-through
        assert got[d]["n_spans"] == 0 and got[d]["target_text"] == ""
    assert got[2]["input_text"] == "one two three"
    assert got[1]["input_text"] == "" and got[1]["n_tokens"] == 0
    assert got[4]["n_spans"] == 1  # 5 tokens >= min_block: one span


def test_span_corruption_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, span_corruption_examples(docs).collect()))
    b = sorted(map(tuple, span_corruption_examples(docs.repartition(7)).collect()))
    assert a == b


def test_span_corruption_validation(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_block"):
        span_corruption_examples(docs, min_block=3, max_span=4)
    with pytest.raises(ValueError, match="block_size"):
        span_corruption_examples(docs, block_size=2, min_block=4, max_span=2)
    # r16 review: max_span 0 would hash % 0 at action time (ANSI
    # divide-by-zero), negative reinterprets as its magnitude — refuse
    for bad in (0, -4):
        with pytest.raises(ValueError, match="max_span"):
            span_corruption_examples(docs, max_span=bad)
    # r16 review: min_tokens=1 admits 1-token docs into cut1's
    # (n - 1) modulus — divide by zero at action time
    one_tok = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_tokens"):
        fim_examples(one_tok, min_tokens=1)


def test_fim_matches_python_twin_and_reconstructs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["cut1"], r["cut2"],
            r["input_text"], r["target_text"],
        )
        for r in fim_examples(docs).collect()
    }
    want = {d: _py_fim(d, t) for d, t in rows.items()}
    want = {d: w for d, w in want.items() if w is not None}
    assert got == want
    # PSM reconstruction: prefix + middle + suffix == original tokens
    for d, (n, c1, c2, inp, tgt) in got.items():
        m = re.fullmatch(
            r"<fim_prefix> (.*) <fim_suffix> (.*) <fim_middle>", inp, re.S
        )
        assert m, d
        rebuilt = m.group(1).split() + tgt.split() + m.group(2).split()
        assert rebuilt == _toks(rows[d]), d
        assert 1 <= c1 <= c2 <= n


def test_fim_short_docs_emit_no_row(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = fim_examples(docs).collect()
    assert [r["doc_id"] for r in got] == [2]


def test_constructors_are_stream_legal(spark, tmp_path):
    """Both constructors are pure per-row projections, so they apply to
    a streaming frame UNCHANGED (append mode, no state, no watermark):
    stream ≡ batch through the memory sink.  The streaming side goes
    through the r17 `stream_` convenience wrappers so the documented
    serve path is the one under test (the wrappers delegate; direct
    application is pinned equal by construction)."""
    from market_data_ingestion_scraper_spark.streaming.pipeline import (
        run_to_memory,
        stream_fim_examples,
        stream_span_corruption,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "cdocs")
    docs.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    want_span = {tuple(r) for r in span_corruption_examples(docs).collect()}
    got_span = run_to_memory(
        stream_span_corruption(stream), "t_span_corrupt", spark,
        mode="append",
    )
    assert {tuple(r) for r in got_span.collect()} == want_span
    want_fim = {tuple(r) for r in fim_examples(docs).collect()}
    got_fim = run_to_memory(
        stream_fim_examples(stream), "t_fim", spark, mode="append",
    )
    assert {tuple(r) for r in got_fim.collect()} == want_fim
