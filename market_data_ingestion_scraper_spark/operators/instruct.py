"""X37 instruction-style training-example assembly from PAIRED
documents — the supervised sibling of the X34 self-supervised
constructors (corruption.py): where span corruption and FIM mint
(input, target) pairs from ONE document, this family mints them from
TWO related documents, the shape instruction/chat fine-tuning data
takes (prompt document -> response document; public precedent: Reddit
post/comment and forum thread pairs in OpenAI's WebGPT/InstructGPT
data work, StackExchange Q->A pairs in LLaMA/RedPajama, adjacent-page
pairs in long-context curricula).

Pairing rule — adjacent documents of the same source: within each
``(source, doc_id DIV pair_bucket)`` bucket, documents order by
``doc_id`` and consecutive rows pair up non-overlapping (1st with 2nd,
3rd with 4th, ...).  Crawl and thread ingestion assign ids in
ingestion order, so same-source adjacency is the cheap deterministic
proxy for "the document that followed" — and the bucket bound is the
100 TB design choice: every window partition holds at most
``pair_bucket`` consecutive ids of one source, so the sort-in-window
never sees a corpus-sized (or even source-sized) partition, at the
documented cost of losing at most one pair per (source, bucket)
boundary.  No RNG anywhere: which template frames a pair is the house
portable md5 hash of the prompt id (:func:`~.dedup.portable_token_hash`
— the X34 selection discipline), so a reshuffled corpus emits
bit-identical examples and the DuckDB oracle reproduces them
byte-for-byte.

Scale shape: ONE shuffle — the exchange on ``(source, bucket)`` that
feeds the bounded window — then a pure projection (token slice +
concat); example text length is capped by ``max_prompt_tokens`` /
``max_target_tokens`` so downstream packing (X26) sees bounded rows.

Streaming: this is a BATCH/backfill constructor by design — pairing
needs the bucket's rows together, and an unbounded stream cannot
guarantee a document's successor has arrived (a row_number window is
not append-legal without completeness).  Run it inside
``foreachBatch`` over closed (source, bucket) partitions, or as the
periodic backfill the X34 per-row constructors (which ARE stream-legal)
complement online.

:func:`preference_pairs` (X38) extends the same adjacency discipline
to TRIPLES and decides chosen/rejected by the X35 quality-ensemble
vote — the RLHF / DPO preference-example shape (Ouyang et al. 2022
InstructGPT comparisons; Rafailov et al. 2023 DPO).  Same bounded
window, same template hashing, same batch/backfill streaming stance.

The reference repo (a Selenium market-data scraper,
/root/reference/main.py) has no training-data surface; this exists for
the LLM-pipeline mission alongside X34.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_token_hash
from .text import tokens

#: The fixed instruction-template vocabulary (plan literals; selection
#: is ``portable_token_hash('tmpl:' || prompt_doc_id) % len``).  Edit =
#: new dataset version; templates are part of the example contract, so
#: they live here as a named constant, not inline strings.
INSTRUCTION_TEMPLATES: tuple[str, ...] = (
    "Continue the passage that follows the context.",
    "Write the next document from the same source.",
    "Given the context, produce the follow-up text.",
    "Read the context and draft the subsequent entry.",
)

# the DuckDB oracle splices the templates into single-quoted SQL string
# literals; a template carrying a quote (or a backslash) would silently
# corrupt the twin rather than fail — refuse at import, where the edit
# that introduced it is on screen
for _t in INSTRUCTION_TEMPLATES:
    if "'" in _t or "\\" in _t:
        raise ValueError(
            f"INSTRUCTION_TEMPLATES entry {_t!r} contains a quote/backslash "
            "— it cannot be spliced into the SQL oracle literal"
        )
del _t


def _template_choice(id_col: str):
    """(template_id, template) columns — the hash-deterministic choice
    both constructors share: ``portable_token_hash('tmpl:' || id) %
    len(INSTRUCTION_TEMPLATES)``, templates as plan literals."""
    n_tmpl = len(INSTRUCTION_TEMPLATES)
    tmpl_id = F.pmod(
        portable_token_hash(
            F.concat(F.lit("tmpl:"), F.col(id_col).cast("string"))
        ),
        F.lit(n_tmpl),
    ).cast("int")
    template = F.element_at(
        F.array(*[F.lit(t) for t in INSTRUCTION_TEMPLATES]), tmpl_id + 1
    )
    return tmpl_id, template


def _floor_bucket(id_col: str, width: int):
    """Exact int64 FLOOR-division bucket (see instruction_pairs)."""
    return F.expr(f"(`{id_col}` - pmod(`{id_col}`, {width})) div {width}")


def instruction_pairs(
    documents: DataFrame,
    pair_bucket: int = 1024,
    max_prompt_tokens: int = 64,
    max_target_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """One instruction example per adjacent same-source document pair:
    ``(prompt_doc_id, response_doc_id, source, template_id, input_text,
    target_text, n_prompt_tokens, n_target_tokens)``.

    ``input_text`` is ``'<instruction> ' || template || ' <context> '
    || first max_prompt_tokens tokens of the prompt document``;
    ``target_text`` is the first ``max_target_tokens`` tokens of the
    response document; the ``n_*`` columns record the token counts
    actually used (post-cap).  Pairs are non-overlapping — a document
    appears in at most one example per build — and the odd document at
    the end of a ``(source, bucket)`` run stays unpaired (as does the
    last document before each ``pair_bucket`` id boundary: bounded
    windows trade <= 1 pair per bucket for skew-proof partitions).

    Empty or NULL text on either side still pairs (pairing is
    positional, not content-based — dropping empties would silently
    re-pair across a gap and change neighbors); its token slice renders
    as ``''`` and the curation funnel filters on the ``n_*`` columns.
    Rows with a NULL id are DROPPED before pairing: ids carry the
    ordering, the pair identity, and the template hash, so a NULL-id
    row has no deterministic position (and Spark and other engines
    disagree on where NULLs sort, which would silently desync twins).

    Deterministic: ordering is by ``doc_id`` within the bucket, template
    choice hashes the prompt id — no RNG, partitioning-invariant,
    SQL-twinnable."""
    if int(pair_bucket) < 2:
        raise ValueError(f"pair_bucket must be >= 2, got {pair_bucket}")
    if int(max_prompt_tokens) < 1 or int(max_target_tokens) < 1:
        raise ValueError(
            "max_prompt_tokens and max_target_tokens must be >= 1, got "
            f"{max_prompt_tokens}/{max_target_tokens}"
        )
    tmpl_id, template = _template_choice(id_col)
    # exact int64 FLOOR division: (id - pmod(id, b)) is the floor
    # multiple even for negative ids (pmod >= 0), and `div` on the
    # exact multiple never rounds.  A double division + cast would
    # truncate toward zero for negative ids and lose precision past
    # 2^53 — both silently desyncing the DuckDB `//` (floor) twin
    # (r17 review finding)
    bucket = _floor_bucket(id_col, int(pair_bucket))
    w = Window.partitionBy(source_col, "_bucket").orderBy(id_col)
    staged = (
        documents.where(F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(source_col),
            tokens(text_col).alias("_ts"),
            bucket.alias("_bucket"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_next_id", F.lead(id_col).over(w))
        .withColumn("_next_ts", F.lead("_ts").over(w))
    )
    paired = staged.filter(
        (F.pmod(F.col("_rn"), F.lit(2)) == 1) & F.col("_next_id").isNotNull()
    )
    p_slice = F.slice(
        F.coalesce(F.col("_ts"), F.array().cast("array<string>")),
        1,
        int(max_prompt_tokens),
    )
    t_slice = F.slice(
        F.coalesce(F.col("_next_ts"), F.array().cast("array<string>")),
        1,
        int(max_target_tokens),
    )
    return paired.select(
        F.col(id_col).alias("prompt_doc_id"),
        F.col("_next_id").alias("response_doc_id"),
        F.col(source_col),
        tmpl_id.alias("template_id"),
        F.concat(
            F.lit("<instruction> "),
            template,
            F.lit(" <context> "),
            F.concat_ws(" ", p_slice),
        ).alias("input_text"),
        F.concat_ws(" ", t_slice).alias("target_text"),
        F.size(p_slice).cast("long").alias("n_prompt_tokens"),
        F.size(t_slice).cast("long").alias("n_target_tokens"),
    )


def preference_pairs(
    documents: DataFrame,
    quality: DataFrame | None = None,
    pair_bucket: int = 1024,
    max_prompt_tokens: int = 64,
    max_response_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """X38 preference-example assembly (the RLHF / DPO training shape:
    prompt + chosen response + rejected response; Ouyang et al. 2022,
    Rafailov et al. 2023): within each ``(source, doc_id DIV
    pair_bucket)`` bucket, consecutive same-source document TRIPLES
    (prompt, candidate A, candidate B — the X37 adjacency discipline
    extended by one) become one example, with chosen/rejected decided
    by the X35 quality-ensemble vote count.

    ``quality`` is the (doc_id, votes) relation and MUST cover every
    candidate document — pass :func:`~.ensemble.quality_ensemble`'s
    FULL output (or a persisted copy of it), never a keep/drop-filtered
    SELECTION: the candidates join ``quality`` INNER on both ids, so a
    triple whose candidate is missing from the relation vanishes
    silently and is indistinguishable from a documented tie-drop (r17
    verdict nit).  A filtered selection is also semantically wrong
    here, not just lossy — a dropped candidate still carries a definite
    vote count, and that count is exactly the quality contrast a
    preference pair exists to teach (low-vote documents make the BEST
    rejected sides).  Coverage of the pairing corpus is the contract;
    the inner join is then a pure lookup, and the observable
    triples-minus-rows count measures ONLY tie-drops
    (``test_instruct.test_preference_pairs_non_covering_quality_drops``
    pins what a non-covering relation does instead).  When ``quality``
    is omitted it is derived here (``documents`` then needs the
    ensemble's ``lang`` column) and Catalyst inlines the ensemble
    subtree once PER JOIN SIDE — convenient at fixture scale, but
    production passes a persisted ``quality=`` so the corpus is scored
    once (the plan pin covers that call).  POLICY: triples whose candidates TIE on votes
    emit nothing — a preference pair with no quality contrast teaches
    the reward/DPO objective nothing and injects label noise; the
    dropped count is observable as triples-minus-rows.  Ordering inside
    a tie never matters, so the output is deterministic without a
    tie-break rule.

    Returns ``(prompt_doc_id, chosen_doc_id, rejected_doc_id, source,
    template_id, input_text, chosen_text, rejected_text, chosen_votes,
    rejected_votes)`` — ``input_text`` is the X37 rendering
    ('<instruction> template <context> prompt tokens'), response texts
    cap at ``max_response_tokens``.  NULL-id rows are dropped before
    grouping (the X37 policy); NULL-text candidates still occupy their
    position (the ensemble scores them a definite 0 votes).

    Scale shape: ONE bounded-window exchange (the X37 shape: every
    partition <= pair_bucket consecutive same-source ids) plus two
    id-keyed equi-joins against the |corpus|-row votes relation — no
    cartesian, no broadcast of anything corpus-sized (AQE picks the
    join strategy).  Deterministic and partitioning-invariant: triple
    formation orders by id, selection is a pure function of the two
    vote counts."""
    if int(pair_bucket) < 3:
        raise ValueError(
            f"pair_bucket must be >= 3 for triples, got {pair_bucket}"
        )
    if int(max_prompt_tokens) < 1 or int(max_response_tokens) < 1:
        raise ValueError(
            "max_prompt_tokens and max_response_tokens must be >= 1, got "
            f"{max_prompt_tokens}/{max_response_tokens}"
        )
    if quality is None:
        from .dedup import _persist_generation
        from .ensemble import quality_ensemble

        # the votes relation joins in TWICE (candidate A and candidate
        # B sides); un-persisted, Catalyst inlines the whole ensemble
        # voter subtree into each join side and the corpus is scored
        # twice (r18: measured ~2x the ensemble cost).  One cached
        # generation per operator — the house pattern.
        quality = _persist_generation(
            "preference_pairs.quality", quality_ensemble(documents)
        )
    votes = quality.select(
        F.col(id_col).alias("_q_id"), F.col("votes").alias("_votes")
    )
    tmpl_id, template = _template_choice(id_col)
    bucket = _floor_bucket(id_col, int(pair_bucket))
    w = Window.partitionBy(source_col, "_bucket").orderBy(id_col)
    staged = (
        documents.where(F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(source_col),
            tokens(text_col).alias("_ts"),
            bucket.alias("_bucket"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_a_id", F.lead(id_col, 1).over(w))
        .withColumn("_a_ts", F.lead("_ts", 1).over(w))
        .withColumn("_b_id", F.lead(id_col, 2).over(w))
        .withColumn("_b_ts", F.lead("_ts", 2).over(w))
    )
    triples = staged.filter(
        (F.pmod(F.col("_rn"), F.lit(3)) == 1) & F.col("_b_id").isNotNull()
    )
    scored = (
        triples.join(
            votes.withColumnsRenamed(
                {"_q_id": "_a_qid", "_votes": "_a_votes"}
            ),
            F.col("_a_id") == F.col("_a_qid"),
        )
        .join(
            votes.withColumnsRenamed(
                {"_q_id": "_b_qid", "_votes": "_b_votes"}
            ),
            F.col("_b_id") == F.col("_b_qid"),
        )
        .filter(F.col("_a_votes") != F.col("_b_votes"))
    )
    a_wins = F.col("_a_votes") > F.col("_b_votes")
    empty = F.array().cast("array<string>")
    p_slice = F.slice(
        F.coalesce(F.col("_ts"), empty), 1, int(max_prompt_tokens)
    )
    chosen_ts = F.when(a_wins, F.col("_a_ts")).otherwise(F.col("_b_ts"))
    rejected_ts = F.when(a_wins, F.col("_b_ts")).otherwise(F.col("_a_ts"))
    c_slice = F.slice(
        F.coalesce(chosen_ts, empty), 1, int(max_response_tokens)
    )
    r_slice = F.slice(
        F.coalesce(rejected_ts, empty), 1, int(max_response_tokens)
    )
    return scored.select(
        F.col(id_col).alias("prompt_doc_id"),
        F.when(a_wins, F.col("_a_id")).otherwise(F.col("_b_id"))
        .alias("chosen_doc_id"),
        F.when(a_wins, F.col("_b_id")).otherwise(F.col("_a_id"))
        .alias("rejected_doc_id"),
        F.col(source_col),
        tmpl_id.alias("template_id"),
        F.concat(
            F.lit("<instruction> "),
            template,
            F.lit(" <context> "),
            F.concat_ws(" ", p_slice),
        ).alias("input_text"),
        F.concat_ws(" ", c_slice).alias("chosen_text"),
        F.concat_ws(" ", r_slice).alias("rejected_text"),
        F.greatest("_a_votes", "_b_votes").cast("long").alias("chosen_votes"),
        F.least("_a_votes", "_b_votes").cast("long").alias("rejected_votes"),
    )


def best_of_n_examples(
    documents: DataFrame,
    quality: DataFrame | None = None,
    n: int = 4,
    pair_bucket: int = 1024,
    max_prompt_tokens: int = 64,
    max_response_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """X39 rejection-sampling / best-of-n example assembly (the SFT
    half of the RLHF data loop: sample ``n`` candidate responses per
    prompt, keep the highest-scoring one; Stiennon et al. 2020
    best-of-n policy, Touvron et al. 2023 Llama-2 rejection sampling):
    within each ``(source, doc_id DIV pair_bucket)`` bucket, documents
    order by id and chop into consecutive runs of ``1 + n`` — position
    0 is the prompt, positions 1..n its candidate pool — and each
    complete run emits ONE example whose response is the candidate
    with the MOST X35 quality-ensemble votes.

    Selection is the argmax, ties broken by LOWEST candidate id —
    deterministic without an RNG, and unlike :func:`preference_pairs`
    a vote tie is NOT dropped: best-of-n emits no rejected side, so a
    tied pool injects no preference noise — it just degenerates to a
    deterministic pick, observable as ``chosen_votes == worst_votes``
    (the recorded spread is the rejection-sampling quality signal).

    ``quality`` is the (doc_id, votes) relation under the SAME
    full-coverage contract as :func:`preference_pairs`: pass
    :func:`~.ensemble.quality_ensemble`'s FULL output, never a
    keep-filtered selection — a candidate missing from the relation
    removes its whole group (the inner-join vanish, pinned by
    ``test_instruct.test_best_of_n_non_covering_quality_drops``).
    When omitted it is derived here; this constructor joins the votes
    relation on ONE side only, so Catalyst inlines the ensemble
    subtree ONCE (cheaper than X38's two-sided inline at fixture
    scale; production still passes a persisted ``quality=``).

    Returns ``(prompt_doc_id, chosen_doc_id, source, template_id,
    input_text, chosen_text, chosen_votes, worst_votes)`` — the X37
    rendering discipline ('<instruction> template <context> prompt
    tokens', template hash-chosen from the prompt id), response capped
    at ``max_response_tokens``.  NULL-id rows drop before grouping
    (the X37 policy); NULL-text candidates occupy their position and
    score whatever the ensemble gave them.  Incomplete tail runs (a
    bucket's last group with fewer than ``1 + n`` rows) emit nothing —
    a partial pool is not a best-of-n draw.

    Scale shape — ONE bounded-window exchange (every partition <=
    pair_bucket consecutive same-source ids), ONE id-keyed equi-join
    against the |corpus|-row votes relation (AQE picks the strategy),
    then ONE partially-aggregable groupBy of <= n+1 rows per group
    (count / struct-max / min all map-side combine) — strictly fewer
    exchanges than X38's two vote joins.  Deterministic and
    partitioning-invariant: runs order by id, the argmax is a pure
    function of (votes, id)."""
    if int(n) < 2:
        raise ValueError(f"n must be >= 2 for a candidate pool, got {n}")
    if int(pair_bucket) < int(n) + 1:
        raise ValueError(
            f"pair_bucket must be >= n + 1 = {int(n) + 1}, got {pair_bucket}"
        )
    if int(max_prompt_tokens) < 1 or int(max_response_tokens) < 1:
        raise ValueError(
            "max_prompt_tokens and max_response_tokens must be >= 1, got "
            f"{max_prompt_tokens}/{max_response_tokens}"
        )
    if quality is None:
        from .ensemble import quality_ensemble

        quality = quality_ensemble(documents)
    votes = quality.select(
        F.col(id_col).alias("_q_id"), F.col("votes").alias("_votes")
    )
    run = int(n) + 1
    bucket = _floor_bucket(id_col, int(pair_bucket))
    w = Window.partitionBy(source_col, "_bucket").orderBy(id_col)
    staged = (
        documents.where(F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(source_col),
            tokens(text_col).alias("_ts"),
            bucket.alias("_bucket"),
        )
        .withColumn("_rn0", F.row_number().over(w) - F.lit(1))
        # _rn0 >= 0 by construction, so plain div/pmod need no floor fix
        .withColumn("_grp", F.expr(f"_rn0 div {run}"))
        .withColumn("_role", F.pmod(F.col("_rn0"), F.lit(run)))
    )
    scored = staged.join(
        votes, staged[id_col] == votes["_q_id"], "left"
    ).filter((F.col("_role") == 0) | F.col("_votes").isNotNull())
    is_prompt = F.col("_role") == 0
    # struct-max argmaxes: (votes, -id) ranks candidates by votes then
    # by LOWEST id (ids are unique, so the payload fields after the
    # first two never decide); max over a when() ignores the NULLs the
    # other role contributes
    grouped = scored.groupBy(source_col, "_bucket", "_grp").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.max(
            F.when(is_prompt, F.struct(F.col(id_col), F.col("_ts")))
        ).alias("_prompt"),
        F.max(
            F.when(
                ~is_prompt,
                F.struct(
                    F.col("_votes"),
                    (-F.col(id_col)).alias("_neg_id"),
                    F.col(id_col),
                    F.col("_ts"),
                ),
            )
        ).alias("_best"),
        F.min(F.when(~is_prompt, F.col("_votes"))).alias("_worst"),
    )
    complete = grouped.filter(F.col("_cnt") == run).select(
        F.col("_prompt")[id_col].alias("_p_id"),
        F.col("_prompt")["_ts"].alias("_p_ts"),
        F.col(source_col),
        F.col("_best")[id_col].alias("_c_id"),
        F.col("_best")["_ts"].alias("_c_ts"),
        F.col("_best")["_votes"].alias("_c_votes"),
        F.col("_worst"),
    )
    tmpl_id, template = _template_choice("_p_id")
    empty = F.array().cast("array<string>")
    p_slice = F.slice(
        F.coalesce(F.col("_p_ts"), empty), 1, int(max_prompt_tokens)
    )
    c_slice = F.slice(
        F.coalesce(F.col("_c_ts"), empty), 1, int(max_response_tokens)
    )
    return complete.select(
        F.col("_p_id").alias("prompt_doc_id"),
        F.col("_c_id").alias("chosen_doc_id"),
        F.col(source_col),
        tmpl_id.alias("template_id"),
        F.concat(
            F.lit("<instruction> "),
            template,
            F.lit(" <context> "),
            F.concat_ws(" ", p_slice),
        ).alias("input_text"),
        F.concat_ws(" ", c_slice).alias("chosen_text"),
        F.col("_c_votes").cast("long").alias("chosen_votes"),
        F.col("_worst").cast("long").alias("worst_votes"),
    )
