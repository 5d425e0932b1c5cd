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
