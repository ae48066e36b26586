"""Text analysis over the `documents` table (training-data extensions).

All transforms are per-batch map_batches with compiled regexes held in
actor state where it matters; outputs are SQL-parity-checked against DuckDB
where expressible (token counts, punctuation, fingerprints, top-k tokens).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data

_WS = re.compile(r"\s+")
_TOKEN = re.compile(r"\S+")
_PUNCT = re.compile(r"[.,;:!?]")


def _normalize(t: str) -> str:
    """lower + collapse whitespace + trim — the canonical dedup key
    (SQL: trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))."""
    return _WS.sub(" ", t.lower()).strip()


class TextStats:
    """Stateful stage: per-doc n_chars / n_tokens / n_punct."""

    def __init__(self) -> None:
        self.token = _TOKEN
        self.punct = _PUNCT

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tokens = np.fromiter(
            (len(self.token.findall(t)) for t in texts), np.int64, len(texts)
        )
        n_punct = np.fromiter(
            (len(self.punct.findall(t)) for t in texts), np.int64, len(texts)
        )
        n_chars = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_punct": n_punct,
            }
        )


def text_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    from parallel_louvain_method_ray.ops.pool import cached_stage

    return docs.map_batches(
        cached_stage(TextStats), batch_format="pyarrow", batch_size=256
    )


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, fp) — md5 of the normalized text (document fingerprint;
    the exact-dedup key)."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = [hashlib.md5(_normalize(t).encode("utf-8")).hexdigest() for t in texts]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, pa.string())}
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def top_tokens(docs: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """Global token frequency top-k: per-batch pre-aggregation (combiner)
    -> small groupby -> deterministic (count desc, token asc) order."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for tok in _TOKEN.findall(t):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
        .map_batches(
            lambda b: b.rename_columns(["token", "n"]), batch_format="pyarrow"
        )
    )
    # deterministic top-k: count desc, then token asc — distributed
    # sort + limit (the driver holds only k rows, never the full vocab)
    top = agg.sort(["n", "token"], descending=[True, False]).limit(k)
    t = pa.concat_tables(
        [pa.table(b) for b in top.iter_batches(batch_format="pyarrow")]
    )
    if t.num_rows == 0:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    return t.select(["token", "n"])


# language ID: tiny stopword-profile heuristic (deterministic, dependency-free)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}


class LangId:
    """Stateful language-ID stage: stopword-hit scoring per language with a
    deterministic tie-break (highest score, then language code asc; 'und'
    when no stopword hits at all)."""

    def __init__(self) -> None:
        self.profiles = sorted(_LANG_PROFILES.items())
        self.token = _TOKEN

    def classify(self, text: str) -> str:
        toks = [t.lower() for t in self.token.findall(text)]
        if not toks:
            return "und"
        best_lang, best_score = "und", 0
        for lang, words in self.profiles:
            score = sum(1 for t in toks if t in words)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, pa.string()),
            }
        )


def lang_id(docs: ray.data.Dataset) -> ray.data.Dataset:
    from parallel_louvain_method_ray.ops.pool import cached_stage

    return docs.map_batches(
        cached_stage(LangId), batch_format="pyarrow", batch_size=256
    )
