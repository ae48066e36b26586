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


def round6_sql(x: np.ndarray) -> np.ndarray:
    """Round NON-NEGATIVE floats to 6 dp the way DuckDB's round() does —
    half AWAY from zero (floor(x*1e6 + 0.5)/1e6). np.round is half-even,
    which diverges from the SQL oracles exactly at terminating-decimal
    midpoints (e.g. ratios with power-of-two denominators: 1/128 =
    0.0078125 rounds to 0.007812 half-even but 0.007813 in DuckDB)."""
    return np.floor(np.asarray(x, np.float64) * 1e6 + 0.5) / 1e6


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


# BPE-ish tokenization: a lookahead-free simplification of the GPT-2
# pre-tokenizer pattern (contractions | space+letters | space+digits |
# space+other | whitespace runs), chosen so the SAME regex runs under
# Python re and DuckDB's RE2 (both leftmost-first) — the oracle uses it
# verbatim. Whitespace-run matches are excluded from the count.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
_BPE = re.compile(BPE_PATTERN)


class BpeTokenCounter:
    """Stateful stage: per-doc BPE-ish token count (compiled pattern held
    per worker)."""

    def __init__(self) -> None:
        self.pat = _BPE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts = np.fromiter(
            (
                sum(1 for m in self.pat.findall(t) if m.strip())
                for t in texts
            ),
            np.int64,
            len(texts),
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_bpe_tokens": counts}
        )


def bpe_token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    from parallel_louvain_method_ray.ops.pool import cached_stage

    return docs.map_batches(
        cached_stage(BpeTokenCounter), batch_format="pyarrow", batch_size=256
    )


class DocQuality:
    """Stateful stage: per-doc quality signals + composite score —
    length / punctuation / stopword ratios (the standard web-text quality
    heuristics), deterministic and oracle-checkable:

    - stopword_ratio: fraction of whitespace tokens in the English
      stopword profile;
    - punct_ratio: punctuation chars / total chars (0 for empty docs);
    - mean_token_len: mean whitespace-token length (0 for empty docs);
    - quality: 0.4 * min(n_tokens / 100, 1)       (enough content)
             + 0.3 * (1 - punct_ratio)            (not symbol soup)
             + 0.3 * min(stopword_ratio * 5, 1)   (natural language)
    """

    def __init__(self) -> None:
        self.token = _TOKEN
        self.punct = _PUNCT
        self.stop = _LANG_PROFILES["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        n_tok = np.empty(n, np.int64)
        stop_r = np.empty(n, np.float64)
        punct_r = np.empty(n, np.float64)
        mean_len = np.empty(n, np.float64)
        for j, t in enumerate(texts):
            toks = self.token.findall(t)
            n_tok[j] = len(toks)
            stop_r[j] = (
                sum(1 for x in toks if x.lower() in self.stop) / len(toks)
                if toks
                else 0.0
            )
            punct_r[j] = len(self.punct.findall(t)) / len(t) if t else 0.0
            mean_len[j] = (
                sum(len(x) for x in toks) / len(toks) if toks else 0.0
            )
        quality = (
            0.4 * np.minimum(n_tok / 100.0, 1.0)
            + 0.3 * (1.0 - punct_r)
            + 0.3 * np.minimum(stop_r * 5.0, 1.0)
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n_tok,
                "stopword_ratio": round6_sql(stop_r),
                "punct_ratio": round6_sql(punct_r),
                "mean_token_len": round6_sql(mean_len),
                "quality": round6_sql(quality),
            }
        )


def doc_quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    from parallel_louvain_method_ray.ops.pool import cached_stage

    return docs.map_batches(
        cached_stage(DocQuality), batch_format="pyarrow", batch_size=256
    )
