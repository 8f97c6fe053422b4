"""Text analysis over a documents table — vectorized `map_batches`
stages with exact DuckDB-SQL-equivalent semantics (the driver's oracle
cross-checks them; every regex below is RE2/PCRE-compatible and
documented next to its SQL twin in __ray_entry__.py oracle_sql()).

All kernels use pyarrow.compute (zero-copy Arrow) — no Python loop over
rows.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["token_stats", "quality_stats", "lang_id", "fingerprint", "top_tokens"]

TOKEN_RE = r"\S+"
ALPHA_RE = r"[A-Za-z]"
DIGIT_RE = r"[0-9]"
PUNCT_RE = r"[.,;:!?]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "und", "das", "zu", "ein", "ist", "nicht", "mit"],
    "fr": ["le", "et", "de", "un", "est", "pas", "que", "pour"],
}


def _stop_re(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


def token_stats(batch: pa.Table, text_col: str = "text", key: str = "doc_id") -> pa.Table:
    """(key, n_chars, n_tokens) — whitespace tokenization."""
    t = batch.column(text_col)
    return pa.table(
        {
            key: batch.column(key),
            "n_chars": pc.utf8_length(t).cast(pa.int64()),
            "n_tokens": pc.count_substring_regex(t, TOKEN_RE).cast(pa.int64()),
        }
    )


def quality_stats(batch: pa.Table, text_col: str = "text", key: str = "doc_id") -> pa.Table:
    """Quality-scoring signals: char/token counts, alpha/digit/punct
    counts and the alpha ratio — the length/punct/stopword family used
    by web-corpus quality filters."""
    t = batch.column(text_col)
    n_chars = pc.utf8_length(t).cast(pa.int64())
    n_alpha = pc.count_substring_regex(t, ALPHA_RE).cast(pa.int64())
    n_digit = pc.count_substring_regex(t, DIGIT_RE).cast(pa.int64())
    n_punct = pc.count_substring_regex(t, PUNCT_RE).cast(pa.int64())
    n_tokens = pc.count_substring_regex(t, TOKEN_RE).cast(pa.int64())
    alpha_ratio = pc.round(
        pc.divide(n_alpha.cast(pa.float64()), pc.max_element_wise(n_chars, 1).cast(pa.float64())),
        ndigits=8,
    )
    return pa.table(
        {
            key: batch.column(key),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_alpha": n_alpha,
            "n_digit": n_digit,
            "n_punct": n_punct,
            "alpha_ratio": alpha_ratio,
        }
    )


def lang_id(batch: pa.Table, text_col: str = "text", key: str = "doc_id") -> pa.Table:
    """Stopword-hit language id (en/de/fr), ties resolved en > de > fr.

    The n-gram-free heuristic keeps the SQL oracle exact; a real
    fastText-style model would slot into the same actor-pool stage.
    """
    low = pc.utf8_lower(batch.column(text_col))
    hits = {g: pc.count_substring_regex(low, _stop_re(g)).cast(pa.int64()) for g in ("en", "de", "fr")}
    en, de, fr = hits["en"], hits["de"], hits["fr"]
    is_en = pc.and_(pc.greater_equal(en, de), pc.greater_equal(en, fr))
    is_de = pc.greater_equal(de, fr)
    lang = pc.if_else(is_en, "en", pc.if_else(is_de, "de", "fr"))
    return pa.table(
        {key: batch.column(key), "pred_lang": lang, "en_hits": en, "de_hits": de, "fr_hits": fr}
    )


def fingerprint(batch: pa.Table, text_col: str = "text", key: str = "doc_id") -> pa.Table:
    """Content fingerprint = md5 hex of the exact text bytes (DuckDB
    md5() twin).  Per-row hashing is inherently scalar; hashlib releases
    the GIL and the stage runs in task parallelism."""
    texts = batch.column(text_col).to_pylist()
    h = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
    return pa.table({key: batch.column(key), "fp": pa.array(h, pa.string())})


def top_tokens(docs_ds, k: int = 100, text_col: str = "text"):
    """EXACT top-k most frequent whitespace tokens across the corpus —
    the vocabulary-builder primitive of a tokenizer-training pipeline.
    Returns a Dataset (token, n) sorted by (n desc, token asc), k rows.

    Scale shape: per-batch partial counts (one Arrow ``value_counts``
    per block — the shuffle moves (token, partial_n) rows, ~distinct
    tokens per block, not one row per token OCCURRENCE), a distributed
    ``groupby(token).sum``, then a distributed sort; only the k-row
    head ever lands anywhere small.  Ties break on token asc so the
    result is deterministic and SQL-reproducible."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        # ascii_split_whitespace == RE2 \s+ split (same ASCII whitespace
        # set as the DuckDB oracle's string_split_regex('\s+'); RE2 \s
        # is ASCII-only) and measures ~5x faster than the regex kernel
        toks = pc.ascii_split_whitespace(b.column(text_col))
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = (docs_ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
           .groupby("token").aggregate(Sum("n", alias_name="n")))
    # sort is distributed; limit(k) takes only the head blocks
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)
