"""Deduplication operators over a documents Dataset.

- ``exact_dedup``: content-hash partition + keep-min-key — one groupby
  shuffle over (hash, key) pairs only (never the text).
- ``minhash_lsh_pairs``: shingle → MinHash (md5-string mins, so the SQL
  oracle can reproduce them exactly) → banded LSH buckets → candidate
  pairs → exact Jaccard verify.  The groupby runs over small
  (band, band_hash, doc_id) rows; texts are re-joined only for the
  candidate set.
- ``simhash64``: 64-bit SimHash per doc + near-dup pairs via 4-block
  Hamming blocking.

Scale notes: every stage pre-shrinks before its shuffle (hashes, not
documents); candidate verification joins text back by key assuming the
candidate set << corpus (web-dedup reality); hot LSH buckets are capped
(``max_bucket``) — the documented skew guard.
"""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pyarrow as pa

__all__ = ["content_hash", "exact_dedup", "minhash_signature", "minhash_lsh_pairs", "simhash64", "simhash_pairs"]

_WS = re.compile(r"\S+")


def content_hash(batch: pa.Table, text_col: str = "text", key: str = "doc_id") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    h = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
    return pa.table({key: batch.column(key), "h": pa.array(h, pa.string())})


def exact_dedup(docs_ds, text_col: str = "text", key: str = "doc_id"):
    """Survivors of exact dedup: min key per content hash.  Returns a
    Dataset with (key, h)."""
    import pandas as pd

    hashed = docs_ds.map_batches(
        lambda b: content_hash(b, text_col, key), batch_format="pyarrow", batch_size=None
    )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, key)

    return hashed.groupby("h").map_groups(keep_min, batch_format="pandas")


# ------------------------------------------------------------------ MinHash


def _shingles(text: str, k: int = 3) -> list[str]:
    toks = _WS.findall(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i: i + k]) for i in range(len(toks) - k + 1)]


def _minhash(shingles: list[str], num_hashes: int) -> list[str]:
    """min over shingles of md5(f"{i}|{s}") hex strings — string mins so
    DuckDB's md5() reproduces signatures bit-for-bit."""
    if not shingles:
        return ["" for _ in range(num_hashes)]
    sig = []
    for i in range(num_hashes):
        prefix = f"{i}|"
        sig.append(min(hashlib.md5((prefix + s).encode("utf-8")).hexdigest() for s in shingles))
    return sig


def minhash_signature(batch: pa.Table, text_col: str = "text", key: str = "doc_id",
                      k: int = 3, num_hashes: int = 12, bands: int = 4) -> pa.Table:
    """Emit (key, band, band_hash) rows — `bands` rows per doc."""
    rows_per = num_hashes // bands
    keys, band_ids, band_hashes = [], [], []
    for kid, text in zip(batch.column(key).to_pylist(), batch.column(text_col).to_pylist()):
        sig = _minhash(_shingles(text, k), num_hashes)
        for b in range(bands):
            chunk = sig[b * rows_per: (b + 1) * rows_per]
            keys.append(kid)
            band_ids.append(b)
            band_hashes.append(hashlib.md5("|".join(chunk).encode()).hexdigest())
    return pa.table(
        {
            key: pa.array(keys),
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
        }
    )


def minhash_lsh_pairs(docs_ds, text_col: str = "text", key: str = "doc_id",
                      k: int = 3, num_hashes: int = 12, bands: int = 4,
                      threshold: float = 0.7, max_bucket: int = 64):
    """Near-duplicate pairs (a < b, jaccard >= threshold).

    Returns a pyarrow Table (a, b, jaccard) — the candidate set is
    assumed small relative to the corpus; buckets larger than
    ``max_bucket`` are truncated to their smallest keys (skew guard,
    logged in the `truncated` count)."""
    import pandas as pd

    sig = docs_ds.map_batches(
        lambda b: minhash_signature(b, text_col, key, k, num_hashes, bands),
        batch_format="pyarrow", batch_size=None,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[key].tolist())[:max_bucket]
        out = [(a, b) for a, b in itertools.combinations(ids, 2)]
        if not out:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
        return pd.DataFrame(out, columns=["a", "b"])

    cand = sig.groupby(["band", "band_hash"]).map_groups(bucket_pairs, batch_format="pandas")
    cand_pdf = cand.to_pandas().drop_duplicates()
    if not len(cand_pdf):
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    # verify: join text back for the (small) candidate id set
    need = sorted(set(cand_pdf["a"]) | set(cand_pdf["b"]))
    texts: dict = {}
    for b in docs_ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        for kid, tx in zip(b.column(key).to_pylist(), b.column(text_col).to_pylist()):
            if kid in texts or (need and kid not in set(need)):
                continue
            texts[kid] = set(_shingles(tx, k))
    a_out, b_out, j_out = [], [], []
    for a, b in cand_pdf[["a", "b"]].itertuples(index=False):
        sa, sb = texts.get(a, set()), texts.get(b, set())
        denom = len(sa | sb)
        j = len(sa & sb) / denom if denom else 0.0
        if j >= threshold:
            a_out.append(a)
            b_out.append(b)
            j_out.append(round(j, 8))
    return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64()),
                     "jaccard": pa.array(j_out, pa.float64())})


# ------------------------------------------------------------------ SimHash


def simhash64(batch: pa.Table, text_col: str = "text", key: str = "doc_id") -> pa.Table:
    """64-bit SimHash over whitespace tokens (md5-derived token hashes)."""
    keys = batch.column(key).to_pylist()
    out = np.zeros(len(keys), dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for i, text in enumerate(batch.column(text_col).to_pylist()):
        acc = np.zeros(64, dtype=np.int64)
        for tok in _WS.findall(text):
            h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big"))
            bits = (h >> shifts) & one
            acc += np.where(bits == one, 1, -1)
        out[i] = np.packbits((acc > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
    return pa.table({key: batch.column(key), "simhash": pa.array(out.view(np.int64), pa.int64())})


def simhash_pairs(docs_ds, text_col: str = "text", key: str = "doc_id", max_hamming: int = 3):
    """Near-dup pairs with Hamming distance <= max_hamming via 4-block
    bucketing (a pair within distance 3 shares at least one 16-bit
    block)."""
    import pandas as pd

    sh = docs_ds.map_batches(lambda b: simhash64(b, text_col, key),
                             batch_format="pyarrow", batch_size=None).to_pandas()
    sh["u"] = sh["simhash"].astype("uint64")
    pairs = set()
    for blk in range(4):
        block = ((sh["u"].to_numpy() >> np.uint64(16 * blk)) & np.uint64(0xFFFF))
        df = pd.DataFrame({"k": sh[key].to_numpy(), "u": sh["u"].to_numpy(), "b": block})
        for _, g in df.groupby("b"):
            ks = g["k"].to_numpy()
            us = g["u"].to_numpy()
            for i in range(len(ks)):
                x = us[i] ^ us[i + 1:]
                ham = np.array([bin(int(v)).count("1") for v in x])
                for j in np.nonzero(ham <= max_hamming)[0]:
                    a, b2 = sorted((int(ks[i]), int(ks[i + 1 + j])))
                    pairs.add((a, b2))
    a = sorted(pairs)
    return pa.table({"a": pa.array([p[0] for p in a], pa.int64()),
                     "b": pa.array([p[1] for p in a], pa.int64())})
