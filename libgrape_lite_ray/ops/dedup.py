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

__all__ = ["content_hash", "exact_dedup", "minhash_signature", "minhash_lsh_pairs",
           "simhash64", "simhash_pairs", "ngram_jaccard_pairs",
           "embedding_neardup_pairs"]

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
        # sort_values works for any orderable key dtype (nsmallest
        # raises TypeError on string keys, e.g. url)
        return g.sort_values(key).head(1)

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
    return _verify_jaccard_pairs(docs_ds, cand_pdf, text_col, key, k, threshold)


def _verify_jaccard_pairs(docs_ds, cand_pdf, text_col: str, key: str,
                          k: int, threshold: float) -> pa.Table:
    """DISTRIBUTED exact-Jaccard verify of candidate pairs: semi-join of
    docs ⋈ candidate ids (broadcast the small candidate-id set, filter +
    shingle inside map_batches) — the corpus is never streamed through
    the driver.  Only the candidate docs' distinct-shingle sets come
    back (candidates << corpus, the documented web-dedup assumption)."""
    import ray

    need = sorted(set(cand_pdf["a"]) | set(cand_pdf["b"]))
    need_ref = ray.put(frozenset(need))

    class CandidateShingles:
        def __init__(self):
            self.need = ray.get(need_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            kid_arr = b.column(key).to_pylist()
            mask = np.fromiter((kk in self.need for kk in kid_arr),
                               dtype=bool, count=len(kid_arr))
            if not mask.any():
                return pa.table({key: pa.array([], b.column(key).type),
                                 "shingles": pa.array([], pa.list_(pa.string()))})
            sub = b.filter(pa.array(mask))
            out_k, out_s = [], []
            for kid, tx in zip(sub.column(key).to_pylist(), sub.column(text_col).to_pylist()):
                out_k.append(kid)
                out_s.append(sorted(set(_shingles(tx, k))))
            return pa.table({key: pa.array(out_k, b.column(key).type),
                             "shingles": pa.array(out_s, pa.list_(pa.string()))})

    cand_docs = docs_ds.map_batches(CandidateShingles, batch_format="pyarrow",
                                    batch_size=4096, concurrency=(1, 8))
    shingle_sets: dict = {}
    for b in cand_docs.iter_batches(batch_format="pyarrow", batch_size=4096):
        for kid, sh in zip(b.column(key).to_pylist(), b.column("shingles").to_pylist()):
            shingle_sets[kid] = set(sh)

    # Jaccard per candidate pair in a distributed stage (broadcast the
    # small shingle-set dict; the pair table is tiny but the stage shape
    # scales with candidate volume)
    import ray.data as rd

    sets_ref = ray.put(shingle_sets)

    class PairJaccard:
        def __init__(self):
            self.sets = ray.get(sets_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a_out, b_out, j_out = [], [], []
            for a, b in zip(t.column("a").to_pylist(), t.column("b").to_pylist()):
                sa, sb = self.sets.get(a, set()), self.sets.get(b, set())
                denom = len(sa | sb)
                j = len(sa & sb) / denom if denom else 0.0
                if j >= threshold:
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(round(j, 8))
            return pa.table({"a": pa.array(a_out, pa.int64()),
                             "b": pa.array(b_out, pa.int64()),
                             "jaccard": pa.array(j_out, pa.float64())})

    pairs_ds = rd.from_arrow(pa.Table.from_pandas(cand_pdf[["a", "b"]]))
    verified = pairs_ds.map_batches(PairJaccard, batch_format="pyarrow",
                                    batch_size=4096, concurrency=(1, 4))
    batches = list(verified.iter_batches(batch_format="pyarrow", batch_size=10**6))
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    return pa.concat_tables(batches) if batches else empty


def ngram_jaccard_pairs(docs_ds, text_col: str = "text", key: str = "doc_id",
                        k: int = 3, threshold: float = 0.5,
                        max_posting: int = 256):
    """EXACT n-gram Jaccard near-dup pairs via a shingle inverted
    index: candidate pairs share >= 1 k-token shingle (any pair with
    jaccard > 0 shares one, so recall is exact up to the ``max_posting``
    skew cap on degenerate shingles), verified with exact Jaccard in a
    distributed stage.  Candidate volume is bounded by
    sum_over_shingles(posting^2); the cap keeps boilerplate shingles
    from exploding it."""
    import pandas as pd

    def emit_shingles(b: pa.Table) -> pa.Table:
        keys, hs = [], []
        for kid, text in zip(b.column(key).to_pylist(), b.column(text_col).to_pylist()):
            for s in set(_shingles(text, k)):
                keys.append(kid)
                hs.append(hashlib.md5(s.encode("utf-8")).hexdigest()[:16])
        return pa.table({key: pa.array(keys, pa.int64()),
                         "sh": pa.array(hs, pa.string())})

    inv = docs_ds.map_batches(emit_shingles, batch_format="pyarrow", batch_size=None)

    def posting_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[key].to_numpy())[:max_posting]
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        iu, ju = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})

    cand_pdf = (inv.groupby("sh").map_groups(posting_pairs, batch_format="pandas")
                .to_pandas().drop_duplicates())
    if not len(cand_pdf):
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    return _verify_jaccard_pairs(docs_ds, cand_pdf, text_col, key, k, threshold)


def embedding_neardup_pairs(emb_ds, threshold: float = 0.95,
                            key: str = "vec_id", col: str = "embedding",
                            n_planes: int = 8, n_tables: int = 6, seed: int = 7,
                            max_bucket: int = 2048):
    """Embedding-cosine near-duplicate pairs (cos >= threshold) via
    random-hyperplane LSH blocking: candidates share a sign-pattern
    bucket in >= 1 table (high recall at high thresholds), then exact
    cosine within each bucket (one matmul per bucket).  Buckets above
    ``max_bucket`` are truncated (skew guard)."""
    import pandas as pd
    import ray

    from .ann import _batch_matrix, _normalize

    first = next(iter(emb_ds.iter_batches(batch_format="pyarrow", batch_size=8)))
    dim = _batch_matrix(first, col).shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    p_ref = ray.put(planes)
    pow2 = (1 << np.arange(n_planes)).astype(np.int64)

    class BucketCodes:
        def __init__(self):
            self.planes = ray.get(p_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            M = _normalize(_batch_matrix(b, col))
            ids = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            out_k, out_t, out_c, out_v = [], [], [], []
            for t in range(self.planes.shape[0]):
                codes = ((M @ self.planes[t].T) > 0).astype(np.int64) @ pow2
                out_k.append(ids)
                out_t.append(np.full(len(ids), t, np.int64))
                out_c.append(codes)
                out_v.append(M)
            return pa.table({
                key: pa.array(np.concatenate(out_k), pa.int64()),
                "tbl": pa.array(np.concatenate(out_t), pa.int64()),
                "code": pa.array(np.concatenate(out_c), pa.int64()),
                "vec": pa.array(list(np.concatenate(out_v, axis=0)),
                                pa.list_(pa.float64())),
            })

    coded = emb_ds.map_batches(BucketCodes, batch_format="pyarrow",
                               batch_size=2048, concurrency=(1, 8))

    def bucket_cosine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key).head(max_bucket)
        ids = g[key].to_numpy()
        M = np.stack(g["vec"].to_numpy())
        sims = M @ M.T
        iu, ju = np.triu_indices(len(ids), 1)
        hit = sims[iu, ju] >= threshold
        return pd.DataFrame({
            "a": ids[iu[hit]].astype(np.int64),
            "b": ids[ju[hit]].astype(np.int64),
            "cos": np.round(sims[iu[hit], ju[hit]], 8),
        })

    pdf = (coded.groupby(["tbl", "code"]).map_groups(bucket_cosine, batch_format="pandas")
           .to_pandas())
    if not len(pdf):
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    pdf = (pdf.sort_values("cos", ascending=False)
           .drop_duplicates(["a", "b"]).sort_values(["a", "b"]))
    return pa.table({"a": pa.array(pdf["a"].to_numpy(), pa.int64()),
                     "b": pa.array(pdf["b"].to_numpy(), pa.int64()),
                     "cos": pa.array(pdf["cos"].to_numpy(), pa.float64())})


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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (no per-element Python)."""
    x = x.astype(np.uint64, copy=True)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_pairs(docs_ds, text_col: str = "text", key: str = "doc_id",
                  max_hamming: int = 3, max_bucket: int = 4096):
    """Near-dup pairs with Hamming distance <= max_hamming via 4-block
    bucketing (a pair within distance 3 shares at least one 16-bit
    block).  The pair search is a DISTRIBUTED groupby over
    (block, 16-bit code) buckets with a vectorized XOR+popcount kernel
    per bucket; buckets above ``max_bucket`` are truncated (skew
    guard).  Final cross-block dedup is over the (small) pair list."""
    import pandas as pd

    sh = docs_ds.map_batches(lambda b: simhash64(b, text_col, key),
                             batch_format="pyarrow", batch_size=None)

    def explode_blocks(t: pa.Table) -> pa.Table:
        u = t.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        kk = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(u)
        ks = np.tile(kk, 4)
        us = np.tile(u, 4)
        blk = np.repeat(np.arange(4, dtype=np.int32), n)
        code = (us >> (np.uint64(16) * blk.astype(np.uint64))) & np.uint64(0xFFFF)
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "u": pa.array(us.view(np.int64), pa.int64()),
                         "blk": pa.array(blk, pa.int32()),
                         "code": pa.array(code.view(np.int64), pa.int64())})

    exploded = sh.map_batches(explode_blocks, batch_format="pyarrow", batch_size=None)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ks = g["k"].to_numpy()[:max_bucket]
        us = g["u"].to_numpy().view(np.uint64)[:max_bucket]
        m = len(ks)
        if m < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        ham = _popcount64(us[:, None] ^ us[None, :])
        iu, ju = np.triu_indices(m, 1)
        hit = ham[iu, ju] <= max_hamming
        a = np.minimum(ks[iu[hit]], ks[ju[hit]])
        b = np.maximum(ks[iu[hit]], ks[ju[hit]])
        return pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64)})

    pairs_pdf = (exploded.groupby(["blk", "code"])
                 .map_groups(bucket_pairs, batch_format="pandas")
                 .to_pandas().drop_duplicates().sort_values(["a", "b"]))
    return pa.table({"a": pa.array(pairs_pdf["a"].to_numpy(), pa.int64()),
                     "b": pa.array(pairs_pdf["b"].to_numpy(), pa.int64())})
