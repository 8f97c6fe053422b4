"""Deterministic synthetic fixtures (FIXTURES.md).

F1 `pages`: Common-Crawl-style corpus ``(url, warc_ts, html, text,
lang)``; `html` carries anchors whose targets follow a zipfian
distribution (hub skew), seeded entities / mailto links / self-links /
duplicate anchors / 2% out-of-corpus targets (dangling vertices, cf.
PageRank dangling handling in
examples/analytical_apps/pagerank/pagerank.h:66-88).  The `text` column
is the *expected* extraction; `libgrape_lite_ray.extract.extract_text`
must reproduce it byte-for-byte (pytest invariant, input_hint).

F2 edge topologies for engine-only tests: ER components, zipf web,
cliques+bridges with known triangle counts (mirrors the reference's
golden-graph strategy, misc/app_tests.sh + dataset/p2p-31).

All rows derive from ``np.random.default_rng([seed, row_index])`` so the
corpus is identical no matter how generation is batched or distributed.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

__all__ = [
    "page_row",
    "pages_table",
    "generate_pages",
    "er_components",
    "zipf_graph",
    "cliques_and_bridges",
]

_EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds

# seeded pseudo-word pool (deterministic, no external data)
_rng_pool = np.random.default_rng(42)
_SYLL = ["ra", "to", "ne", "vi", "ska", "dor", "mel", "qu", "ex", "li", "ost", "an", "per", "zu", "gra", "fen"]
TOKENS = [
    "".join(_rng_pool.choice(_SYLL, size=int(_rng_pool.integers(2, 5))))
    for _ in range(256)
]
# a few tokens with entity-needing characters to exercise escaping
TOKENS[7] = "r&d"
TOKENS[23] = "a<b"
TOKENS[41] = 'say"so'
_STOP_EN = ["the", "and", "of", "to", "a", "in", "is", "it"]
_STOP_DE = ["der", "und", "das", "zu", "ein", "ist", "nicht", "mit"]
_STOP_FR = ["le", "et", "de", "un", "est", "pas", "que", "pour"]


def _url(site: int, k: int) -> str:
    return f"https://site{site}.example/p/{k}"


def page_row(idx: int, n_pages: int, n_sites: int, seed: int = 42,
             richness: int = 1) -> dict:
    rng = np.random.default_rng([seed, idx])
    site = idx % n_sites
    url = _url(site, idx)

    lang_draw = rng.random()
    lang = "en" if lang_draw >= 0.05 else ("de" if lang_draw >= 0.025 else "fr")
    stop = {"en": _STOP_EN, "de": _STOP_DE, "fr": _STOP_FR}[lang]

    def words(lo, hi):
        n = int(rng.integers(lo, hi))
        out = []
        for _ in range(n):
            if rng.random() < 0.3:
                out.append(stop[int(rng.integers(0, len(stop)))])
            else:
                out.append(TOKENS[int(rng.integers(0, len(TOKENS)))])
        return out

    title_words = words(2, 6)
    title = " ".join(title_words)

    n_paras = int(rng.integers(1, 5)) * max(1, int(richness))
    text_parts = [title]
    html_parts = [
        "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\"><title>",
        _html.escape(title),
        f"</title></head>\n<body>\n<h1>{_html.escape(title)}</h1>\n",
    ]
    for _ in range(n_paras):
        seg_texts: list[str] = []
        seg_html: list[str] = []
        n_segs = int(rng.integers(1, 4))
        for s in range(n_segs):
            w = " ".join(words(3, 12))
            seg_texts.append(w)
            seg_html.append(_html.escape(w))
            # after each run of words, maybe an anchor
            if rng.random() < 0.75:
                atext = " ".join(words(1, 4))
                r = rng.random()
                if r < 0.02:
                    href = f"https://external{int(rng.integers(0, 50))}.example/x/{int(rng.integers(0, 1000))}"
                elif r < 0.06:
                    href = f"mailto:u{int(rng.integers(0, 9))}@example.com"
                else:
                    # zipfian in-corpus target (hub skew); self-links allowed
                    z = int(rng.zipf(1.3))
                    tgt = (z - 1) % n_pages
                    if rng.random() < 0.5 and tgt % n_sites == site:
                        href = f"/p/{tgt}"  # site-relative form
                    else:
                        href = _url(tgt % n_sites, tgt)
                seg_texts.append(atext)
                seg_html.append(f'<a href="{href}">{_html.escape(atext)}</a>')
        text_parts.append(" ".join(seg_texts))
        html_parts.append("<p>" + " ".join(seg_html) + "</p>\n")
    html_parts.append("</body></html>\n")

    return {
        "url": url,
        "warc_ts": _EPOCH_US + idx * 1_000_000,
        "html": "".join(html_parts).encode("utf-8"),
        "text": "\n".join(text_parts),
        "lang": lang,
    }


_PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        },
        schema=_PAGES_SCHEMA,
    )


def pages_table(n_pages: int, n_sites: int = 8, seed: int = 42,
                richness: int = 1) -> pa.Table:
    """In-process generation (tests; up to ~10^4 pages)."""
    return _rows_to_table([page_row(i, n_pages, n_sites, seed, richness) for i in range(n_pages)])


def generate_pages(out_dir: str, n_pages: int, n_sites: int = 16, seed: int = 42,
                   richness: int = 1):
    """Distributed generation via Ray Data (bench scale).

    Row i is identical to ``page_row(i, ...)`` regardless of batching.
    """
    import ray.data as rd

    def make(batch: dict) -> pa.Table:
        rows = [page_row(int(i), n_pages, n_sites, seed, richness) for i in batch["id"]]
        return _rows_to_table(rows)

    (
        rd.range(n_pages)
        .map_batches(make, batch_format="numpy", batch_size=2048)
        .write_parquet(out_dir)
    )


# ---------------------------------------------------------------- F2 edges


def er_components(n1: int = 60, n2: int = 40, extra1: int = 90, extra2: int = 50, seed: int = 42):
    """Two disjoint connected components: spanning chains + random extra
    edges.  Vertices 0..n1-1 and n1..n1+n2-1."""
    rng = np.random.default_rng(seed)
    src, dst = [], []
    for base, n, extra in ((0, n1, extra1), (n1, n2, extra2)):
        src.extend(range(base, base + n - 1))
        dst.extend(range(base + 1, base + n))
        a = rng.integers(base, base + n, size=extra)
        b = rng.integers(base, base + n, size=extra)
        m = a != b
        src.extend(a[m].tolist())
        dst.extend(b[m].tolist())
    return np.asarray(src, np.int64), np.asarray(dst, np.int64)


def zipf_graph(n: int = 500, m: int = 4000, alpha: float = 1.3, seed: int = 42):
    """Directed web-like graph: uniform sources, zipfian destinations
    (hub skew).  Self-loops removed; multi-edges kept (build dedups)."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = (rng.zipf(alpha, size=m) - 1) % n
    keep = src != dst
    # a spanning chain so every vertex id in [0, n) exists in the edge set
    cs = np.arange(0, n - 1)
    return (
        np.concatenate([src[keep], cs]).astype(np.int64),
        np.concatenate([dst[keep], cs + 1]).astype(np.int64),
    )


def cliques_and_bridges(num_cliques: int = 5, size: int = 6):
    """Known-triangle-count graph: `num_cliques` disjoint K_size cliques
    chained by bridge edges (bridges add no triangles).

    Total triangles = num_cliques * C(size, 3).
    """
    src, dst = [], []
    for c in range(num_cliques):
        base = c * size
        for i in range(size):
            for j in range(i + 1, size):
                src.append(base + i)
                dst.append(base + j)
        if c + 1 < num_cliques:
            src.append(base + size - 1)
            dst.append(base + size)
    return np.asarray(src, np.int64), np.asarray(dst, np.int64)


def expected_triangles(num_cliques: int = 5, size: int = 6) -> int:
    return num_cliques * (size * (size - 1) * (size - 2) // 6)


def big_engine_edges(n_vertices: int, n_edges: int, seed: int = 42):
    """Engine-scale deterministic edge Dataset in gid space (no html):
    pure per-row arithmetic (stable under any batching), zipf-ish
    destination skew via a cubed uniform hash.  Used by bench.py for the
    superstep-throughput scaling measurement."""
    import ray.data as rd

    K1 = np.uint64(0x9E3779B97F4A7C15)
    K2 = np.uint64(0xBF58476D1CE4E5B9)

    def make(batch: dict) -> pa.Table:
        i = batch["id"].astype(np.uint64) + np.uint64(seed)
        h1 = (i * K1) >> np.uint64(32)
        h2 = ((i + np.uint64(1)) * K2) >> np.uint64(32)
        src = (h1 % np.uint64(n_vertices)).astype(np.int64)
        u = (h2 & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32
        dst = np.minimum((n_vertices * u**3).astype(np.int64), n_vertices - 1)
        keep = src != dst
        return pa.table({"src": src[keep], "dst": dst[keep]})

    return rd.range(n_edges).map_batches(make, batch_format="numpy", batch_size=1 << 20)
