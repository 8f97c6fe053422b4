"""Dataset-level ops: dedup, text, ANN, windows, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": pa.array(texts, pa.string())}))


def test_exact_dedup(ray_session):
    from libgrape_lite_ray.ops.dedup import exact_dedup

    ds = _docs_ds(["aa bb", "cc dd", "aa bb", "ee", "cc dd"], [10, 11, 12, 13, 14])
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [10, 11, 13]


def test_minhash_finds_near_dupes(ray_session):
    from libgrape_lite_ray.ops.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base.replace("field", "meadow")
    far = "completely different content about graph engines and arrow batches"
    ds = _docs_ds([base, near, far, base], [1, 2, 3, 4])
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
    assert (1, 4) in got  # identical
    assert (1, 2) in got or (2, 4) in got  # near-dup
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_pairs(ray_session):
    from libgrape_lite_ray.ops.dedup import simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ds = _docs_ds([base, base, "unrelated words entirely distinct tokens"], [1, 2, 3])
    pairs = simhash_pairs(ds, max_hamming=3).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
    assert (1, 2) in got  # exact duplicate -> hamming 0, always blocked together
    assert all(3 not in p for p in got)


def test_ngram_jaccard_pairs(ray_session):
    from libgrape_lite_ray.ops.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base.replace("field", "meadow")
    far = "completely different content about graph engines and arrow batches"
    ds = _docs_ds([base, near, far, base], [1, 2, 3, 4])
    pairs = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    got = dict(((a, b), j) for a, b, j in
               pairs[["a", "b", "jaccard"]].itertuples(index=False))
    assert got.get((1, 4)) == 1.0  # identical docs
    assert (1, 2) in got and 0.5 <= got[(1, 2)] < 1.0
    assert all(3 not in p for p in got)


def test_embedding_neardup(ray_session):
    import ray.data as rd

    from libgrape_lite_ray.ops.ann import cosine_neardup_exact
    from libgrape_lite_ray.ops.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(1)
    n, d = 300, 32
    M = rng.standard_normal((n, d))
    M[7] = M[3] + 0.02 * rng.standard_normal(d)   # planted near-dup
    M[20] = M[11] + 0.03 * rng.standard_normal(d)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(M.tolist(), pa.list_(pa.float64())),
    }))
    exact = cosine_neardup_exact(ds, threshold=0.95).to_pandas()
    got = set(map(tuple, exact[["a", "b"]].itertuples(index=False)))
    assert (3, 7) in got and (11, 20) in got
    # numpy oracle: exactly the planted pairs at this threshold
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    iu, ju = np.triu_indices(n, 1)
    want = set(zip(iu[S[iu, ju] >= 0.95].tolist(), ju[S[iu, ju] >= 0.95].tolist()))
    assert got == want
    # LSH-blocked scale path finds the planted dups too
    lsh = embedding_neardup_pairs(ds, threshold=0.95).to_pandas()
    got_lsh = set(map(tuple, lsh[["a", "b"]].itertuples(index=False)))
    assert (3, 7) in got_lsh and (11, 20) in got_lsh
    assert got_lsh <= want  # precision exact (verified within buckets)


def test_lang_id(ray_session):
    from libgrape_lite_ray.ops.text import lang_id

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "the cat and the hat is in it",
            "der hund und das haus ist nicht mit",
            "le chat et un chien est pas que pour",
        ]),
    })
    out = lang_id(t).to_pydict()
    assert out["pred_lang"] == ["en", "de", "fr"]


def test_ann_brute_topk(ray_session):
    import ray.data as rd

    from libgrape_lite_ray.ops.ann import brute_topk, lsh_topk

    rng = np.random.default_rng(0)
    n, d = 200, 16
    M = rng.standard_normal((n, d)).astype(np.float32)
    M[5] = M[0] + 0.01 * rng.standard_normal(d).astype(np.float32)  # near-dup of 0
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(M.tolist(), pa.list_(pa.float32())),
    }))
    top = brute_topk(ds, [0], k=5).to_pandas()
    assert top.iloc[0]["neighbor_id"] == 5  # nearest neighbor found
    assert list(top["rank"]) == [1, 2, 3, 4, 5]

    # exact-vs-numpy oracle
    Mn = M.astype(np.float64)
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    sims = Mn @ Mn[0]
    sims[0] = -2
    want = np.argsort(-sims, kind="stable")[:5]
    assert top["neighbor_id"].tolist() == want.tolist()

    # LSH path returns plausible approximate results incl. the near-dup
    approx = lsh_topk(ds, [0], k=5, n_planes=6, n_tables=6).to_pandas()
    assert 5 in approx["neighbor_id"].tolist()

    # IVF path: probing all lists degenerates to exact search
    from libgrape_lite_ray.ops.ann import ivf_topk

    full = ivf_topk(ds, [0], k=5, n_lists=4, n_probe=4).to_pandas()
    assert full["neighbor_id"].tolist() == want.tolist()
    # narrow probe stays approximate but finds the near-duplicate
    # (its vector shares vertex 0's list by construction)
    narrow = ivf_topk(ds, [0], k=5, n_lists=8, n_probe=2).to_pandas()
    assert 5 in narrow["neighbor_id"].tolist()
    assert len(narrow) == 5 and narrow["rank"].tolist() == [1, 2, 3, 4, 5]


def test_windows(ray_session):
    import ray.data as rd

    from libgrape_lite_ray.ops.window import hourly_rollup, sessionize

    ts = pa.array([0, 10 * 60_000_000, 2 * 3_600_000_000, 2 * 3_600_000_000 + 1],
                  pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
    }))
    hourly = hourly_rollup(ev).to_pandas().sort_values(["user_id", "hour_start_us"])
    assert hourly["n_events"].tolist() == [2, 1, 1]
    sess = sessionize(ev).to_pandas().sort_values(["user_id", "session_id"])
    # user 1: events at 0 and 10min (one session), then 2h (new session)
    assert sess[sess.user_id == 1]["n_events"].tolist() == [2, 1]
    assert sess[sess.user_id == 2]["n_events"].tolist() == [1]


def test_multimodal_decode(ray_session):
    import ray.data as rd

    from libgrape_lite_ray.ops.multimodal import DecodeImage, ExtractImageFeatures, fake_image_bytes

    t = pa.table({
        "key": pa.array([1, 2, 3], pa.int64()),
        "image": pa.array([fake_image_bytes(s) for s in (1, 2, 3)], pa.binary()),
    })
    ds = rd.from_arrow(t)
    out = ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=2,
                         concurrency=1).to_pandas().sort_values("key")
    assert out["width"].tolist() == [32, 32, 32]
    assert (out["mean_pixel"] > 0).all()
    # deterministic across runs
    out2 = ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=3,
                          concurrency=1).to_pandas().sort_values("key")
    assert out["mean_pixel"].tolist() == out2["mean_pixel"].tolist()
    feats = ds.map_batches(ExtractImageFeatures, batch_format="pyarrow",
                           batch_size=2, concurrency=1).to_pandas()
    assert len(feats) == 3 and len(feats.iloc[0]["feature"]) == 8

    # resize halves dimensions; re-decode confirms the new header
    from libgrape_lite_ray.ops.multimodal import ResizeImage

    small = (ds.map_batches(ResizeImage, fn_constructor_kwargs={"w": 16, "h": 16},
                            batch_format="pyarrow", batch_size=2, concurrency=1)
               .map_batches(DecodeImage, batch_format="pyarrow", batch_size=2,
                            concurrency=1).to_pandas().sort_values("key"))
    assert small["width"].tolist() == [16, 16, 16]
    assert small["height"].tolist() == [16, 16, 16]


def test_video_frame_sample(ray_session):
    import ray.data as rd

    from libgrape_lite_ray.ops.multimodal import (DecodeImage, SampleVideoFrames,
                                                  fake_video_bytes)

    t = pa.table({
        "key": pa.array([10, 11], pa.int64()),
        "video": pa.array([fake_video_bytes(s, frames=12) for s in (1, 2)], pa.binary()),
    })
    out = (rd.from_arrow(t)
             .map_batches(SampleVideoFrames, fn_constructor_kwargs={"n": 4},
                          batch_format="pyarrow", batch_size=1, concurrency=1)
             .to_pandas())
    assert len(out) == 8  # 4 frames per video
    assert sorted(out[out.key == 10]["frame_idx"]) == [0, 3, 6, 9]
    # sampled frames decode as images
    frames = pa.table({"key": pa.array(out["key"]),
                       "image": pa.array(list(out["frame"]), pa.binary())})
    dec = rd.from_arrow(frames).map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=4, concurrency=1).to_pandas()
    assert (dec["width"] == 8).all()


def test_pair_ops_return_datasets_and_empty_path(ray_session):
    """Round-3 verdict fix #2: pair ops are Dataset end-to-end — the
    return value is a Dataset, and a corpus with no candidates flows
    through the empty path with the right schema."""
    from ray.data import Dataset

    from libgrape_lite_ray.ops.dedup import minhash_lsh_pairs, simhash_pairs

    distinct = [f"totally unique document number {i} with words w{i} x{i*7} y{i*13} z{i*29}"
                for i in range(8)]
    ds = _docs_ds(distinct)
    out = minhash_lsh_pairs(ds, threshold=0.9)
    assert isinstance(out, Dataset)
    # Ray's to_pandas drops columns on 0-row datasets; the schema is
    # what downstream joins/writes see
    assert out.schema().names == ["a", "b", "jaccard"]
    assert out.count() == 0
    out2 = simhash_pairs(ds, max_hamming=0)
    assert isinstance(out2, Dataset)
    assert out2.schema().names == ["a", "b"] and out2.count() == 0


def test_candidate_payload_join_route_matches_broadcast(ray_session):
    """The distributed-join semi-join fallback (candidate-ID universe
    too big to broadcast) must produce the same verified pairs as the
    broadcast route."""
    from libgrape_lite_ray.ops import dedup as dd

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    texts = [base, base.replace("kappa", "lambda"), "other thing entirely distinct",
             base]
    ds = _docs_ds(texts, [5, 6, 7, 8])
    want = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)

    orig = dd._candidate_payload

    def forced_join(src_ds, pairs_m, key, emit_fn, broadcast_ids=50_000_000):
        return orig(src_ds, pairs_m, key, emit_fn, broadcast_ids=0)

    dd._candidate_payload = forced_join
    try:
        got = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
    finally:
        dd._candidate_payload = orig
    assert want.equals(got) and len(want) > 0


def test_audio_pipeline(ray_session):
    """Audio plumbing mirrors the image path: decode -> features ->
    resample, all over opaque binary columns in actor-pool stages; the
    fake PCM format is decoded for real (real codecs import-gated on
    soundfile)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from libgrape_lite_ray.ops.multimodal import (DecodeAudio,
                                                  ExtractAudioFeatures,
                                                  ResampleAudio,
                                                  fake_audio_bytes)

    t = pa.table({
        "key": pa.array([1, 2, 3], pa.int64()),
        "audio": pa.array([fake_audio_bytes(s, n_samples=1600) for s in (1, 2, 3)],
                          pa.binary()),
    })
    ds = rd.from_arrow(t)
    dec = (ds.map_batches(DecodeAudio, batch_format="pyarrow", batch_size=2,
                          concurrency=1).to_pandas().sort_values("key"))
    assert (dec["sample_rate"] == 16_000).all()
    np.testing.assert_allclose(dec["duration_s"], 0.1)
    assert (dec["rms"] > 0).all()

    feats = (ds.map_batches(ExtractAudioFeatures, batch_format="pyarrow",
                            batch_size=3, concurrency=1)
             .to_pandas().sort_values("key"))
    f0 = np.array(feats["feature"].iloc[0])
    assert len(f0) == 16 and (f0[:8] > 0).all()  # 8 energies + 8 zcr
    # deterministic: same input -> same features
    f0b = np.array(
        ds.map_batches(ExtractAudioFeatures, batch_format="pyarrow",
                       batch_size=1, concurrency=1)
        .to_pandas().sort_values("key")["feature"].iloc[0])
    np.testing.assert_allclose(f0, f0b)

    res = (ds.map_batches(ResampleAudio, fn_constructor_kwargs={"target_sr": 8000},
                          batch_format="pyarrow", batch_size=2, concurrency=1)
           .map_batches(DecodeAudio, batch_format="pyarrow", batch_size=2,
                        concurrency=1).to_pandas().sort_values("key"))
    assert (res["sample_rate"] == 8000).all()
    np.testing.assert_allclose(res["duration_s"], 0.1, rtol=1e-2)


def test_bucket_pairs_kernel(ray_session):
    """_bucket_pairs_ds: exact per-bucket pairs, smallest-ids cap,
    payload filter — against a brute-force reference."""
    import itertools

    import ray.data as rd

    from libgrape_lite_ray.ops.dedup import _bucket_pairs_ds

    rng = np.random.default_rng(3)
    n = 400
    bands = rng.integers(0, 3, n)
    hashes = rng.integers(0, 25, n)          # small space -> real buckets
    ids = rng.permutation(10_000)[:n].astype(np.int64)
    t = pa.table({"band": pa.array(bands, pa.int64()),
                  "band_hash": pa.array(hashes, pa.int64()),
                  "doc_id": pa.array(ids, pa.int64())})
    cap = 5
    got = (_bucket_pairs_ds(rd.from_arrow(t), ["band", "band_hash"],
                            "doc_id", cap)
           .to_pandas().drop_duplicates().sort_values(["a", "b"]))
    want = set()
    buckets = {}
    for b, h, i in zip(bands, hashes, ids):
        buckets.setdefault((b, h), []).append(i)
    for mem in buckets.values():
        for a, b2 in itertools.combinations(sorted(mem)[:cap], 2):
            want.add((a, b2))
    assert set(zip(got["a"], got["b"])) == want
    assert (got["a"] < got["b"]).all()


def test_bucket_pairs_payload_filter(ray_session):
    import ray.data as rd

    from libgrape_lite_ray.ops.dedup import _bucket_pairs_ds

    t = pa.table({"bk": pa.array([7, 7, 7, 9, 9], pa.int64()),
                  "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "u": pa.array([10, 10, 99, 4, 4], pa.int64())})
    got = (_bucket_pairs_ds(rd.from_arrow(t), ["bk"], "k", 64,
                            payload_col="u",
                            pair_filter=lambda ua, ub: ua == ub)
           .to_pandas().drop_duplicates().sort_values(["a", "b"]))
    assert set(zip(got["a"], got["b"])) == {(1, 2), (4, 5)}


def test_sharded_map_groups_matches_per_group(ray_session):
    """sharded sessionize == the per-user reference computed in pandas."""
    import pandas as pd
    import ray.data as rd

    from libgrape_lite_ray.ops.window import sessionize

    rng = np.random.default_rng(11)
    n = 3000
    users = rng.integers(0, 200, n).astype(np.int64)
    ts = rng.integers(0, 10**10, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
        "value": pa.array(np.ones(n), pa.float64())}))
    got = (sessionize(ds).to_pandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    gap_us = 30 * 60_000_000
    rows = []
    df = pd.DataFrame({"user_id": users, "ts_us": ts}).sort_values(
        ["user_id", "ts_us"])
    for uid, g in df.groupby("user_id"):
        tsv = g["ts_us"].to_numpy()
        brk = np.concatenate([[True], np.diff(tsv) > gap_us])
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            m = sid == s
            rows.append((uid, int(s), int(tsv[m].min()), int(m.sum())))
    want = pd.DataFrame(rows, columns=["user_id", "session_id",
                                       "session_start_us", "n_events"])
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_dtype=False)


def test_sliding_rollup(ray_session):
    import pandas as pd
    import ray.data as rd

    from libgrape_lite_ray.ops.window import sliding_rollup

    rng = np.random.default_rng(5)
    n = 2000
    users = rng.integers(0, 40, n).astype(np.int64)
    ts = rng.integers(0, 6 * 3_600_000_000, n).astype(np.int64)
    vals = rng.normal(size=n)
    ds = rd.from_arrow(pa.table({"user_id": pa.array(users, pa.int64()),
                                 "ts": pa.array(ts, pa.int64()),
                                 "value": pa.array(vals, pa.float64())}))
    W, H = 3_600_000_000, 900_000_000
    got = (sliding_rollup(ds, 60, 15).to_pandas()
           .sort_values(["user_id", "window_start_us"]).reset_index(drop=True))
    rows = []
    for k in range(W // H):
        rows.append(pd.DataFrame({"user_id": users,
                                  "window_start_us": (ts // H - k) * H,
                                  "value": vals}))
    want = (pd.concat(rows).groupby(["user_id", "window_start_us"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
            .sort_values(["user_id", "window_start_us"]).reset_index(drop=True))
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["window_start_us"].tolist() == want["window_start_us"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert np.allclose(got["sum_value"], want["sum_value"], atol=1e-9)


def test_top_tokens(ray_session):
    from collections import Counter

    from libgrape_lite_ray.ops.text import top_tokens

    texts = ["aa bb  cc aa", "bb aa", "dd\tbb\naa", ""]
    ds = _docs_ds(texts)
    got = top_tokens(ds, k=3).to_pandas()
    c = Counter(tok for t in texts for tok in t.split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(got["token"], got["n"])) == want
