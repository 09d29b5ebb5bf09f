"""Tests for morph_xr2rml_spark.ops (dedup / similarity / text /
multimodal) on small synthetic data + the driver testdata."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from morph_xr2rml_spark.ops import dedup, multimodal, similarity, text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank", "en"),
        (2, "the quick brown fox jumps over the lazy dog near the river bend", "en"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank", "en"),
        (4, "completely different content about spark query engines and joins", "en"),
        (5, "le chat noir dort dans la maison pres de la fenetre ouverte", "fr"),
        (6, "", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_text_analyze(spark, docs):
    out = {r["doc_id"]: r for r in text.analyze(docs).collect()}
    assert out[1]["ws_tokens"] == 13
    assert out[6]["ws_tokens"] == 0
    assert out[1]["lang_pred"] == "en"
    assert out[5]["lang_pred"] == "fr"
    assert out[6]["lang_pred"] == "und"
    # identical content -> identical fingerprint; different -> different
    assert out[1]["fingerprint"] == out[3]["fingerprint"]
    assert out[1]["fingerprint"] != out[2]["fingerprint"]
    assert 0 <= out[1]["score_bp"] <= 10000


def test_exact_dedup(spark, docs):
    groups = dedup.exact_dedup_groups(docs).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    assert by_keep[1] == 2  # docs 1 and 3 identical
    assert 3 not in by_keep
    kept = dedup.exact_dedup(docs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 4, 5, 6]


def test_ngram_jaccard(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard_bp"] for r in pairs}
    assert (1, 3) in got and got[(1, 3)] == 10000  # identical
    assert (1, 2) in got  # one-word difference
    assert all(a != 4 and b != 4 for a, b in got)


def test_minhash_lsh(spark, docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, k=3, num_hashes=16, rows_per_band=2, threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]): r for r in pairs}
    assert got[(1, 3)]["sig_agree"] == 16  # identical docs, full agreement
    assert (1, 4) not in got


def test_simhash(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[1] == sh[3]
    # near-identical text -> small hamming distance
    ham12 = bin(sh[1] ^ sh[2]).count("1")
    ham14 = bin(sh[1] ^ sh[4]).count("1")
    assert ham12 < ham14
    pairs = dedup.simhash_pairs(docs, max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 3) in got


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(10, 8).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.randn(8).astype(np.float32)  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(10)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_neardup(spark, emb):
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}


def test_cosine_topk_matches_numpy(spark, emb):
    queries = emb.where(F.col("vec_id") < 2)
    got = similarity.cosine_topk(emb, queries, k=3).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for qid in (0, 1):
        sims = sorted(
            (
                (-np.dot(vecs[qid], v) / (np.linalg.norm(vecs[qid]) * np.linalg.norm(v)), i)
                for i, v in vecs.items() if i != qid
            ),
        )[:3]
        expect = [i for _, i in sims]
        mine = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])
                if r["query_id"] == qid]
        assert mine == expect


def test_lsh_ann_recall(spark, emb):
    queries = emb.where(F.col("vec_id") < 3)
    exact = similarity.cosine_topk(emb, queries, k=1).collect()
    approx = similarity.lsh_ann_topk(emb, queries, k=1, tables=8, bits=2, dim=8)
    amap = {r["query_id"]: r["neighbor_id"] for r in approx.collect()
            if r["rank"] == 1}
    hits = sum(1 for r in exact if r["rank"] == 1 and amap.get(r["query_id"]) == r["neighbor_id"])
    assert hits >= 2  # recall >= 2/3 with 8 tables on tiny data


def test_ivf_assignment_and_recall(spark, emb):
    # every vector lands in exactly one inverted list; probing all
    # clusters makes the index exhaustive (recall 1.0 vs brute force)
    cents = similarity.ivf_centroids(4, 8)
    assign = similarity.ivf_assign(emb, cents, nprobe=1, dim=8)
    n = emb.count()
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n
    queries = emb.where(F.col("vec_id") < 3)
    exact = similarity.cosine_topk(emb, queries, k=2).collect()
    full = similarity.ivf_topk(
        emb, queries, k=2, n_clusters=4, nprobe=4, dim=8
    ).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, exact))
    # partial probing still finds most true neighbors on tiny data
    approx = similarity.ivf_topk(
        emb, queries, k=1, n_clusters=4, nprobe=2, dim=8
    )
    amap = {r["query_id"]: r["neighbor_id"] for r in approx.collect()
            if r["rank"] == 1}
    hits = sum(
        1 for r in exact
        if r["rank"] == 1 and amap.get(r["query_id"]) == r["neighbor_id"]
    )
    assert hits >= 2


def test_multimodal_plumbing(spark, docs):
    media = multimodal.attach_fake_payload(docs)
    row = media.where(F.col("doc_id") == 1).first()
    assert bytes(row["payload"]).decode() == (
        "the quick brown fox jumps over the lazy dog near the river bank"
    )
    assert row["media"]["kind"] in ("image", "audio", "video")
    feats = multimodal.extract_features(media, fake=True)
    out = {r["doc_id"]: r for r in feats.collect()}
    assert len(out[1]["features"]) == multimodal.FEATURE_DIM
    assert out[1]["n_bytes"] == 63
    assert abs(sum(out[1]["features"]) - 1.0) < 1e-5  # histogram normalized
    # deterministic: same payload -> same features
    assert out[1]["features"] == out[3]["features"]
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", fake=False)


def test_multimodal_frame_sample(spark, docs):
    media = multimodal.attach_fake_payload(docs)
    frames = multimodal.frame_sample(media, every_n_bytes=16, frame_bytes=8)
    rows = frames.where(F.col("doc_id") == 1).orderBy("offset").collect()
    assert [r["offset"] for r in rows] == [0, 16, 32, 48]
    assert bytes(rows[0]["frame"]).decode() == "the quic"


def test_ops_on_testdata(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = text.analyze(docs)
    assert out.count() == docs.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    topk = similarity.cosine_topk(emb, q, k=5)
    assert topk.count() == 15


def test_embedding_neardup_negative_ids(spark):
    # regression: block partitioning must use pmod — rows with negative
    # ids previously hashed to negative buckets and were silently dropped
    rng = np.random.RandomState(11)
    base = rng.randn(10, 8).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.randn(8).astype(np.float32)
    rows = [(i - 5, [float(x) for x in base[i]]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.95, dim=8).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(-5, -4)}


def test_jaccard_null_text(spark):
    # regression: the Arrow shingler must propagate NULL text like the
    # Column path ([''] shingle) instead of raising AttributeError
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, None),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert (3, 4) in got  # two null docs share the '' shingle


def test_neardup_gemm_matches_expr_and_numpy(spark):
    # the GEMM candidate path must agree exactly with the independent
    # codegen equi-join path AND a numpy brute-force at the contract
    # threshold (0.4) on the real embeddings table
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    gemm = {
        (r["id_a"], r["id_b"]): r["cos_bp"]
        for r in dedup.embedding_neardup_pairs(
            emb, threshold=0.4, dim=64, method="gemm"
        ).collect()
    }
    expr = {
        (r["id_a"], r["id_b"]): r["cos_bp"]
        for r in dedup.embedding_neardup_pairs(
            emb, threshold=0.4, dim=64, method="expr"
        ).collect()
    }
    assert gemm == expr and len(gemm) > 0
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    ids = sorted(vecs)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            va, vb = vecs[a], vecs[b]
            cos = np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
            if np.floor(cos * 10000) >= 4000 - 1:  # 1bp tolerance band
                brute.add((a, b))
    # every found pair is near-threshold-or-above in numpy terms, and
    # no clearly-above-threshold pair is missed
    assert set(gemm) <= brute
    strict = {p for p in brute
              if np.floor(np.dot(vecs[p[0]], vecs[p[1]])
                          / (np.linalg.norm(vecs[p[0]]) * np.linalg.norm(vecs[p[1]]))
                          * 10000) >= 4001}
    assert strict <= set(gemm)


def test_neardup_lsh_high_threshold(spark):
    # at high thresholds the hyperplane-bucket path is the scale
    # answer; on the tiny planted set it must find the 0.99-cos pair
    rng = np.random.RandomState(3)
    base = rng.randn(40, 16).astype(np.float32)
    base[1] = base[0] + 0.02 * rng.randn(16).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in dedup.embedding_neardup_pairs(
        emb, threshold=0.9, dim=16, method="gemm").collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in dedup.embedding_neardup_pairs(
        emb, threshold=0.9, dim=16, method="lsh").collect()}
    assert (0, 1) in exact
    assert lsh == exact  # recall 1.0 at this threshold


def test_winnow_fingerprints(spark, docs):
    import hashlib
    import re

    out = text.winnow_fingerprints(docs, k=3, w=4)
    rows = out.collect()
    assert out.columns == ["doc_id", "fp"]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])

    # pure-python reference (same scheme) on doc 1
    def ref_fps(t, k=3, w=4):
        norm = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        toks = norm.split(" ")
        grams = (
            [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
            if len(toks) >= k else [" ".join(toks)]
        )
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        if len(hs) <= w:
            return {min(hs)}
        return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    texts = {1: "the quick brown fox jumps over the lazy dog near the river bank",
             2: "the quick brown fox jumps over the lazy dog near the river bend",
             4: "completely different content about spark query engines and joins"}
    for d, t in texts.items():
        assert by_doc[d] == ref_fps(t)
    # identical docs share all fingerprints; near-identical share >=1
    assert by_doc[1] == by_doc[3]
    assert by_doc[1] & by_doc[2]
    # winnowing guarantee: any shared run of >= w+k-1 tokens shares a
    # fingerprint -- docs 1/2 share an 11-token prefix >= 6
    assert not (by_doc[1] & by_doc[4])
    # empty text still yields exactly one fingerprint (hash of "")
    assert by_doc[6] == {int(hashlib.md5(b"").hexdigest()[:15], 16)}


def test_hash_sample_deterministic(spark, docs):
    from morph_xr2rml_spark.ops import sample

    a = sorted(r["doc_id"] for r in sample.hash_sample(docs, 0.5).collect())
    b = sorted(
        r["doc_id"]
        for r in sample.hash_sample(docs.repartition(7), 0.5).collect()
    )
    assert a == b  # partitioning-independent, unlike DataFrame.sample
    assert sample.hash_sample(docs, 0.0).count() == 0
    assert sample.hash_sample(docs, 1.0).count() == docs.count()


def test_stratified_sample(spark):
    from morph_xr2rml_spark.ops import sample

    rows_ = [(i, "txt", "en" if i % 2 == 0 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows_, "doc_id long, text string, lang string")
    out = sample.stratified_sample(
        df, {"en": 1.0, "fr": 0.0}, strata_col="lang"
    )
    got = out.groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == {"en": 1000}
    # approximate fractions hold per stratum
    half = sample.stratified_sample(df, {"en": 0.5}, default_fraction=0.25)
    counts = {r["lang"]: r["count"] for r in half.groupBy("lang").count().collect()}
    assert abs(counts["en"] - 500) < 100 and abs(counts["fr"] - 250) < 100


def test_split_disjoint_and_stable(spark):
    from morph_xr2rml_spark.ops import sample

    df = spark.createDataFrame(
        [(i,) for i in range(3000)], "doc_id long"
    )
    s3 = sample.split(df, [0.8, 0.1, 0.1])
    counts = {r["split_id"]: r["count"] for r in s3.groupBy("split_id").count().collect()}
    assert set(counts) == {0, 1, 2}
    assert abs(counts[0] - 2400) < 150
    # every row in exactly one split
    assert sum(counts.values()) == 3000
    # stability: collapsing the last two splits never moves rows across
    # the first boundary
    s2 = sample.split(df, [0.8, 0.2])
    first3 = {r["doc_id"] for r in s3.where("split_id = 0").collect()}
    first2 = {r["doc_id"] for r in s2.where("split_id = 0").collect()}
    assert first3 == first2


def test_winnow_guarantee_property():
    """Winnowing guarantee (Schleimer et al. 2003): two texts sharing a
    run of >= w+k-1 tokens share at least one fingerprint. Pure-python
    property check of the scheme the UDF implements (Spark parity is
    pinned by test_winnow_fingerprints and the driver oracle)."""
    import hashlib
    import re as _re

    from hypothesis import given, settings, strategies as st

    k, w = 3, 4

    def fps(toks):
        grams = (
            [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
            if len(toks) >= k else [" ".join(toks)]
        )
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        if len(hs) <= w:
            return {min(hs)}
        return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    tok = st.text(alphabet="abcd", min_size=1, max_size=3)

    @settings(max_examples=200, deadline=None)
    @given(
        shared=st.lists(tok, min_size=k + w - 1, max_size=10),
        pre_a=st.lists(tok, max_size=5),
        post_a=st.lists(tok, max_size=5),
        pre_b=st.lists(tok, max_size=5),
        post_b=st.lists(tok, max_size=5),
    )
    def check(shared, pre_a, post_a, pre_b, post_b):
        a = pre_a + shared + post_a
        b = pre_b + shared + post_b
        assert fps(a) & fps(b)

    check()


def test_vocab_topk(spark, docs):
    out = text.vocab_topk(docs, k=3).collect()
    assert [r["token"] for r in out][0] == "the"  # most frequent
    assert all(out[i]["n"] >= out[i + 1]["n"] for i in range(len(out) - 1))
    # ties broken lexicographically
    for i in range(len(out) - 1):
        if out[i]["n"] == out[i + 1]["n"]:
            assert out[i]["token"] < out[i + 1]["token"]


def test_ppm_decoder_variants():
    """Pure-Python Netpbm decoder: P6/P5 binary, P3/P2 ASCII, header
    comments, and the error paths (bad magic, truncation, wide maxval)."""
    import numpy as np

    pix = bytes(range(24))
    arr = multimodal.decode_ppm(b"P6\n4 2\n255\n" + pix)
    assert arr.shape == (2, 4, 3) and bytes(arr.reshape(-1)) == pix
    g = multimodal.decode_ppm(b"P5\n# a comment\n4 2\n255\n" + pix[:8])
    assert g.shape == (2, 4) and bytes(g.reshape(-1)) == pix[:8]
    a3 = multimodal.decode_ppm(
        b"P3\n2 1\n255\n" + b" ".join(str(v).encode() for v in pix[:6])
    )
    assert a3.shape == (1, 2, 3) and a3.reshape(-1).tolist() == list(pix[:6])
    a2 = multimodal.decode_ppm(b"P2 2 2 255 9 8 7 6")
    assert a2.reshape(-1).tolist() == [9, 8, 7, 6]
    # P6 pixel data may start with a byte that looks like whitespace:
    # only ONE separator byte after maxval is consumed
    sp = bytes([32, 10, 13]) * 4
    arr = multimodal.decode_ppm(b"P6\n2 2\n255\n" + sp)
    assert bytes(arr.reshape(-1)) == sp
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P7\n1 1\n255\nxxx")
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n4 2\n255\n" + pix[:10])
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n1 1\n65535\n" + pix[:6])
    # decode_image dispatches Netpbm payloads to the real decoder
    assert np.array_equal(
        multimodal.decode_image(b"P6\n4 2\n255\n" + pix),
        multimodal.decode_ppm(b"P6\n4 2\n255\n" + pix),
    )


def test_wav_decoder_widths():
    """stdlib-wave PCM decoder: 8/16-bit widths normalize to
    [-1, 1) float32; non-RIFF payloads raise."""
    import io
    import struct
    import wave

    import numpy as np

    def make(width, frames):
        bio = io.BytesIO()
        with wave.open(bio, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(8000)
            w.writeframes(frames)
        return bio.getvalue()

    s8 = multimodal.decode_audio(make(1, bytes([0, 128, 255])))
    assert np.allclose(s8, [(0 - 128) / 128, 0.0, 127 / 128])
    s16 = multimodal.decode_audio(
        make(2, struct.pack("<3h", -32768, 0, 32767))
    )
    assert np.allclose(s16, [-1.0, 0.0, 32767 / 32768])
    assert s16.dtype == np.float32
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"OggS....")


def test_real_payload_decode_end_to_end(spark, docs):
    """attach_real_payload synthesizes parseable P6/WAVE bytes with
    pure Column expressions; extract_features(fake=False) drives the
    REAL decoders inside mapInPandas and the histograms land in the
    value bins the md5-hex alphabet implies (digits -> bin 3 images /
    bins 8-15 audio; hex letters -> bin 6 images)."""
    media = multimodal.attach_real_payload(docs)
    feats = {r["doc_id"]: r for r in
             multimodal.extract_features(media, fake=False).collect()}
    for doc_id, r in feats.items():
        v = r["features"]
        assert abs(sum(v) - 1.0) < 1e-5
        if doc_id % 2 == 0:  # P6 image: 192 hex-char pixels
            assert r["n_bytes"] == 203
            assert v[3] + v[6] == pytest.approx(1.0)
        else:  # WAVE: 64 positive small samples
            assert r["n_bytes"] == 172
            assert sum(v[8:]) == pytest.approx(1.0)
    # decode is the real parser: corrupting the header must throw
    bad = media.withColumn(
        "payload", F.concat(F.lit(b"XX"), F.col("payload"))
    )
    with pytest.raises(Exception):
        multimodal.extract_features(bad, fake=False).collect()
