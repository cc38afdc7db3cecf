"""Similarity search + text analysis + multimodal plumbing."""

from __future__ import annotations

import math

import numpy as np
import pytest

from zestdb_spark.functions import multimodal, similarity, textstats


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(50)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_cosine_topk_matches_numpy(embs):
    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in embs.collect()}
    q = data[0]
    sims = sorted(
        ((float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), i) for i, v in data.items() if i != 0),
        key=lambda t: (-t[0], t[1]),
    )
    expected = [i for _, i in sims[:5]]
    got = [r["vec_id"] for r in similarity.cosine_topk(embs, 0, 5).collect()]
    assert got == expected


def test_cosine_topk_excludes_query_and_bounds(embs):
    out = similarity.cosine_topk(embs, 0, 10).collect()
    assert all(r["vec_id"] != 0 for r in out)
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in out)


def test_lsh_topk_subset_of_exact_scores(embs):
    exact = {r["vec_id"]: r["cosine"] for r in similarity.cosine_topk(embs, 0, 49).collect()}
    approx = similarity.lsh_topk(embs, 0, 5, nbits=6, dim=8).collect()
    assert len(approx) > 0
    for r in approx:  # cosines must be the exact values (re-ranked exactly)
        assert math.isclose(exact[r["vec_id"]], r["cosine"], abs_tol=1e-9)


def test_ivf_topk_exact_scores_and_probe_scaling(embs):
    """IVF: in-list scores are the exact cosines; probing every list
    recovers the exact top-k; assignment covers every vector once."""
    exact = {r["vec_id"]: r["cosine"] for r in similarity.cosine_topk(embs, 0, 49).collect()}
    approx = similarity.ivf_topk(embs, 0, 5, n_centroids=8, n_probe=2).collect()
    assert 0 < len(approx) <= 5
    for r in approx:
        assert math.isclose(exact[r["vec_id"]], r["cosine"], abs_tol=1e-9)
    # full probe width == brute force
    full = [r["vec_id"] for r in similarity.ivf_topk(embs, 0, 5, 8, 8).collect()]
    want = [r["vec_id"] for r in similarity.cosine_topk(embs, 0, 5).collect()]
    assert full == want
    assigned = similarity.ivf_assign(embs, 8)
    assert assigned.count() == 50
    assert assigned.select("cent").distinct().count() <= 8


def test_ivf_train_improves_quantization(embs):
    """Spherical k-means: trained codebook is deterministic and its
    mean in-cluster cosine is at least the sampled codebook's."""
    import numpy as np

    def mean_cos(codebook):
        assigned = similarity.ivf_assign(embs, 8, codebook=codebook).collect()
        cents = {int(c["vec_id"]): np.asarray(c["v"]) / c["norm"] for c in codebook}
        vals = [
            float(np.dot(np.asarray(r["v"]) / r["norm"], cents[r["cent"]]))
            for r in assigned
        ]
        return sum(vals) / len(vals)

    sampled = similarity._ivf_centroids(embs, 8)
    trained = similarity.ivf_train(embs, 8, iters=2)
    trained2 = similarity.ivf_train(embs, 8, iters=2)
    assert [c["v"] for c in trained] == [c["v"] for c in trained2]  # deterministic
    assert mean_cos(trained) >= mean_cos(sampled) - 1e-9

    out = similarity.ivf_topk(embs, 0, 5, 8, 3, codebook=trained).collect()
    exact = {r["vec_id"]: r["cosine"] for r in similarity.cosine_topk(embs, 0, 49).collect()}
    for r in out:  # scores stay exact regardless of codebook
        assert math.isclose(exact[r["vec_id"]], r["cosine"], abs_tol=1e-9)


def test_lsh_bucketed_pairs_are_exact_cosines(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.99, 0.05]), (3, [-1.0, 0.0])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.lsh_bucketed_pairs(e, tau=0.9, nbits=4, dim=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


# ------------------------------------------------------------- textstats

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat is on the mat"),
        (2, "el perro y el gato en la casa de la abuela"),
        (3, "xyzzy plugh"),
        (4, "Der Hund und die Katze sind von der Stadt"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_token_count(docs):
    got = {r["doc_id"]: r["n_tokens"] for r in textstats.token_count(docs).collect()}
    assert got == {1: 6, 2: 11, 3: 2, 4: 9}


def test_quality_score_ranges(docs):
    for r in textstats.quality_score(docs).collect():
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["score"] <= 1.0


def test_lang_id(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "und"
    assert got[4] == "de"  # lowercase 'und'/'die'/'der'/'von' hits


def test_fingerprint_normalizes_whitespace_and_case(spark):
    d = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " hello   WORLD ")],
        "doc_id long, text string",
    )
    fps = [r["fp"] for r in textstats.fingerprint(d).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]


# ------------------------------------------------------------- multimodal

def test_extract_features_via_mapinpandas(spark):
    assets = spark.createDataFrame(
        [(1, "image", bytearray(b"PNGDATA_FAKE_BYTES"), "image/png")],
        "asset_id long, kind string, payload binary, mime string",
    )
    out = multimodal.extract_features(assets).collect()
    assert out[0]["byte_len"] == 18
    assert out[0]["head_hex"] == b"PNGDATA_".hex().upper()


def test_decode_media_real_and_typed_unsupported():
    """decode_media is REAL for the dependency-free subset (r2,
    media_codecs.py) and raises a typed error for codec-lib formats."""
    from zestdb_spark.functions.media_codecs import UnsupportedMedia, encode_wav

    import numpy as np

    out = multimodal.decode_media(encode_wav(np.ones(80, dtype=np.int16), 8000), None)
    assert out["kind"] == "audio" and out["sample_rate"] == 8000
    with pytest.raises(UnsupportedMedia):
        multimodal.decode_media(b"x", "image/png")


def test_frame_sample(spark):
    assets = spark.createDataFrame(
        [(1, "video", bytearray(b"x" * 200), "video/mp4")],
        "asset_id long, kind string, payload binary, mime string",
    )
    rows = multimodal.frame_sample(assets, every_n_bytes=64).collect()
    assert [r["byte_offset"] for r in rows] == [0, 64, 128]


def test_kmeans_seed_recovers_planted_clusters(spark):
    """Three well-separated planted directions with ids adversarially
    cluster-major (the first k ids all sit in ONE cluster — exactly the
    failure mode of smallest-id init): farthest-point seeding + Lloyd
    must land one centroid per planted cluster with balanced cells."""
    rng = np.random.default_rng(11)
    rows = []
    for c in range(3):
        for j in range(30):
            v = np.zeros(8)
            v[c] = 1.0
            v = v + 0.08 * rng.standard_normal(8)
            rows.append((c * 30 + j, [float(x) for x in v]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cb = similarity.ivf_train(embs, 3, iters=2)  # init="fps" default
    assert [c["vec_id"] for c in cb] == [
        c["vec_id"] for c in similarity.ivf_train(embs, 3, iters=2)
    ]  # deterministic
    assigned = similarity.ivf_assign(embs, 3, codebook=cb).collect()
    cells: dict[int, set[int]] = {}
    sizes: dict[int, int] = {}
    for r in assigned:
        planted = r["vec_id"] // 30
        cells.setdefault(int(r["cent"]), set()).add(planted)
        sizes[int(r["cent"])] = sizes.get(int(r["cent"]), 0) + 1
    # pure 1:1 recovery, 30/30/30 balance
    assert len(cells) == 3 and all(len(s) == 1 for s in cells.values())
    assert sorted(sizes.values()) == [30, 30, 30]

    # contrast: the legacy smallest-id INIT seeds all three centroids
    # inside planted cluster 0 (ids 0,1,2) — before Lloyd it cannot
    # separate the data (documents why fps is the default)
    legacy = similarity.ivf_train(embs, 3, iters=0, init="ids")
    legacy_cells = {
        int(r["cent"])
        for r in similarity.ivf_assign(embs, 3, codebook=legacy).collect()
        if r["vec_id"] >= 30  # clusters 1 and 2
    }
    seeded_in_0 = {c["vec_id"] for c in legacy}
    assert seeded_in_0 == {0, 1, 2}
