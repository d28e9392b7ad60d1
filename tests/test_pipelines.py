"""Training-data pipeline operator tests (dx/pipelines/*): semantic
behavior on planted fixtures — near-dups are FOUND, non-dups are not —
complementing the driver's value-hash oracle (dx/queries_td.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dx.pipelines import dedup as pdedup
from dx.pipelines import multimodal as pmm
from dx.pipelines import similarity as sim
from dx.pipelines import text as ptext

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the mouse runs through the old wooden house"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-token edit = near-dup
FAR = (
    "completely different words about spark shuffles partitions and "
    "broadcast joins with adaptive execution planning at large scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, NEAR), (2, FAR), (3, BASE)], "doc_id long, text string"
    )


def test_exact_dedup_clusters(docs):
    rows = {r["text_md5"]: r for r in pdedup.exact_clusters(docs).collect()}
    counts = sorted(r["n_docs"] for r in rows.values())
    assert counts == [1, 1, 2]  # docs 0 and 3 identical
    dup = next(r for r in rows.values() if r["n_docs"] == 2)
    assert dup["keeper"] == 0


def test_minhash_lsh_finds_near_dup_pair(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in pdedup.candidate_pairs(docs).collect()
    }
    assert (0, 3) in pairs          # exact dup always collides
    assert (0, 1) in pairs          # one-token edit shares bands
    assert (0, 2) not in pairs      # unrelated text does not
    assert (1, 2) not in pairs


def test_jaccard_verifies_candidates(docs):
    pairs = docs.sparkSession.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long"
    )
    out = {(r["doc_a"], r["doc_b"]): r for r in
           pdedup.jaccard_pairs(docs, pairs).collect()}
    assert out[(0, 3)]["jaccard_bps"] == 10000      # identical
    assert out[(0, 1)]["jaccard_bps"] > 8000        # near-dup
    assert out[(0, 2)]["jaccard_bps"] < 500         # unrelated


def test_simhash_hamming_locality(docs):
    vals = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", ptext.simhash16(F.col("text")).alias("sh")).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert vals[0] == vals[3]
    assert ham(vals[0], vals[1]) <= 4
    assert ham(vals[0], vals[2]) >= ham(vals[0], vals[1])


def test_text_stats_and_lang(docs):
    st = ptext.quality_stats(F.col("text"))
    row = docs.filter("doc_id = 0").select(
        *[v.alias(k) for k, v in st.items()],
        ptext.predicted_lang(F.col("text")).alias("lang"),
    ).collect()[0]
    n_tok = len(BASE.split())
    assert row["n_tokens"] == n_tok
    assert row["n_chars_calc"] == len(BASE)
    assert row["lang"] == "en"      # 'the' dominates
    assert 0 < row["distinct_ratio_bps"] <= 10000


def test_fingerprint_shared_substring(docs):
    fp = {r["doc_id"]: r["fp"] for r in docs.select(
        "doc_id", ptext.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fp[0] == fp[3]           # identical docs, identical fingerprint
    assert fp[0] != fp[2]


@pytest.fixture(scope="module")
def vectors(spark):
    import math
    rows = []
    for i in range(50):
        base = [math.sin(0.1 * i * (d + 1)) * 0.4 for d in range(64)]
        rows.append((i, base, i % 5))
    # vec 100 = tiny perturbation of vec 7 → its nearest neighbor
    rows.append((100, [x + 0.001 for x in rows[7][1]], 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_finds_planted_neighbor(vectors):
    top = sim.cosine_topk(vectors, query_id=100, k=3).collect()
    assert top[0]["vec_id"] == 7
    assert top[0]["cos_bps"] >= 9990


def test_lsh_buckets_collide_for_neighbors(vectors):
    planes = sim.hyperplanes(8)
    b = vectors.select(
        "vec_id", sim.sign_lsh_bucket(sim.quantize(F.col("embedding")), planes).alias("b")
    )
    vals = {r["vec_id"]: r["b"] for r in b.collect()}
    assert vals[100] == vals[7]     # perturbed copy lands in same bucket
    assert 0 <= vals[7] < 256


def test_multimodal_decode_plumbing(docs):
    out = pmm.decode_documents(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(out.columns) == {
        "doc_id", "payload_len", "format", "width", "height",
        "feature_sha", "feature_md5",
    }
    assert all(r["payload_len"] == 16 for r in rows.values())
    assert all(1 <= r["width"] <= 640 and 1 <= r["height"] <= 480 for r in rows.values())
    assert rows[0]["feature_sha"] == rows[3]["feature_sha"]  # same text, same payload
    assert rows[0]["format"] in ("png", "jpeg")
    # determinism across runs
    again = {r["doc_id"]: r["feature_sha"] for r in pmm.decode_documents(docs).collect()}
    assert again == {k: r["feature_sha"] for k, r in rows.items()}
    # feature hashes cross-checked against hashlib on the known payload
    import hashlib

    payload = bytes.fromhex(hashlib.md5(BASE.encode()).hexdigest())
    assert rows[0]["feature_sha"] == hashlib.sha256(payload).hexdigest()
    assert rows[0]["feature_md5"] == hashlib.md5(payload.hex().encode()).hexdigest()


def test_fingerprint_df_matches_column_form(docs, spark):
    """The explode→min-agg scale form must equal the interpreted
    array_min spec form, including the NULL-for-short-doc case."""
    with_short = docs.union(
        spark.createDataFrame([(9, "tiny")], "doc_id long, text string")
    )
    spec = {r["doc_id"]: r["fp"] for r in with_short.select(
        "doc_id", ptext.fingerprint(F.col("text")).alias("fp")).collect()}
    fast = {r["doc_id"]: r["fp"] for r in
            ptext.fingerprint_df(with_short).collect()}
    assert fast == spec
    assert fast[9] is None


def test_candidate_pairs_bucket_cap(docs, spark):
    """A degenerate bucket above the cap is excluded from pair gen and
    surfaced by oversize_buckets instead of going quadratic."""
    clones = spark.createDataFrame(
        [(100 + i, BASE) for i in range(6)], "doc_id long, text string"
    )
    crowd = docs.union(clones)  # 8 copies of BASE → every BASE band bucket has 8 docs
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in pdedup.candidate_pairs(crowd, max_bucket_size=4).collect()
    }
    assert not any(a in (0, 3) or a >= 100 for a, b in capped)  # clones dropped
    over = pdedup.oversize_buckets(crowd, max_bucket_size=4).collect()
    assert over and all(r["n_docs"] >= 8 for r in over)  # NEAR may join a band
    # uncapped still finds them (cap=None disables)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in pdedup.candidate_pairs(crowd, max_bucket_size=None).collect()
    }
    assert (0, 3) in full and (100, 101) in full


def test_ivf_assignment_and_probe(vectors):
    """IVF coarse quantizer: every vector lands in exactly one of k
    lists; a perturbed copy shares its original's list; probing the
    query's top lists finds the planted nearest neighbor."""
    cents = sim.ivf_centroids(vectors, k=8)
    assert len(cents) == 8
    a = {r["vec_id"]: r["centroid"] for r in sim.ivf_assign(vectors, cents).collect()}
    assert len(a) == vectors.count()
    assert all(0 <= c < 8 for c in a.values())
    assert a[100] == a[7]               # near-identical vectors, same list
    top = sim.ivf_topk(vectors, query_id=100, k=3, n_lists=8, nprobe=2).collect()
    assert top and top[0]["vec_id"] == 7
    assert top[0]["cos_bps"] >= 9990


def test_ivf_assign_matmul_equivalence(vectors):
    """The pandas-UDF matmul form of ivf_assign (production k) is
    bit-identical to the HOF form — same centroid AND same winning
    dot_q for every vector, including the argmax-ties-to-first rule
    (array_position semantics)."""
    cents = sim.ivf_centroids(vectors, k=16)
    hof = {r["vec_id"]: (r["centroid"], r["dot_q"])
           for r in sim.ivf_assign(vectors, cents, impl="hof").collect()}
    mm = {r["vec_id"]: (r["centroid"], r["dot_q"])
          for r in sim.ivf_assign(vectors, cents, impl="matmul").collect()}
    assert hof == mm
    # exercise the tie rule explicitly: duplicate centroid 0 as
    # centroid k — every vector scoring max on it must pick index 0
    dup = cents + [cents[0]]
    mm2 = sim.ivf_assign(vectors, dup, impl="matmul").collect()
    hof2 = sim.ivf_assign(vectors, dup, impl="hof").collect()
    m2 = {r["vec_id"]: (r["centroid"], r["dot_q"]) for r in mm2}
    h2 = {r["vec_id"]: (r["centroid"], r["dot_q"]) for r in hof2}
    assert m2 == h2
    assert all(c != len(dup) - 1 for c, _ in m2.values())


def test_multimodal_decode_routes_pil_or_fake():
    """_decode: real image bytes go through PIL when it's installed
    (real format/dims); non-image bytes fall back to the deterministic
    fake in BOTH environments, so fixture outputs are identical with
    and without the codec library."""
    import base64
    import hashlib as hl

    png_1x1 = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    fmt, w, h = pmm._decode(png_1x1)
    if pmm.HAS_PIL:
        assert (fmt, w, h) == ("png", 1, 1)
    else:
        assert (fmt, w, h) == pmm._fake_decode(png_1x1)
    blob = hl.md5(b"not an image").digest()  # the repo's payload shape
    assert pmm._decode(blob) == pmm._fake_decode(blob)
