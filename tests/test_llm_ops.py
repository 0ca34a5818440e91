"""LLM-pipeline operator semantics: dedup finds the known near-dups, ANN
recall vs brute force, multimodal stub plumbing shapes, streaming windows
match their batch oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators import (
    dedup,
    multimodal,
    similarity,
)
from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_ORACLE, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_ORACLE, "embeddings")


def test_exact_dedup_identity_on_unique_corpus(docs):
    out = dedup.exact_dedup(docs)
    n_docs = docs.count()
    assert out.count() == n_docs or out.agg(F.sum("n_copies")).collect()[0][0] == n_docs


def test_minhash_finds_high_jaccard_pairs(docs):
    """Every pair with exact 3-gram Jaccard >= 0.9 must be an LSH candidate
    (16 hashes, 8 bands x 2 rows: P(miss) = (1-j^2)^8 < 1e-5 at j=0.9)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert exact, "fixture should contain near-duplicate docs"
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_dedup_pairs(
            docs, num_hashes=16, bands=8, rows_per_band=2
        ).collect()
    }
    missed = exact - lsh
    assert not missed, f"LSH missed near-exact dup pairs: {missed}"


def test_minhash_estimates_jaccard(spark):
    """Property of the md5-permutation family: the fraction of agreeing
    signature positions is an unbiased estimator of shingle-Jaccard.
    Synthetic doc pairs with controlled overlap; 16 hashes -> sd ~= 0.12,
    assert within 3 sd."""
    import math

    base = [f"w{i}" for i in range(300)]
    rows = []
    expected = {}
    for pair_id, keep in enumerate((0.9, 0.7, 0.5)):
        n_keep = int(len(base) * keep)
        a_toks = base
        b_toks = base[:n_keep] + [f"x{pair_id}_{i}" for i in range(len(base) - n_keep)]
        rows.append((pair_id * 2, " ".join(a_toks)))
        rows.append((pair_id * 2 + 1, " ".join(b_toks)))
        expected[pair_id] = (pair_id * 2, pair_id * 2 + 1)
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sh = dedup.shingles(df, n=3)
    sigs = {
        r["doc_id"]: r["sig"]
        for r in dedup.minhash_signatures(sh, num_hashes=16).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    for pair_id, (a, b) in expected.items():
        agree = sum(
            1 for x, y in zip(sigs[a], sigs[b]) if x == y
        ) / 16.0
        true_j = jac[(a, b)]
        sd = math.sqrt(true_j * (1 - true_j) / 16)
        assert abs(agree - true_j) <= 3 * sd + 1e-9, (
            pair_id, agree, true_j
        )


def test_lsh_bucket_cap_hot_bucket_linear(spark):
    """Boilerplate skew: 200k identical signatures put every doc in the
    same bucket of every band. The capped path must complete with LINEAR
    output (star pairs via the exact-fingerprint fallback, n-1 not
    C(n,2) ~ 2e10), report the dup group fully connected, and surface the
    oversized buckets through the free observation metrics."""
    from pyspark.sql import Observation

    n = 200_000
    sig = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array(*[F.lit(i * 7 + 1).cast("long") for i in range(16)]).alias(
            "sig"
        ),
    )
    obs = Observation("lsh_cap")
    pairs = dedup.lsh_candidate_pairs(
        sig, bands=8, rows_per_band=2, max_bucket_size=64, observation=obs
    )
    assert pairs.count() == n - 1
    m = obs.get
    assert m["oversized_buckets"] == 8  # one hot bucket per band
    assert m["max_bucket_size_seen"] == n
    # every star pair anchors at the min doc id -> one connected component
    lo, hi = pairs.agg(F.min("doc_a"), F.max("doc_a")).collect()[0]
    assert (lo, hi) == (0, 0)


def test_lsh_cap_no_behavior_change_on_fixture(docs):
    """Fixture buckets are far below the default cap: the capped operator
    must emit exactly the pairs the uncapped expansion emits."""
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_dedup_pairs(docs).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_dedup_pairs(
            docs, max_bucket_size=1_000_000_000
        ).collect()
    }
    assert capped == uncapped


def test_ngram_df_cap_bounds_stop_shingle_join(spark):
    """200 docs share one boilerplate shingle but are otherwise disjoint:
    without the document-frequency cap the stop-shingle alone emits
    ~C(200,2) pairs; with it those pairs vanish while a genuine near-dup
    pair (many shared RARE shingles) survives."""
    rows = [
        (i, f"the quick brown unique{i}a unique{i}b unique{i}c")
        for i in range(200)
    ]
    rows.append((500, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((501, "alpha beta gamma delta epsilon zeta eta theta iota"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.ngram_jaccard_pairs(
        df, threshold=0.1, max_doc_freq=None
    )
    assert uncapped.count() > 19_000  # quadratic stop-shingle blowup
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(
            df, threshold=0.1, max_doc_freq=50
        ).collect()
    }
    assert (500, 501) in capped
    assert not [p for p in capped if p[0] < 200 and p[1] < 200]


def test_embedding_neardup_tiled_matches_single_block(emb):
    """The block-pair GEMM must be tiling-invariant: forcing many small
    blocks (B ~ 20, every cross-block pair exercised) yields exactly the
    single-block answer. Guards the diagonal-triangle vs cross-block
    dedup logic and proves task memory is bounded by rows_per_block, not
    corpus size — no driver-side corpus materialization exists at all."""
    import inspect

    # driver-RSS bound by construction: the operator must never collect
    # the corpus to the driver (the r01 design did, capped at 2M rows)
    src = inspect.getsource(dedup.embedding_neardup_pairs)
    assert "toPandas" not in src and "sc.broadcast" not in src
    single = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in dedup.embedding_neardup_pairs(
            emb, threshold=0.4, rows_per_block=1_000_000_000
        ).collect()
    }
    tiled = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in dedup.embedding_neardup_pairs(
            emb, threshold=0.4, rows_per_block=100
        ).collect()
    }
    assert single, "fixture should contain near-dup embeddings"
    assert tiled == single


def test_fuzzy_edit1_pairs_complete_vs_brute_force(spark):
    """Deletion-neighborhood candidates must find EVERY distance-1 pair
    (substitution, insertion, deletion) and nothing else — checked
    against a brute-force Levenshtein over a crafted vocab with typos,
    transpositions (distance 2 — excluded) and unrelated words."""
    from customer_segmentation_pyspark_spark.operators.textops import (
        fuzzy_edit1_pairs,
    )

    vocab = [
        "spark", "spork", "sparks", "park", "shark", "sprk",
        "flink", "blink", "clink", "think",
        "query", "quary", "queryy", "qeury",  # qeury = transposition (d2)
        "data", "date", "gate", "dta",
    ]
    df = spark.createDataFrame([(w,) for w in vocab], "name string")
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_edit1_pairs(df, "name").collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    expected = set()
    for i, x in enumerate(vocab):
        for y in vocab[i + 1:]:
            if lev(x, y) == 1:
                expected.add((min(x, y), max(x, y)))
    assert ("qeury", "query") not in got  # transposition is distance 2
    assert got == expected and got


def test_simhash_similar_docs_close_hamming(docs):
    """Near-dup pairs (Jaccard >= 0.9) should have small SimHash Hamming
    distance; random pairs should average ~bits/2."""
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.9)
    fps = dedup.simhash(docs, bits=16)
    joined = (
        pairs.join(fps.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("simhash", "sh_a")
        .join(
            fps.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "simhash", "sh_b"
            ),
            "doc_b",
        )
        .select(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("ham"))
        .collect()
    )
    assert joined
    avg_ham = sum(r["ham"] for r in joined) / len(joined)
    assert avg_ham <= 4, f"near-dups should be close in simhash, got {avg_ham}"


def test_ann_lsh_recall_vs_brute_force(emb):
    """Multi-table ANN recall@5 against the exact baseline on 20 queries.
    The fixture embeddings are weakly clustered (top-5 cosine ~0.3-0.4),
    the hard case for hyperplane LSH. 16 tables x 3 bits measures 0.98
    recall here; the 0.7 bar is tight enough to catch a sign/packing
    error in the hyperplane hash (which craters recall to ~bucket
    collision rate) while staying robust to plane-seed variance. Also
    check every returned similarity matches the exact computation."""
    q = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, q, k=5).collect()
    planes = np.random.RandomState(7).normal(size=(48, 64)).tolist()
    approx = similarity.lsh_topk_cosine(
        emb, q, planes, k=5, bits_per_table=3
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.7, f"ANN recall too low: {recall}"
    exact_sims = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sims:
            assert abs(r["cos_sim"] - exact_sims[key]) < 1e-6


def test_ivf_recall_vs_brute_force(emb):
    """IVF with 16 cells / 8 probes rescored exactly: measures 0.80
    recall on the weakly-clustered fixture (seeded k-means, fully
    deterministic); the 0.7 bar catches a cell-assignment or probe-
    ranking regression. All returned similarities must be exact."""
    q = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, q, k=5).collect()
    approx = similarity.ivf_topk_cosine(
        emb, q, n_cells=16, n_probe=8, k=5
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.7, f"IVF recall too low: {recall}"
    exact_sims = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sims:
            assert abs(r["cos_sim"] - exact_sims[key]) < 1e-6


def test_multimodal_decode_stub_schema_and_determinism(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    payload = multimodal.with_binary_payload(docs)
    out1 = multimodal.decode_image_stub(payload)
    assert [f.name for f in out1.schema.fields] == [
        "doc_id", "n_bytes", "width", "height", "channels", "mean_intensity",
    ]
    rows1 = sorted(out1.collect(), key=lambda r: r["doc_id"])
    rows2 = sorted(
        multimodal.decode_image_stub(payload).collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows1 == rows2
    assert all(r["n_bytes"] > 0 for r in rows1)


def test_chunking_covers_all_tokens(docs):
    """Chunk windows tile every document: sum of (chunk_tokens - overlap)
    + final overlap == doc token count; first chunk starts at token 0."""
    from customer_segmentation_pyspark_spark.operators.textops import (
        chunk_documents,
        token_count,
    )

    chunks = chunk_documents(docs, chunk_tokens=100, overlap=20).collect()
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", token_count(F.col("text")).alias("n")
        ).collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tokens)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        n = n_tokens[doc_id]
        # each chunk starts at chunk_id*80; last chunk reaches the end
        last = rows[-1]
        assert last["chunk_id"] * 80 + last["chunk_tokens"] == n
        for r in rows[:-1]:
            assert r["chunk_tokens"] == 100


def test_stratified_sample_fractions(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    fractions = {"A": 0.1, "N": 0.02, "R": 0.1}
    sampled = {
        r["l_returnflag"]: r["n"]
        for r in li.sampleBy("l_returnflag", fractions, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    totals = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for flag, frac in fractions.items():
        got = sampled.get(flag, 0) / totals[flag]
        assert abs(got - frac) < frac * 0.5 + 0.01, (flag, got, frac)


def test_approx_distinct_within_tolerance(spark):
    """HLL++ estimates within 5% of exact (default rsd 0.05)."""
    li = load_table(spark, SF_ORACLE, "lineitem")
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))
        .collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.1, (k, approx[k], n)


def test_multimodal_real_decode_is_stubbed():
    """The NotImplementedError branch is reached ONLY when no codec is
    importable (r04: Pillow auto-activates the seam when present)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present — seam activates instead of raising")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"\xff\xd8\xff\xe0JFIF")  # JPEG
    # a PNG outside the native 8-bit scope (16-bit depth) also needs a
    # codec: UnsupportedPngError is rethrown as the seam's miss
    deep = bytearray(multimodal.encode_png(
        np.zeros((2, 2, 3), dtype=np.uint8)
    ))
    depth_off = deep.index(b"IHDR") + 4 + 8
    deep[depth_off] = 16
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(bytes(deep))


def test_multimodal_pillow_seam_activates(monkeypatch):
    """Runs EVERYWHERE: a fake PIL.Image proves compressed payloads
    dispatch through the codec seam (convert('RGB') -> ndarray ->
    metrics) when a codec is importable, without needing Pillow in this
    container."""

    class _FakeIm:
        def convert(self, mode):
            assert mode == "RGB"
            return np.full((2, 3, 3), 10, dtype=np.uint8)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeImageMod:
        @staticmethod
        def open(fp):
            assert fp.read(4) == b"\xff\xd8\xff\xe0"
            fp.seek(0)
            return _FakeIm()

    monkeypatch.setattr(multimodal, "_PIL_IMAGE", _FakeImageMod)
    d = multimodal.decode_image_real(b"\xff\xd8\xff\xe0JFIF")
    assert d == {
        "width": 3, "height": 2, "channels": 3, "mean_intensity": 10.0,
    }


def test_multimodal_pillow_real_roundtrip():
    """Auto-activates on any machine WITH Pillow (importorskip here):
    encode a PNG via Pillow, decode through decode_image_real, expect
    pixel-exact metrics — proves the seam end-to-end off-container."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    buf = io.BytesIO()
    PIL_Image.fromarray(px).save(buf, format="PNG")
    d = multimodal.decode_image_real(buf.getvalue())
    assert (d["width"], d["height"], d["channels"]) == (4, 2, 3)
    assert d["mean_intensity"] == float(np.mean(px.astype(np.float64)))


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_native_roundtrip_all_filters(filters):
    """r05: the stdlib PNG decoder (zlib + NumPy un-filtering) must
    recover pixels exactly for every scanline filter type — runs in
    THIS container, no Pillow (VERDICT item 4)."""
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    payload = multimodal.encode_png(px, filters=filters)
    w, h, ch, out = multimodal._decode_png(payload)
    assert (w, h, ch) == (5, 7, 3)
    assert np.array_equal(out, px)
    d = multimodal.decode_image_real(payload)
    assert d == {
        "width": 5, "height": 7, "channels": 3,
        "mean_intensity": float(np.mean(px.astype(np.float64))),
    }


@pytest.mark.parametrize("ch", [1, 2, 4])
def test_png_native_color_types_normalize_to_rgb(ch):
    """Gray / gray+alpha / RGBA payloads decode and normalize exactly
    like Pillow's convert('RGB'): gray replicated, alpha dropped."""
    rng = np.random.default_rng(ch)
    px = rng.integers(0, 256, size=(4, 6, ch), dtype=np.uint8)
    w, h, out_ch, out = multimodal._decode_png(multimodal.encode_png(px))
    assert (w, h, out_ch) == (6, 4, 3)
    if ch in (1, 2):
        expected = np.repeat(px[:, :, :1], 3, axis=2)
    else:
        expected = px[:, :, :3]
    assert np.array_equal(out, expected)


def test_png_native_matches_pillow_if_available():
    """Cross-decoder check wherever Pillow exists: identical pixels
    from the native path and PIL on the same payload."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 4, 4), dtype=np.uint8)
    payload = multimodal.encode_png(px, filters=[4, 3, 2, 1, 0])
    _, _, _, native = multimodal._decode_png(payload)
    with PIL_Image.open(io.BytesIO(payload)) as im:
        ref = np.asarray(im.convert("RGB"))
    assert np.array_equal(native, ref)


def test_frame_sample_fanout(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    payload = multimodal.with_binary_payload(docs)
    frames = multimodal.frame_sample_stub(payload, every_n_bytes=64)
    per_doc = (
        frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    src = {
        r["doc_id"]: r["nb"]
        for r in payload.select(
            "doc_id", F.length("payload").alias("nb")
        ).collect()
    }
    for r in per_doc:
        expected = -(-src[r["doc_id"]] // 64)  # ceil div
        assert r["n"] == expected


@pytest.mark.parametrize("algorithm", ["label_prop", "star"])
def test_connected_components_chain_and_islands(spark, algorithm):
    """A 6-node path (diameter 5 — forces several propagation rounds),
    a separate triangle, and an isolated pair; component = min node id.
    Both interchangeable bodies must produce the identical result."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "src long, dst long",
    )
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(
            edges, algorithm=algorithm
        ).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


@pytest.mark.parametrize("algorithm", ["label_prop", "star"])
def test_connected_components_empty_edges(spark, algorithm):
    edges = spark.createDataFrame([], "src long, dst long")
    assert (
        dedup.connected_components(edges, algorithm=algorithm).count() == 0
    )


def test_star_cc_long_chain_logarithmic_rounds(spark):
    """The adversarial case for label propagation: a 256-node path has
    diameter 255, so label_prop needs ~255 rounds — alternating
    large-star/small-star must converge in <= log2(n) + c rounds AND
    still produce the exact component labels."""
    n = 256
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels, rounds = dedup.star_connected_components(edges)
    assert rounds <= 12, f"expected O(log n) rounds, got {rounds}"
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_dedup_clusters_same_via_both_cc_bodies(docs):
    """The dedup_clusters pipeline (ngram pairs -> components) must be
    body-agnostic: swapping label propagation for star CC yields the
    identical (doc_id, cluster_id) map on the fixture corpus — so the
    oracled default certifies the star body too."""
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.2)
    lp = {
        (r["id"], r["component"])
        for r in dedup.connected_components(
            pairs, src="doc_a", dst="doc_b", algorithm="label_prop"
        ).collect()
    }
    st = {
        (r["id"], r["component"])
        for r in dedup.connected_components(
            pairs, src="doc_a", dst="doc_b", algorithm="star"
        ).collect()
    }
    assert lp and lp == st


def test_star_cc_matches_label_prop_on_random_graph(spark):
    """Property check on a pseudo-random sparse graph (shuffled ids, mixed
    component sizes): the two bodies are interchangeable."""
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(500), rng.randrange(500)) for _ in range(400)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    lp = {
        (r["id"], r["component"])
        for r in dedup.connected_components(df, algorithm="label_prop").collect()
    }
    st = {
        (r["id"], r["component"])
        for r in dedup.connected_components(df, algorithm="star").collect()
    }
    assert lp == st


def test_dedup_clusters_groups_transitively(spark):
    """Every cluster id is the min doc_id of its member set, and members
    of one cluster are pairwise-reachable through the >=0.2 Jaccard edge
    list (spot-checked via the pair frame itself)."""
    d = load_table(spark, SF_ORACLE, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.2)
    cc = dedup.connected_components(pairs, src="doc_a", dst="doc_b")
    rows = cc.collect()
    assert len(rows) > 0
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["component"], set()).add(r["id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_approx_percentiles_close_to_exact(spark):
    """Sketch percentiles within 1% relative of the exact answer."""
    li = load_table(spark, SF_ORACLE, "lineitem")
    approx = {
        r["l_returnflag"]: r["pcts"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.9, 0.99], 10000
            ).alias("pcts")
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: r["pcts"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.9, 0.99))"
            ).alias("pcts")
        )
        .collect()
    }
    for flag, ex in exact.items():
        for a, e in zip(approx[flag], ex):
            assert abs(a - e) / e < 0.01, (flag, a, e)


def test_session_window_native_equals_lag_sessionization(spark):
    """The native session_window twin groups events into exactly the
    same sessions as the lag/running-sum operator (per-user multiset of
    (n_events, sum) pairs)."""
    from customer_segmentation_pyspark_spark.operators.sessions import (
        session_stats,
    )
    from customer_segmentation_pyspark_spark.queries import (
        q_session_window_native,
    )

    native = sorted(
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in q_session_window_native(spark, SF_ORACLE).collect()
    )
    lag = sorted(
        (r["user_id"], r["n_events"], round(float(r["sum_value"]), 2))
        for r in session_stats(
            load_table(spark, SF_ORACLE, "events"), gap_minutes=30
        ).collect()
    )
    assert native == lag


def test_resize_stub_budget_and_determinism(spark):
    """Thumbnails stay within the target_w*target_h byte budget, dims are
    the fixed target, and the kernel is deterministic across runs."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    payload = multimodal.with_binary_payload(docs)
    a = multimodal.resize_stub(payload, target_w=16, target_h=16).collect()
    b = multimodal.resize_stub(payload, target_w=16, target_h=16).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(
        r["doc_id"] for r in b
    )
    bya = {r["doc_id"]: r for r in a}
    byb = {r["doc_id"]: r for r in b}
    for doc_id, r in bya.items():
        assert r["out_w"] == 16 and r["out_h"] == 16
        assert 0 < len(r["thumb_bytes"]) <= 256
        assert bytes(r["thumb_bytes"]) == bytes(byb[doc_id]["thumb_bytes"])


def test_segment_dedup_removes_cross_doc_boilerplate(spark):
    """A boilerplate run shared by two docs is dropped from both; the
    unique document is untouched; within-doc repeats (one document)
    survive because the frequency is counted in distinct docs."""
    from customer_segmentation_pyspark_spark.operators.dedup import (
        segment_dedup,
    )

    boiler = " ".join(f"b{i}" for i in range(8))
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_b = " ".join(f"c{i}" for i in range(8))
    solo = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq_a}"),
            (2, f"{boiler} {uniq_b}"),
            (3, f"{solo} {solo}"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in segment_dedup(docs, seg_words=8, min_docs=2).collect()
    }
    assert out[1]["n_dup_segs"] == 1 and out[1]["clean_text"] == uniq_a
    assert out[2]["n_dup_segs"] == 1 and out[2]["clean_text"] == uniq_b
    # doc 3 repeats its own segment: distinct-doc frequency is 1 -> kept
    assert out[3]["n_dup_segs"] == 0
    assert out[3]["clean_text"] == f"{solo} {solo}"
    assert all(r["n_segs"] == 2 for r in out.values())


def test_prefix_jaccard_equals_naive_join(spark):
    """Prefix filtering is lossless: on a corpus with planted near-dups
    the PPJoin-style plan returns exactly the naive co-occurrence
    join's pairs at the same threshold."""
    from customer_segmentation_pyspark_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " lambda"),          # near-dup of 1
            (3, "one two three four five six seven eight nine ten"),
            (4, "one two three four five six seven eight nine ten"),  # dup of 3
            (5, "totally different words with no overlap here at all now"),
        ],
        ["doc_id", "text"],
    )
    fast = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in prefix_jaccard_pairs(docs, threshold=0.5).collect()
    )
    naive = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, max_doc_freq=None
        ).collect()
    )
    assert fast == naive
    assert (3, 4, 1.0) in fast and any(a == 1 and b == 2 for a, b, _ in fast)


def test_bm25_returned_docs_contain_query_terms(docs):
    """Every BM25 hit must contain at least one query term (scores only
    arise from tf rows), scores are positive and non-increasing, and the
    list respects k."""
    from customer_segmentation_pyspark_spark.operators import textops

    terms = ["spark", "window", "hash"]
    out = textops.bm25_topk(docs, terms, k=10).collect()
    assert 0 < len(out) <= 10
    scores = [r["bm25"] for r in out]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    hits = {r["doc_id"] for r in out}
    texts = {
        r["doc_id"]: r["text"].lower()
        for r in docs.filter(F.col("doc_id").isin(list(hits))).collect()
    }
    for d in hits:
        assert any(t in texts[d].split() for t in terms)


def test_bm25_rare_term_outscores_common_term(spark):
    """IDF sanity: a doc matching only a rare term beats a doc matching
    only a ubiquitous term at equal tf and length."""
    from customer_segmentation_pyspark_spark.operators import textops

    rows = [(0, "rare aaa bbb"), (1, "common aaa bbb")] + [
        (i, "common xxx yyy") for i in range(2, 12)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["bm25"]
        for r in textops.bm25_topk(d, ["rare", "common"], k=20).collect()
    }
    assert out[0] > out[1]


def test_semantic_dedup_keeps_lowest_id_survivor(emb):
    """Row-preserving; every dropped vec has a kept lower-id near-dup in
    its own cluster (cosine >= threshold); threshold > 1 keeps all."""
    from customer_segmentation_pyspark_spark.queries import _sem_centroids

    cents = _sem_centroids()
    out = dedup.semantic_dedup(emb, cents, threshold=0.4)
    rows = out.collect()
    assert len(rows) == emb.count()

    kept = {r["vec_id"] for r in rows if r["keep"]}
    dropped = {r["vec_id"] for r in rows if not r["keep"]}
    assert dropped, "fixture should contain semantic near-dups"
    cluster = {r["vec_id"]: r["cluster"] for r in rows}

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 4
        )

    for d in dropped:
        ok = any(
            u < d
            and cluster[u] == cluster[d]
            and cos(vecs[u], vecs[d]) >= 0.4
            for u in vecs
        )
        assert ok, f"vec {d} dropped without a lower-id near-dup witness"
    # the lowest id of every cluster can never be dropped
    import collections

    low = {}
    for v, c in cluster.items():
        low[c] = min(low.get(c, v), v)
    assert set(low.values()) <= kept

    all_keep = dedup.semantic_dedup(emb, cents, threshold=1.1)
    assert all_keep.filter(~F.col("keep")).count() == 0


def test_ivf_fixed_cells_recall_vs_brute_force(emb):
    """Fixed plan-literal quantizer (8 cells, probe 3): recall@5 vs the
    exact baseline. 1.0 on the fixture; 0.7 is the regression floor
    (an assignment/probe-ranking bug craters it to ~cell-fraction)."""
    from customer_segmentation_pyspark_spark.queries import _ivf_fixed_cells

    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk_cosine(
            emb, q, n_probe=3, k=5, cells=_ivf_fixed_cells()
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.7


def test_dsir_separates_target_tokens(spark):
    """Docs made of target-exclusive tokens score positive; docs of
    raw-only tokens score negative; token counts exact."""
    from customer_segmentation_pyspark_spark.operators import textops

    rows = (
        [(i, "tgt tok " * 5, "en") for i in range(5)]
        + [(i, "raw only junk " * 5, "xx") for i in range(5, 10)]
    )
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        r["doc_id"]: r
        for r in textops.dsir_scores(d, F.col("lang") == "en").collect()
    }
    assert all(out[i]["log_ratio"] > 0 and out[i]["selected"] for i in range(5))
    assert all(
        out[i]["log_ratio"] < 0 and not out[i]["selected"]
        for i in range(5, 10)
    )
    assert out[0]["n_tokens"] == 10 and out[5]["n_tokens"] == 15


def test_bpe_pair_counts_known_answer(spark):
    """["ab ab", "abc"] -> vocab {ab:2, abc:1} -> pair ab has weight 3,
    bc weight 1."""
    from customer_segmentation_pyspark_spark.operators import textops

    d = spark.createDataFrame([(0, "ab ab"), (1, "abc")], ["doc_id", "text"])
    out = {r["pair"]: r["n"] for r in textops.bpe_pair_counts(d).collect()}
    assert out == {"ab": 3, "bc": 1}


def _bpe_learn_twin(texts: list[str], n_merges: int) -> list[tuple]:
    """Plain-Python BPE reference (Sennrich et al. 2016): same vocab
    weighting, same (count desc, left asc, right asc) tie-break, same
    greedy left-to-right non-overlapping merge."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            if len(w) >= 2:
                vocab[tuple(w)] += 1
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((step, left, right, left + right, cnt))
        new_vocab = Counter()
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges


def test_bpe_learn_matches_python_twin(spark):
    """Distributed BPE training (aggregate-fold merge applier) produces
    the exact merge table of the plain-Python reference, including on
    overlap-heavy input ('aaaa' forces the greedy non-overlap rule) and
    merged-symbol reuse ('er' + 's' in round 2+)."""
    from customer_segmentation_pyspark_spark.operators import textops

    texts = [
        "lower lower lowest newer newer newest",
        "aaaa aaaa baaa",
        "wider widest wide er er ers ers",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [tuple(r) for r in textops.bpe_learn(d, n_merges=6).collect()]
    want = _bpe_learn_twin(texts, 6)
    assert got == want
    # the greedy rule must have packed 'aaaa' as (aa)(aa), never (a)(aa)(a)
    assert any(m[3] == "aa" for m in got)


def test_winnowing_shared_substring_shares_fingerprint(spark):
    """The winnowing guarantee: two docs sharing a substring of length
    >= k + w - 1 share at least one fingerprint; unrelated docs of
    distinct characters share none; short docs yield zero prints."""
    from customer_segmentation_pyspark_spark.operators import textops

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (0, "AAA " + shared + " BBB"),
        (1, "CCC " + shared + " DDD"),
        (2, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq"),
        (3, "tiny"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textops.winnowing_fingerprints(d, k=8, w=6)
    assert out.count() == 4
    row3 = out.filter(F.col("doc_id") == 3).first()
    assert row3["n_fingerprints"] == 0

    # recompute raw fingerprint sets to check sharing
    ex = (
        d.filter(F.col("doc_id") < 3)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.length(
                            F.trim(
                                F.regexp_replace(
                                    F.lower("text"), r"\s+", " "
                                )
                            )
                        )
                        - 7,
                    ),
                    lambda i: F.trim(
                        F.regexp_replace(F.lower("text"), r"\s+", " ")
                    ).substr(i, F.lit(8)),
                )
            ),
        )
        .collect()
    )
    import hashlib

    fps = {0: set(), 1: set(), 2: set()}
    grams = {0: [], 1: [], 2: []}
    for r in ex:
        grams[r["doc_id"]].append(
            int(hashlib.md5(r["col"].encode()).hexdigest()[:12], 16)
        )
    for doc, hs in grams.items():
        for i in range(len(hs) - 5):
            fps[doc].add(min(hs[i : i + 6]))
    assert fps[0] & fps[1], "shared substring must share a fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])


def test_quality_classifier_monotone_in_stopwords(spark):
    """More stopword mass (weight +3.0) must raise the score when other
    features are held fixed; keep flag is consistent with score > 0.5."""
    from customer_segmentation_pyspark_spark.operators import textops
    from customer_segmentation_pyspark_spark.queries import QUALITY_W

    rows = [
        (0, "the and of to a the and of to a"),
        (1, "zz qq ww rr tt yy uu ii oo pp"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in textops.quality_classifier(
            textops.quality_features(d), QUALITY_W
        ).collect()
    }
    assert out[0]["score"] > out[1]["score"]
    for r in out.values():
        assert r["keep"] == (r["score"] > 0.5)


def test_hash_embedding_unit_norm_and_determinism(spark, docs):
    """Vectors are unit-norm (rounding slack), identical texts embed
    identically, and the embedding feeds semantic_dedup cleanly."""
    import math

    from customer_segmentation_pyspark_spark.operators import textops

    out = textops.hash_embedding(docs.limit(50), dim=16).collect()
    assert len(out) == 50
    for r in out:
        nrm = math.sqrt(sum(r[f"e{d}"] ** 2 for d in range(16)))
        assert abs(nrm - 1.0) < 1e-4
    d2 = spark.createDataFrame(
        [(0, "same text here"), (1, "same text here")], ["doc_id", "text"]
    )
    v = textops.hash_embedding(d2, dim=16).collect()
    a = [v[0][f"e{d}"] for d in range(16)]
    b = [v[1][f"e{d}"] for d in range(16)]
    assert a == b


def test_duplicated_span_profile_planted_dups(spark):
    """A doc pair sharing a long verbatim run is caught span-for-span;
    a doc of unique random-ish text reports ratio 0; a doc shorter than
    the span length yields zero spans (no crash, ratio 0)."""
    import hashlib

    boiler = "the quick brown fox jumps over the lazy dog again and again "
    uniq = hashlib.sha256(b"entropy").hexdigest() * 3
    rows = [
        (1, "LICENSE: " + boiler * 4),
        (2, "COPY:    " + boiler * 4),   # same boilerplate, different head
        (3, uniq),                        # unique content
        (4, "tiny"),                      # shorter than span_len
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dedup.duplicated_span_profile(
            df, span_len=24, stride=6
        ).collect()
    }
    assert out[4]["n_spans"] == 0 and out[4]["dup_span_ratio"] == 0.0
    assert out[3]["n_dup_spans"] == 0
    # the shared boilerplate dominates both docs: most spans duplicated
    assert out[1]["dup_span_ratio"] > 0.8
    assert out[2]["dup_span_ratio"] > 0.8
    # intra-doc repetition (boiler * 4) also counts, per ExactSubstr
    assert out[1]["n_dup_spans"] <= out[1]["n_spans"]


def test_hard_negatives_label_constraint(emb):
    """Every mined negative must carry a label different from its
    query's label, and ranks must be dense 1..k per query."""
    q = emb.filter(F.col("vec_id") < 5)
    out = similarity.hard_negatives(emb, q, k=5).collect()
    labels = {
        r["vec_id"]: r["label"] for r in q.select("vec_id", "label").collect()
    }
    by_q = {}
    for r in out:
        assert r["neg_label"] != labels[r["query_id"]]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_hard_negatives_are_hardest(emb):
    """The top hard negative's cosine must be >= any other different-
    label vector's cosine (it is the max over the eligible set)."""
    q = emb.filter(F.col("vec_id") == 0)
    out = similarity.hard_negatives(emb, q, k=1).collect()
    assert len(out) == 1
    top = out[0]
    all_scored = similarity.hard_negatives(emb, q, k=10**6).collect()
    assert all(top["cos_sim"] >= r["cos_sim"] for r in all_scored)


def test_pq_recall_vs_brute_force(emb):
    """PQ shortlist-50 + exact rescore must recover >= 0.8 of the true
    euclidean top-5 over 20 queries (measured ~0.9; random codebooks
    crater to ~0.1, so this catches an encode/ADC sign or slicing bug)."""
    from pyspark.sql import Window

    from customer_segmentation_pyspark_spark.functions.arrays import sq_dist
    from customer_segmentation_pyspark_spark.queries import _pq_codebooks

    q = emb.filter(F.col("vec_id") < 20)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(
            emb, q, _pq_codebooks(), k=5, shortlist=50
        ).collect()
    }
    qq = q.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("neighbor_id")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in c.join(
            F.broadcast(qq), F.col("neighbor_id") != F.col("query_id")
        )
        .select("query_id", "neighbor_id", sq_dist("qv", "cv").alias("d"))
        .withColumn("r", F.row_number().over(w))
        .filter("r <= 5")
        .collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ recall too low: {recall}"


def test_pq_null_query_element_paths_agree(emb):
    """A NULL element (or NULL vector) in a query embedding must behave
    identically on both sides of the max_driver_queries threshold: the
    driver-side ADC table propagates None exactly like the SQL
    arithmetic (NULL sub-distance -> NULL adc/exact dist, ranked last
    by neighbor_id) instead of raising TypeError (r05, ADVICE)."""
    from customer_segmentation_pyspark_spark.queries import _pq_codebooks

    q = emb.filter(F.col("vec_id") < 3).withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == 1,
            F.expr(
                "transform(embedding, (x, i) -> "
                "CASE WHEN i = 5 THEN NULL ELSE x END)"
            ),
        )
        .when(F.col("vec_id") == 2, F.lit(None))
        .otherwise(F.col("embedding")),
    )
    rows = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["neighbor_id"], r["dist"], r["rank"])
        for r in df.collect()
    )
    driver = similarity.pq_topk(emb, q, _pq_codebooks(), k=3)
    dist = similarity.pq_topk(
        emb, q, _pq_codebooks(), k=3, max_driver_queries=0
    )
    assert rows(driver) == rows(dist)
    # the clean query (vec_id 0) still gets real distances
    clean = [r for r in rows(driver) if r[0] == 0]
    assert len(clean) == 3 and all(r[2] is not None for r in clean)


def test_preference_pairs_order_and_gap(docs):
    from customer_segmentation_pyspark_spark.operators import textops

    out = textops.preference_pairs(docs, group_col="source").collect()
    assert out, "fixture has sources"
    for r in out:
        assert r["chosen_score"] >= r["rejected_score"]
        assert r["score_gap"] == r["chosen_score"] - r["rejected_score"]


def test_ngram_novelty_planted(spark):
    """An eval doc cloned from a train doc scores novelty 0; an eval doc
    with entirely unseen vocabulary scores 1. (md5-parity split: doc_id
    1 is eval, 2 is train, 21 is eval — verified inside.)"""
    import hashlib

    def is_train(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[31], 16) % 2 == 0

    train_id = next(i for i in range(100) if is_train(i))
    ev_ids = [i for i in range(100) if not is_train(i)][:2]
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (train_id, shared),
        (ev_ids[0], shared),                       # clone -> novelty 0
        (ev_ids[1], "qq ww ee rr tt yy uu ii"),    # disjoint -> novelty 1
    ]
    from customer_segmentation_pyspark_spark.operators import textops

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in textops.ngram_novelty(df, n=3).collect()}
    assert train_id not in out  # train docs are not scored
    assert out[ev_ids[0]]["novelty"] == 0.0
    assert out[ev_ids[1]]["novelty"] == 1.0


def test_dup_span_intervals_merge(spark):
    """Two docs sharing one long verbatim run: each reports ONE merged
    interval covering the shared run (plus nothing for unique text);
    intervals never overlap within a doc."""
    import hashlib

    boiler = "shared license text block that repeats verbatim everywhere! "
    u1 = hashlib.sha256(b"u1").hexdigest() * 2
    u2 = hashlib.sha256(b"u2").hexdigest() * 2
    rows = [(1, u1 + boiler * 3 + u2), (2, boiler * 3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.duplicated_span_intervals(df, span_len=24, stride=6).collect()
    by_doc = {}
    for r in out:
        assert r["start"] <= r["end"]
        by_doc.setdefault(r["doc_id"], []).append((r["start"], r["end"]))
    for doc, ivals in by_doc.items():
        ivals.sort()
        for (s1, e1), (s2, e2) in zip(ivals, ivals[1:]):
            assert s2 > e1, f"overlapping intervals in doc {doc}"
    # doc 2 is entirely boilerplate: one interval covering ~whole text
    assert len(by_doc[2]) == 1
    s, e = by_doc[2][0]
    assert s == 1 and e >= len(boiler * 3) - 24


def test_curriculum_order_stage_properties(docs):
    from customer_segmentation_pyspark_spark.operators import textops

    out = textops.curriculum_order(docs, stages=4).collect()
    n = len(out)
    stages = {}
    for r in out:
        stages.setdefault(r["stage"], []).append(r)
    assert set(stages) == {1, 2, 3, 4}
    sizes = [len(v) for _, v in sorted(stages.items())]
    assert max(sizes) - min(sizes) <= 1  # ntile balance
    for st, rows in stages.items():
        poss = sorted(r["position"] for r in rows)
        assert poss == list(range(1, len(rows) + 1))
    # difficulty must be (weakly) non-decreasing across stage boundaries
    maxes = [max(r["difficulty"] for r in stages[s]) for s in (1, 2, 3)]
    mins = [min(r["difficulty"] for r in stages[s]) for s in (2, 3, 4)]
    for mx, mn in zip(maxes, mins):
        assert mx <= mn + 1e-9


def test_audio_frames_plumbing_shapes(docs):
    """Frame count per doc = floor((n-64)/32)+1 for n>=64 (full frames
    only); frame_ids dense from 0; energies positive and bounded by
    127^2 for ASCII payloads."""
    out = multimodal.audio_frames_stub(
        multimodal.with_binary_payload(docs), frame=64, hop=32
    ).collect()
    lens = {
        r["doc_id"]: r["n_chars"]
        for r in docs.select(
            "doc_id", F.length("text").alias("n_chars")
        ).collect()
    }
    per_doc = {}
    for r in out:
        assert r["n_samples"] == 64
        assert 0 < r["energy"] <= 127 * 127
        per_doc.setdefault(r["doc_id"], []).append(r["frame_id"])
    for doc_id, fids in per_doc.items():
        n = lens[doc_id]
        expect = (n - 64) // 32 + 1
        assert sorted(fids) == list(range(expect))


def test_arrow_udf_matches_expression(spark, emb):
    """Spark 4.1 @arrow_udf escape hatch: the Arrow-native squared
    distance equals the Catalyst expression to 1e-9 (same contract the
    pandas_udf family is held to)."""
    import pytest

    from customer_segmentation_pyspark_spark.functions import pandas_fns
    from customer_segmentation_pyspark_spark.functions.arrays import sq_dist

    if not getattr(pandas_fns, "HAS_ARROW_UDF", False):
        pytest.skip("arrow_udf not available in this PySpark")
    two = emb.limit(50).selectExpr(
        "transform(embedding, x -> cast(x as double)) as a",
        "transform(reverse(embedding), x -> cast(x as double)) as b",
    )
    rows = two.select(
        sq_dist(F.col("a"), F.col("b")).alias("expr_d"),
        pandas_fns.sq_dist_arrow(F.col("a"), F.col("b")).alias("arrow_d"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["expr_d"] - r["arrow_d"]) < 1e-9


def test_bpe_learn_early_stop_matches_oracle(spark):
    """A corpus that runs dry before n_merges (only one pair reaches
    count >= 2) must yield identical merge tables from the Spark loop
    (break on cnt < 2) and the unrolled DuckDB oracle (cnt >= 2 filter
    + LEFT-JOIN no-op rounds) — the early-stop-parity contract of
    _sql_bpe_learn."""
    import duckdb

    from customer_segmentation_pyspark_spark.operators import textops
    from customer_segmentation_pyspark_spark.queries import _sql_bpe_learn

    texts = [(0, "ab ab"), (1, "cd")]
    d = spark.createDataFrame(texts, ["doc_id", "text"])
    got = [tuple(r) for r in textops.bpe_learn(d, n_merges=8).collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in texts)
        + ") t(doc_id, text)"
    )
    want = [tuple(r) for r in con.sql(_sql_bpe_learn(8)).fetchall()]
    assert got == want == [(1, "a", "b", "ab", 2)]


def test_incremental_dedup_equals_filtered_full_dedup(docs):
    """The incremental (delta-probe) join must produce EXACTLY the full
    all-pairs result restricted to pairs touching a new doc — the
    correctness contract that lets a nightly pipeline skip old-old
    recomputation."""
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    want = {
        k: v for k, v in full.items() if k[0] % 5 == 0 or k[1] % 5 == 0
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.incremental_jaccard_pairs(
            docs, F.col("doc_id") % 5 == 0, threshold=0.2
        ).collect()
    }
    assert want, "fixture should contain delta-touching near-dup pairs"
    assert got == want


def test_semantic_dedup_hot_cluster_routing_equals_cold(emb):
    """Hot-cluster auto-routing (VERDICT r02 #1): a cluster above
    ``max_cluster_size`` goes through the block-pair GEMM sub-division;
    the (vec_id, cluster, keep) result must be IDENTICAL to the
    single-group path on the same data."""
    one = emb.limit(1).select("embedding").first()["embedding"]
    dim = len(one)
    cents = [[0.0] * dim]  # one centroid -> every vector in one cluster

    base = {
        tuple(r)
        for r in dedup.semantic_dedup(
            emb, cents, threshold=0.8, max_cluster_size=10**9
        ).collect()
    }
    routed = {
        tuple(r)
        for r in dedup.semantic_dedup(
            emb, cents, threshold=0.8, max_cluster_size=64
        ).collect()
    }
    assert routed == base
    assert len(base) == emb.count()


def test_semantic_dedup_hot_cluster_scale_bounded(spark):
    """100k vectors funneled into ONE cluster (the pathological skew the
    cap exists for): completes with task memory bounded by the cap
    (2*4096*16 doubles per GEMM, never 100k^2), and the dropped set is
    exact — 10 one-hot prototypes, each copied 10k times, keep only the
    min id per prototype."""
    n, n_proto, dim = 100_000, 10, 16
    emb = spark.range(n).selectExpr(
        "id as vec_id",
        f"transform(sequence(0, {dim - 1}), "
        f"d -> cast(if(d = id % {n_proto}, 1.0, 0.0) as double)) "
        "as embedding",
    ).localCheckpoint(eager=True)  # derived col: materialize per caller note
    out = dedup.semantic_dedup(
        emb, [[0.0] * dim], threshold=0.9, max_cluster_size=4096
    )
    kept = {r["vec_id"] for r in out.filter("keep").collect()}
    assert kept == set(range(n_proto))
    assert out.count() == n


def test_multimodal_real_ppm_bmp_decode():
    """VERDICT r02 #4: real decode on genuine bytes — PPM(P6) and 24-bit
    BMP parse in pure NumPy with exact width/height/mean_intensity and
    pixel fidelity (orientation + BGR order + row padding), while the
    compressed-format seam still raises."""
    w, h = 13, 7  # odd width exercises the BMP 4-byte row padding
    px = (np.arange(h * w * 3) * 7 % 256).reshape(h, w, 3).astype(np.uint8)
    exp_mean = float(np.mean(px.astype(np.float64)))

    for enc in (multimodal.encode_ppm, multimodal.encode_bmp):
        d = multimodal.decode_image_real(enc(px))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert d["mean_intensity"] == exp_mean

    # pixel-exact round trips (mean alone is flip-invariant)
    _, _, _, ppm_px = multimodal._decode_ppm(multimodal.encode_ppm(px))
    assert (ppm_px == px).all()
    _, _, _, bmp_px = multimodal._decode_bmp(multimodal.encode_bmp(px))
    assert (bmp_px == px).all()

    # PPM headers may carry comments
    ppm = b"P6\n# a comment\n13 7 # inline\n255\n" + px.tobytes()
    d = multimodal.decode_image_real(ppm)
    assert d["width"] == 13 and d["mean_intensity"] == exp_mean


def test_multimodal_real_decode_distributed(spark):
    """The decode_image mapInPandas stage over a mixed PPM/BMP corpus:
    one typed row per image, exact metadata for every payload."""
    rows, expected = [], {}
    for i in range(20):
        w, hh = 4 + i, 3 + (i % 5)
        px = ((np.arange(hh * w * 3) * (i + 3)) % 256).reshape(
            hh, w, 3
        ).astype(np.uint8)
        payload = (
            multimodal.encode_ppm(px)
            if i % 2 == 0
            else multimodal.encode_bmp(px)
        )
        rows.append((i, bytearray(payload)))
        expected[i] = (
            len(payload),
            w,
            hh,
            3,
            float(np.mean(px.astype(np.float64))),
        )
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["doc_id"]: (
            r["n_bytes"],
            r["width"],
            r["height"],
            r["channels"],
            r["mean_intensity"],
        )
        for r in multimodal.decode_image(df).collect()
    }
    assert got == expected


def test_multimodal_decode_rejects_malformed_payloads():
    """Malformed media must raise a clear error, never return garbage
    metadata: truncated rasters, bad magic, unsupported depth/maxval."""
    px = np.zeros((4, 5, 3), dtype=np.uint8)
    good_ppm = multimodal.encode_ppm(px)
    good_bmp = multimodal.encode_bmp(px)

    for bad in [
        good_ppm[:-7],                      # truncated PPM raster
        b"P6\n5 4\n65535\n" + b"\x00" * 120,  # 16-bit maxval unsupported
        good_bmp[:-5],                      # truncated BMP raster
        good_bmp[:40],                      # truncated BMP header
        b"BM" + b"\x00" * 20,               # too short for a DIB header
    ]:
        with pytest.raises(ValueError):
            multimodal.decode_image_real(bad)
    # truncated JPEG: NotImplementedError without a codec; with Pillow
    # present the seam activates and PIL raises its own decode error
    with pytest.raises((NotImplementedError, OSError, ValueError)):
        multimodal.decode_image_real(b"\xff\xd8\xff\xe0JFIF")


def _persistent_rdd_ids(spark):
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def test_semantic_dedup_refuses_infeasible_skew(spark):
    """Past ~1000x-cap skew the exact within-cluster GEMM is O(n^2)
    infeasible — the operator must refuse with guidance, not build a
    multi-million-row block-pair index for a job that cannot finish."""
    emb = spark.range(5000).selectExpr(
        "id as vec_id",
        "transform(sequence(0, 3), d -> cast(d as double)) as embedding",
    )
    before = _persistent_rdd_ids(spark)
    # 5000 rows in one cluster with cap 3 -> nb ~ 1667, nb^2 ~ 2.8M
    with pytest.raises(ValueError, match="re-cluster"):
        dedup.semantic_dedup(emb, [[0.0] * 4], max_cluster_size=3)
    with pytest.raises(ValueError, match=">= 1"):
        dedup.semantic_dedup(emb, [[0.0] * 4], max_cluster_size=0)
    # ADVICE r03: the refusal path must not strand its cached frame.
    # Compare against the pre-call snapshot: other tests in the shared
    # session may legitimately hold caches, so a global ==0 is flaky.
    assert _persistent_rdd_ids(spark) <= before


def test_embedding_neardup_refuses_corpus_scale_exact(spark):
    """The exact block-pair GEMM is the verifier for candidate subsets;
    at corpus scale (block-pair index > 2M pairs) it must refuse with
    prefilter guidance instead of attempting an infeasible all-pairs."""
    emb = spark.range(10_000).selectExpr(
        "id as vec_id",
        "transform(sequence(0, 3), d -> cast(d as double)) as embedding",
    )
    before = _persistent_rdd_ids(spark)
    with pytest.raises(ValueError, match="prefilter"):
        dedup.embedding_neardup_pairs(emb, rows_per_block=2)
    # ADVICE r03: the refusal path must not strand its cached frame
    # (relative to the pre-call snapshot; see note above).
    assert _persistent_rdd_ids(spark) <= before


def test_feature_hash_embedding_map_only_and_twin(spark):
    """The featurizer must stay a map-only pass (no Exchange in the
    executed plan) and agree with a plain-Python md5 replay."""
    import hashlib

    from customer_segmentation_pyspark_spark.operators.textops import (
        feature_hash_embedding,
    )
    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    emb = feature_hash_embedding(d, dim=16)
    plan = emb._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "featurizer must not shuffle"

    rows = {r["doc_id"]: r for r in emb.limit(50).collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in d.filter(F.col("doc_id").isin(list(rows))).collect()
    }
    for doc_id, r in rows.items():
        want = [0.0] * 16
        for t in texts[doc_id].lower().split():
            h = hashlib.md5(t.encode()).hexdigest()
            want[int(h[:8], 16) % 16] += 1.0 if int(h[8], 16) % 2 == 0 else -1.0
        assert r["embedding"] == want, doc_id
