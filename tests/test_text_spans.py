"""Behavioral tests for dup_span_stats (exact duplicated-substring spans)
and triangle_stats (near-dup graph structure) on hand-built inputs where the
expected answer is computable by eye."""

from __future__ import annotations

from weather_data_pipeline_spark.operators.graph import triangle_stats
from weather_data_pipeline_spark.operators.text import dup_span_stats


def _spans(spark, docs, k=3, min_docs=2):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens, r.dup_frac)
        for r in dup_span_stats(df, k=k, min_docs=min_docs).collect()
    }


def test_no_shared_grams_means_zero_spans(spark):
    got = _spans(
        spark,
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
    )
    assert got == {1: (4, 0, 0, 0.0), 2: (4, 0, 0, 0.0)}


def test_shared_trigram_marks_both_docs(spark):
    # "a b c" appears in both docs; doc 1 has it at positions 1..3 of 5
    got = _spans(
        spark,
        [(1, "a b c x y"), (2, "z a b c")],
    )
    # doc1: span covers tokens 1-3 (3 of 5); doc2: tokens 2-4 (3 of 4)
    assert got[1] == (5, 1, 3, 0.6)
    assert got[2] == (4, 1, 3, 0.75)


def test_overlapping_spans_merge(spark):
    # docs share the 4-token run "a b c d" -> two overlapping trigrams
    # ("a b c" at 1, "b c d" at 2) must merge into ONE span of 4 tokens
    got = _spans(
        spark,
        [(1, "a b c d x"), (2, "y a b c d")],
    )
    assert got[1] == (5, 1, 4, 0.8)
    assert got[2] == (5, 1, 4, 0.8)


def test_disjoint_spans_stay_separate(spark):
    # shared runs at the start and end, with a unique middle gap wider
    # than the gram length -> two separate islands
    got = _spans(
        spark,
        [
            (1, "a b c u1 u2 u3 u4 d e f"),
            (2, "a b c v1 v2 v3 v4 d e f"),
        ],
    )
    assert got[1] == (10, 2, 6, 0.6)
    assert got[2] == (10, 2, 6, 0.6)


def test_short_docs_report_zero(spark):
    got = _spans(spark, [(1, "a b"), (2, "a b")])
    assert got == {1: (2, 0, 0, 0.0), 2: (2, 0, 0, 0.0)}


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r.node: (r.degree, r.n_triangles, r.clustering_coeff)
        for r in triangle_stats(df).collect()
    }


def test_triangle_on_clique3(spark):
    got = _tri(spark, [(1, 2), (1, 3), (2, 3)])
    assert got == {n: (2, 1, 1.0) for n in (1, 2, 3)}


def test_clique4_counts(spark):
    # K4: every node has degree 3 and sits in C(3,2)=3 triangles; coeff 1
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _tri(spark, edges)
    assert got == {n: (3, 3, 1.0) for n in range(4)}


def test_path_has_no_triangles(spark):
    got = _tri(spark, [(1, 2), (2, 3), (3, 4)])
    assert got[1] == (1, 0, 0.0)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (2, 0, 0.0)
    assert got[4] == (1, 0, 0.0)


def test_triangle_plus_pendant(spark):
    # triangle 1-2-3 with pendant 4 hanging off 1: node 1 degree 3, one
    # triangle among its 3 possible neighbor pairs -> coeff 1/3
    got = _tri(spark, [(1, 2), (1, 3), (2, 3), (1, 4)])
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (2, 1, 1.0)
    assert got[4] == (1, 0, 0.0)


def test_jl_projection_preserves_distances(spark, sf_dir):
    # JL lemma sanity: with k=8 the per-pair squared-distance ratio is noisy
    # (std ~ sqrt(2/k) ~ 0.5) but unbiased — the MEDIAN ratio over many
    # pairs must sit near 1
    import numpy as np

    from weather_data_pipeline_spark.plans.queries import REGISTRY

    proj = (
        REGISTRY["jl_projection_embeddings"].spark(spark, sf_dir).toPandas()
    )
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    X = np.array(emb.embedding.tolist(), dtype=np.float64)
    P = proj.sort_values("vec_id")[[f"proj_{j}" for j in range(8)]].to_numpy()
    rng = np.random.RandomState(0)
    idx = rng.choice(len(X), size=(200, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    d_orig = ((X[idx[:, 0]] - X[idx[:, 1]]) ** 2).sum(axis=1)
    d_proj = ((P[idx[:, 0]] - P[idx[:, 1]]) ** 2).sum(axis=1)
    ratio = d_proj / d_orig
    assert 0.6 < np.median(ratio) < 1.6


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    # Bloom filters never miss: every exactly-contaminated gram must be
    # bloom-positive, so per doc n_bloom >= n_exact and the exact counts
    # must agree with the exact decontamination query
    from weather_data_pipeline_spark.plans.queries import REGISTRY

    got = REGISTRY["bloom_decontaminate_documents"].spark(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        assert r.n_bloom_grams >= r.n_exact_grams
        assert r.n_false_positives == r.n_bloom_grams - r.n_exact_grams
    exact = {
        r.doc_id: r.n_contaminated_grams
        for r in REGISTRY["decontaminate_3gram_documents"].spark(spark, sf_dir).collect()
    }
    for r in got:
        if r.doc_id in exact and r.n_exact_grams > 0:
            assert exact[r.doc_id] == r.n_exact_grams


def test_hard_negatives_single_label_emits_nothing(spark):
    # no different-label neighbor exists -> the operator must return zero
    # rows (matching the oracle's label != label join), never fall back to
    # self/same-label candidates via the -inf row-max
    from weather_data_pipeline_spark.operators.similarity import hard_negatives

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], 7) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    assert hard_negatives(emb).count() == 0


def test_hard_negatives_picks_cross_label_argmax(spark):
    from weather_data_pipeline_spark.operators.similarity import hard_negatives

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.99, 0.14], 0),   # same label as 0 — never its negative
            (2, [0.9, 0.43], 1),    # closest cross-label to 0
            (3, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.vec_id: r.hard_negative_id for r in hard_negatives(emb).collect()}
    assert got[0] == 2 and got[1] == 2
    # vec 2's best cross-label cosine is vec 1 (0.953 vs 0.902 for vec 0);
    # vec 3 ([0,1]) is nearest to 1 (cos 0.14) among labels != 1
    assert got[2] == 1 and got[3] == 1


def test_hard_negatives_zero_norm_vector_does_not_poison_batch(spark):
    # one zero vector must not suppress other rows' candidates (NaN row-max
    # trap); the degenerate vector itself emits no row
    from weather_data_pipeline_spark.operators.similarity import hard_negatives

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0], 0),
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.43], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.vec_id: r.hard_negative_id for r in hard_negatives(emb).collect()}
    assert got == {1: 2, 2: 1}


def test_incremental_dedup_intra_batch_duplicates(spark, tmp_path):
    # two identical docs ARRIVING IN THE SAME BATCH: the first keeps, the
    # second drops (earlier-doc asymmetry); an exact copy of a corpus doc
    # drops; a unique doc keeps
    from weather_data_pipeline_spark.plans.queries import REGISTRY

    corpus_text = "alpha beta gamma delta epsilon zeta eta theta"
    batch_text = "one two three four five six seven eight"
    rows = [
        (1, corpus_text, "en", "src2", len(corpus_text)),
        (2, "totally different corpus words here now ok fine", "en", "src3", 48),
        (10, batch_text, "en", "src1", len(batch_text)),
        (11, batch_text, "en", "src1", len(batch_text)),  # dup of 10
        (12, corpus_text, "en", "src1", len(corpus_text)),  # dup of corpus 1
        (13, "unique nine ten eleven twelve thirteen fourteen", "en", "src1", 47),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.exact_dup, r.decision)
        for r in REGISTRY["incremental_dedup_documents"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got[11] == (1, "drop_exact")
    assert got[12] == (1, "drop_exact")
    assert got[13] == (0, "keep")
    # doc 10 must NOT be dropped — it is the first arrival of its content
    assert got[10][0] == 0 and got[10][1] in ("keep", "review_neardup")
