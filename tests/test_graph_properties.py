"""Property tests: triangle_stats / k_core / dup_span_stats against
brute-force Python references on random inputs — the oracle queries pin the
fixture corpus; these pin the OPERATORS over the input space."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from weather_data_pipeline_spark.operators.graph import k_core, triangle_stats
from weather_data_pipeline_spark.operators.text import dup_span_stats

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# random simple graphs as ordered edge sets over <= 8 nodes
edge_sets = st.sets(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] < e[1]),
    min_size=1,
    max_size=12,
)


def _adj(edges):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


@SET
@given(edges=edge_sets)
def test_triangle_stats_matches_bruteforce(spark, edges):
    adj = _adj(edges)
    tri_ref = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri_ref[a] += 1
            tri_ref[b] += 1
            tri_ref[c] += 1
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {r.node: (r.degree, r.n_triangles) for r in triangle_stats(df).collect()}
    assert got == {n: (len(adj[n]), tri_ref[n]) for n in adj}


@SET
@given(edges=edge_sets, k=st.integers(2, 3))
def test_k_core_matches_iterative_peel(spark, edges, k):
    adj = _adj(edges)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {r.node: r.core_degree for r in k_core(df, k=k).collect()}
    assert got == {n: len(adj[n]) for n in adj}


# tiny vocab so duplicated trigrams actually occur across random docs
words = st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=10)
corpora = st.lists(words, min_size=2, max_size=5)


def _spans_ref(corpus, kk=3):
    grams: dict[tuple, set[int]] = {}
    for did, w in enumerate(corpus):
        for i in range(len(w) - kk + 1):
            grams.setdefault(tuple(w[i : i + kk]), set()).add(did)
    out = {}
    for did, w in enumerate(corpus):
        if not w:
            continue
        marked = set()
        for i in range(len(w) - kk + 1):
            if len(grams[tuple(w[i : i + kk])]) >= 2:
                marked.update(range(i, i + kk))
        # merged spans = runs of consecutive marked positions
        n_spans = sum(
            1 for p in marked if p - 1 not in marked
        )
        out[did] = (len(w), n_spans, len(marked))
    return out


@SET
@given(corpus=corpora)
def test_dup_span_stats_matches_bruteforce(spark, corpus):
    rows = [(i, " ".join(w)) for i, w in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens)
        for r in dup_span_stats(df, k=3).collect()
    }
    assert got == _spans_ref(corpus)


# integer-coordinate embeddings: dot products are exact in BOTH the decimal
# fold and the numpy double reference, so the argmax comparison is exact
emb_rows = st.lists(
    st.tuples(
        st.lists(st.integers(1, 9), min_size=3, max_size=3),
        st.integers(0, 2),
    ),
    min_size=2,
    max_size=8,
)


@SET
@given(rows=emb_rows)
def test_hard_negatives_matches_numpy_argmax(spark, rows):
    import numpy as np

    from weather_data_pipeline_spark.operators.similarity import hard_negatives

    data = [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(rows)]
    mat = np.array([v for _, v, _ in data])
    labs = np.array([lab for _, _, lab in data])
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = (mat @ mat.T) / np.outer(norms, norms)
    ref = {}
    for i in range(len(data)):
        cand = [
            (-sims[i, j], j) for j in range(len(data)) if labs[j] != labs[i]
        ]
        if cand:
            ref[i] = min(cand)[1]  # max cosine, ties -> smallest id
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    )
    got = {r.vec_id: r.hard_negative_id for r in hard_negatives(df).collect()}
    assert got == ref


words4 = st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=6)


@SET
@given(corpus=st.lists(words4, min_size=1, max_size=5))
def test_bigram_nll_matches_python_reference(spark, corpus):
    import math

    from weather_data_pipeline_spark.plans.queries import REGISTRY

    # reference: add-one-smoothed bigram NLL with 6dp-rounded log terms
    docs = [w for w in corpus if w]
    pc: dict[tuple, int] = {}
    vocab = set()
    for w in docs:
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            pc[(a, b)] = pc.get((a, b), 0) + 1
    ctx: dict[str, int] = {}
    for (a, _), n in pc.items():
        ctx[a] = ctx.get(a, 0) + n
    V = len(vocab)
    ref = {}
    for did, w in enumerate(docs):
        if len(w) < 2:
            continue
        terms = [
            round(math.log((pc[(a, b)] + 1) / (ctx[a] + V)), 6)
            for a, b in zip(w, w[1:])
        ]
        ref[did] = (len(terms), round(-sum(terms) / len(terms), 9))
    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, t, "en", "srcX", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{td}/documents.parquet")
        got = {
            r.doc_id: (r.n_bigrams, round(r.avg_nll, 9))
            for r in REGISTRY["bigram_nll_documents"].spark(spark, td).collect()
        }
    assert got == ref


vals = st.lists(
    st.floats(-100, 100, allow_nan=False, width=32), min_size=1, max_size=40
)


@SET
@given(values=vals)
def test_winsorize_matches_numpy_percentiles(spark, values, tmp_path_factory):
    # exercises the REGISTERED query (not a re-implementation of its clip)
    # on a synthetic events table: Spark percentile() uses linear
    # interpolation == np.percentile default
    import datetime
    import numpy as np

    from weather_data_pipeline_spark.plans.queries import REGISTRY

    td = tmp_path_factory.mktemp("wz")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "t", float(v), "{}") for i, v in enumerate(values)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(td / "events.parquet"))
    got = {
        r.event_id: r.value_winsorized
        for r in REGISTRY["winsorize_value_events"].spark(spark, str(td)).collect()
    }
    arr = np.array(values, dtype=np.float64)
    lo, hi = np.percentile(arr, 5), np.percentile(arr, 95)
    ref = np.clip(arr, lo, hi)
    for i, v in enumerate(ref):
        # numpy's interpolation arithmetic differs from Spark/DuckDB in the
        # last ulp (the ENGINE parity is exact — pinned by the oracle); the
        # numpy reference only needs to agree to float tolerance
        assert abs(got[i] - v) <= 1e-9 * max(1.0, abs(v)), (i, got[i], v)


@SET
@given(rows=emb_rows)
def test_hard_negatives_block_grid_invariant_to_block_size(spark, rows):
    """The block-pair grid decomposition must be lossless: forcing every
    block size from 1 (every row its own block) through n yields the same
    winners as the single-block case and the numpy reference."""
    import numpy as np

    from weather_data_pipeline_spark.operators.similarity import hard_negatives

    data = [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(rows)]
    mat = np.array([v for _, v, _ in data])
    labs = np.array([lab for _, _, lab in data])
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = (mat @ mat.T) / np.outer(norms, norms)
    ref = {}
    for i in range(len(data)):
        cand = [(-sims[i, j], j) for j in range(len(data)) if labs[j] != labs[i]]
        if cand:
            ref[i] = min(cand)[1]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>, label int")
    for block_rows in (1, 2, len(data)):
        got = {
            r.vec_id: r.hard_negative_id
            for r in hard_negatives(df, block_rows=block_rows).collect()
        }
        assert got == ref, f"block_rows={block_rows}"


@SET
@given(rows=emb_rows)
def test_near_dup_block_grid_matches_numpy_all_pairs(spark, rows):
    import numpy as np

    from weather_data_pipeline_spark.operators.similarity import cosine_near_dup_pairs

    data = [(i, [float(x) for x in v]) for i, (v, _) in enumerate(rows)]
    mat = np.array([v for _, v in data])
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = (mat @ mat.T) / np.outer(norms, norms)
    thr = 0.9
    ref = {
        (i, j)
        for i in range(len(data))
        for j in range(i + 1, len(data))
        if sims[i, j] >= thr
    }
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    for block_rows in (1, 3, len(data)):
        got = {
            (r.id_a, r.id_b)
            for r in cosine_near_dup_pairs(df, thr, block_rows=block_rows).collect()
        }
        assert got == ref, f"block_rows={block_rows}"
