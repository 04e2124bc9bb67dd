"""Re-keyed replication invariants (tools/scale_replicate.py).

The synthetic sf0.3/sf1.0 fixtures back the measured scaling curve
(BENCH_SCALING.json); a replication bug would silently bend every exponent.
Pinned here, at factor=2 over sf0.001:

1. row counts scale by the factor; dims (region/nation) stay fixed;
2. FK integrity survives re-keying (every orders.o_custkey resolves);
3. replicas never join to each other (key ranges are disjoint);
4. the document token bijection keeps within-replica token-set overlap
   IDENTICAL while making cross-replica overlap zero;
5. the embedding signed-permutation preserves within-replica cosines
   exactly while decorrelating cross-replica copies.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from scale_replicate import OFF, replicate  # noqa: E402

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rep_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("rep") / "sf2x"
    replicate(SRC, str(out), 2)
    return str(out)


def test_counts_scale_and_dims_fixed(rep_dir):
    for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        base = pq.read_table(f"{SRC}/{t}.parquet").num_rows
        rep = pq.read_table(f"{rep_dir}/{t}.parquet").num_rows
        assert rep == 2 * base, t
    for t in ["region", "nation"]:
        assert (
            pq.read_table(f"{rep_dir}/{t}.parquet").num_rows
            == pq.read_table(f"{SRC}/{t}.parquet").num_rows
        )


def test_fk_integrity_and_disjoint_replicas(rep_dir):
    cust = set(pq.read_table(f"{rep_dir}/customer.parquet")["c_custkey"].to_pylist())
    ordr = pq.read_table(f"{rep_dir}/orders.parquet")
    assert set(ordr["o_custkey"].to_pylist()) <= cust
    # replica key ranges are disjoint: orders of replica 1 reference ONLY
    # replica-1 customers (offset keys), so replicas never cross-join
    okeys = ordr["o_orderkey"].to_pylist()
    ckeys = ordr["o_custkey"].to_pylist()
    for ok, ck in zip(okeys, ckeys):
        assert (ok >= OFF["orderkey"]) == (ck >= OFF["custkey"])


def test_document_token_bijection(rep_dir):
    base = pq.read_table(f"{SRC}/documents.parquet")
    rep = pq.read_table(f"{rep_dir}/documents.parquet")
    texts = dict(zip(rep["doc_id"].to_pylist(), rep["text"].to_pylist()))
    b0 = dict(zip(base["doc_id"].to_pylist(), base["text"].to_pylist()))
    d0, d1 = sorted(b0)[:2]
    for a, b in [(d0, d1)]:
        s_base_a, s_base_b = set(b0[a].split()), set(b0[b].split())
        # replica 0 untouched
        assert texts[a] == b0[a]
        # replica 1: token sets disjoint from replica 0 ...
        s1_a = set(texts[a + OFF["doc_id"]].split())
        assert not (s1_a & s_base_a)
        # ... but within-replica overlap structure identical (bijection)
        s1_b = set(texts[b + OFF["doc_id"]].split())
        assert len(s1_a & s1_b) == len(s_base_a & s_base_b)
        assert len(s1_a) == len(s_base_a)


def test_embedding_orthogonal_transform(rep_dir):
    base = pq.read_table(f"{SRC}/embeddings.parquet")
    rep = pq.read_table(f"{rep_dir}/embeddings.parquet")
    vb = {i: np.array(v, dtype=np.float64) for i, v in zip(
        base["vec_id"].to_pylist(), base["embedding"].to_pylist())}
    vr = {i: np.array(v, dtype=np.float64) for i, v in zip(
        rep["vec_id"].to_pylist(), rep["embedding"].to_pylist())}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    ids = sorted(vb)[:5]
    off = OFF["vec_id"]
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            # within-replica cosines preserved exactly (signed permutation
            # is orthogonal; float32 storage keeps it bit-exact per element)
            assert cos(vr[a + off], vr[b + off]) == pytest.approx(
                cos(vb[a], vb[b]), abs=1e-12
            )
    # norms preserved too
    for a in ids:
        assert np.linalg.norm(vr[a + off]) == pytest.approx(
            np.linalg.norm(vb[a]), abs=1e-9
        )


# --- round 6: --skew invariants ---------------------------------------------


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("repskew") / "sf2x_skew"
    replicate(SRC, str(out), 2, skew=True)
    return str(out)


def test_skew_changes_values_never_rows(rep_dir, skew_dir):
    """The skewed twin must be comparable to the uniform replica at EQUAL
    row counts — the --skew transforms remap values only."""
    for t in [
        "customer",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
        "region",
        "nation",
    ]:
        u = pq.read_metadata(f"{rep_dir}/{t}.parquet").num_rows
        s = pq.read_metadata(f"{skew_dir}/{t}.parquet").num_rows
        assert s == u, f"{t}: skew changed row count {u} -> {s}"


def test_skew_hot_fractions(skew_dir):
    """The designed Zipf heads: one user owns 20% of events, one source 80%
    of documents, one direction ~5% of embeddings (near-identical cluster)."""
    from scale_replicate import HOT_SOURCE, HOT_USER

    ev = pq.read_table(f"{skew_dir}/events.parquet", columns=["user_id"])
    uid = np.asarray(ev["user_id"].to_pylist())
    assert abs((uid == HOT_USER).mean() - 0.20) < 0.01

    doc = pq.read_table(f"{skew_dir}/documents.parquet", columns=["source"])
    src = np.asarray(doc["source"].to_pylist(), dtype=object)
    assert abs((src == HOT_SOURCE).mean() - 0.80) < 0.01

    emb = pq.read_table(f"{skew_dir}/embeddings.parquet")
    vecs = {
        i: np.array(v, dtype=np.float64)
        for i, v in zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist())
    }
    hot = [v for i, v in vecs.items() if i % 20 == 0]
    assert len(hot) >= 2

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    # every hot pair is a near-duplicate (one direction + 1e-3 noise)
    for i in range(min(5, len(hot) - 1)):
        assert cos(hot[i], hot[i + 1]) > 0.99


def test_skew_stopword_head(skew_dir):
    """Half the docs get every 3rd token replaced by the hot token — the
    token distribution must have a Zipf head on it."""
    from collections import Counter

    from scale_replicate import HOT_TOKEN

    doc = pq.read_table(f"{skew_dir}/documents.parquet", columns=["text"])
    c: Counter = Counter()
    for t in doc["text"].to_pylist():
        if t:
            c.update(t.split(" "))
    total = sum(c.values())
    top, n_top = c.most_common(1)[0]
    assert top == HOT_TOKEN
    assert n_top / total > 0.10  # ~1/6 of all tokens in expectation
