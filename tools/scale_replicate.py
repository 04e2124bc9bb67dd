"""Re-keyed fixture replication: build synthetic sf0.3 / sf1.0 star schemas
from the driver's sf0.1 fixtures so the scaling curve can be MEASURED, not
just argued from plan shapes (VERDICT r03 next-round #1).

Replication must keep join/dedup semantics honest — naive row duplication
would (a) create cross-replica exact duplicates that collapse under dedup and
(b) explode near-dup pair OUTPUT quadratically in the replica count, neither
of which happens when a real corpus grows. Per replica i (replica 0 is the
untouched original):

- **Key domains are offset** (custkey/suppkey/partkey/orderkey/event/user/
  doc/vec ids each get `i * DOMAIN_OFFSET`), with FK columns offset by the
  SAME per-domain constant, so referential structure is preserved and
  replicas never join to each other.
- **Dimension tables (region, nation) stay fixed** — exactly TPC-H's model,
  where dims don't scale with SF.
- **Document text gets a per-replica token bijection** (every token suffixed
  `r{i}`): within-replica token/shingle overlap structure is preserved
  verbatim (a bijection of the token space), while cross-replica Jaccard
  drops to ~0 — the corpus grows with DISTINCT content whose internal
  duplicate structure matches the base, like real crawl growth. Vocabulary
  grows ~R×, which is also what real growth does.
- **Embeddings get a per-replica signed permutation of dimensions** — an
  orthogonal transform, so within-replica cosines are preserved EXACTLY
  while cross-replica cosines decorrelate; near-dup structure scales
  linearly instead of quadratically.
- Timestamps are left unchanged: more users/orders over the same period is
  how event traffic actually scales.

Output layout matches the driver fixtures (`{out}/{table}.parquet`), so every
registered query runs against a replica dir unchanged.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC_DEFAULT = "/root/testdata/sf0.1"

# one offset per KEY DOMAIN — applied to the PK and every FK of that domain
OFF = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# table -> {column: domain}
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

FIXED = ["region", "nation"]


def _offset_keys(tbl: pa.Table, keymap: dict[str, str], i: int) -> pa.Table:
    for col, domain in keymap.items():
        idx = tbl.schema.get_field_index(col)
        arr = pa.compute.add(tbl.column(col), i * OFF[domain])
        # keep the original integer type (add may widen)
        arr = arr.cast(tbl.schema.field(col).type)
        tbl = tbl.set_column(idx, tbl.schema.field(col), arr)
    return tbl


def _transform_documents(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    suf = f"r{i}"
    new = [
        None if t is None else re.sub(r"(\S+)", lambda m: m.group(1) + suf, t)
        for t in texts
    ]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"),
        tbl.schema.field("text"),
        pa.array(new, type=pa.string()),
    )
    # n_chars tracks the transformed text
    tbl = tbl.set_column(
        tbl.schema.get_field_index("n_chars"),
        tbl.schema.field("n_chars"),
        pa.array(
            [None if t is None else len(t) for t in new], type=pa.int64()
        ),
    )
    return tbl


def _transform_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    vecs = tbl.column("embedding").to_pylist()
    dim = len(vecs[0])
    rng = np.random.default_rng(240814 + i)
    perm = rng.permutation(dim)
    signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
    mat = np.array(vecs, dtype=np.float32)
    mat = mat[:, perm] * signs[None, :]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        tbl.schema.field("embedding"),
        pa.array(list(mat), type=tbl.schema.field("embedding").type),
    )
    return tbl


# --- Zipf-skew injection (VERDICT r05 next #1) ------------------------------
# Uniform replicas validate the scale CURVE; real 100 TB corpora are
# Zipf-skewed, and skew is the classic killer of entity-key windows, bucket
# joins and gram aggregations. The --skew mode remaps VALUES on the
# concatenated replica — never adds or drops rows — so a skewed run is
# comparable to its uniform twin at EQUAL row counts:
#   - events: one hot user owns 20 % of all events (event_id % 5 == 0),
#     concentrating every user-partitioned window and groupBy key;
#   - documents: one hot source owns 80 % of documents (doc_id % 5 != 0);
#   - documents: a stopword-heavy token distribution — in half the docs
#     every 3rd token becomes one hot token, so shingle/gram/bucket keys get
#     a Zipf head (hot MinHash buckets, hot bigrams, hot tf-idf terms);
#   - embeddings: 5 % of vectors (vec_id % 20 == 0) collapse to tiny
#     perturbations of one direction — one giant near-dup cluster for the
#     semantic-dedup LSH buckets and the connected-components loops.
HOT_USER = 999_999_999
HOT_SOURCE = "src_hot"
HOT_TOKEN = "zq"


def _skew_events(tbl: pa.Table, part: int = 0) -> pa.Table:
    eid = np.asarray(tbl.column("event_id").to_numpy(zero_copy_only=False))
    uid = np.asarray(tbl.column("user_id").to_numpy(zero_copy_only=False)).copy()
    uid[eid % 5 == 0] = HOT_USER
    idx = tbl.schema.get_field_index("user_id")
    return tbl.set_column(
        idx, tbl.schema.field("user_id"), pa.array(uid, type=pa.int64())
    )


def _skew_documents(tbl: pa.Table, part: int = 0) -> pa.Table:
    did = np.asarray(tbl.column("doc_id").to_numpy(zero_copy_only=False))
    src = np.asarray(tbl.column("source").to_pylist(), dtype=object)
    src[did % 5 != 0] = HOT_SOURCE
    tbl = tbl.set_column(
        tbl.schema.get_field_index("source"),
        tbl.schema.field("source"),
        pa.array(list(src), type=pa.string()),
    )
    texts = tbl.column("text").to_pylist()
    new = []
    for d, t in zip(did, texts):
        if t is None or d % 2 != 0:
            new.append(t)
            continue
        toks = t.split(" ")
        for j in range(0, len(toks), 3):
            toks[j] = HOT_TOKEN
        new.append(" ".join(toks))
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"),
        tbl.schema.field("text"),
        pa.array(new, type=pa.string()),
    )
    return tbl.set_column(
        tbl.schema.get_field_index("n_chars"),
        tbl.schema.field("n_chars"),
        pa.array([None if t is None else len(t) for t in new], type=pa.int64()),
    )


def _skew_embeddings(tbl: pa.Table, part: int = 0) -> pa.Table:
    vid = np.asarray(tbl.column("vec_id").to_numpy(zero_copy_only=False))
    vecs = tbl.column("embedding").to_pylist()
    dim = next((len(v) for v in vecs if v is not None), 0)
    if dim == 0:  # all-null embedding column: nothing to skew (ADVICE r06 —
        return tbl  # the old next() raised a bare StopIteration here)
    # seeded per PART so per-part application (bounded memory) produces the
    # same values regardless of how the replica is chunked; the hot-cluster
    # base direction stays part-independent (same seed for `base` below)
    rng = np.random.default_rng(240815 + 7919 * part)
    base = np.random.default_rng(240815).standard_normal(dim).astype(np.float32)
    base /= np.linalg.norm(base)
    hot = vid % 20 == 0
    for k in np.nonzero(hot)[0]:
        noise = rng.standard_normal(dim).astype(np.float32) * 1e-3
        vecs[int(k)] = list(base + noise)
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        tbl.schema.field("embedding"),
        pa.array(vecs, type=tbl.schema.field("embedding").type),
    )


_SKEW = {
    "events": _skew_events,
    "documents": _skew_documents,
    "embeddings": _skew_embeddings,
}


def replicate(
    src: str,
    out: str,
    factor: int,
    skew: bool = False,
    tables: list[str] | None = None,
) -> None:
    os.makedirs(out, exist_ok=True)
    for t in FIXED:
        if tables and t not in tables:
            continue
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{out}/{t}.parquet")
    for t, keymap in KEYED.items():
        if tables and t not in tables:
            continue
        base = pq.read_table(f"{src}/{t}.parquet")
        # strip pandas metadata; Spark doesn't need it and replicas would
        # carry a stale copy
        base = base.replace_schema_metadata(None)
        parts = []
        for i in range(factor):
            rep = _offset_keys(base, keymap, i)
            if t == "documents":
                rep = _transform_documents(rep, i)
            elif t == "embeddings":
                rep = _transform_embeddings(rep, i)
            # skew applied PER PART (ADVICE r06): the text/embedding skew
            # rewrites materialize python lists of the column, so whole-
            # concatenation application was a factor-x memory cliff; every
            # skew transform is row-local (id % k), so part-wise application
            # produces the same values at one part's footprint
            if skew and t in _SKEW:
                n_before = rep.num_rows
                rep = _SKEW[t](rep, i)
                assert rep.num_rows == n_before  # values only, never rows
            parts.append(rep)
        full = pa.concat_tables(parts)
        pq.write_table(full, f"{out}/{t}.parquet", row_group_size=200_000)
        print(f"{out}/{t}.parquet: {full.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, required=True, help="replica count")
    ap.add_argument(
        "--skew",
        action="store_true",
        help="inject Zipf-hot keys (hot user/source/token, one near-dup "
        "embedding cluster) after replication; row counts stay equal to "
        "the uniform replica so runtimes are comparable",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of tables to replicate (default: all) "
        "— e.g. a documents-only sf10 for the flagship soak",
    )
    args = ap.parse_args()
    replicate(
        args.src,
        args.out,
        args.factor,
        skew=args.skew,
        tables=args.tables.split(",") if args.tables else None,
    )


if __name__ == "__main__":
    main()
