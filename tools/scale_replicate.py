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


def replicate(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in FIXED:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{out}/{t}.parquet")
    for t, keymap in KEYED.items():
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
            parts.append(rep)
        full = pa.concat_tables(parts)
        pq.write_table(full, f"{out}/{t}.parquet", row_group_size=200_000)
        print(f"{out}/{t}.parquet: {full.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, required=True, help="replica count")
    args = ap.parse_args()
    replicate(args.src, args.out, args.factor)


if __name__ == "__main__":
    main()
