"""Text-analysis operators over the `documents` table.

Beyond-reference mandate: the operations a large-scale training-data pipeline
needs — token counting, quality scoring, language ID, fingerprinting. All are
native Column expressions (split / higher-order array functions / md5), so
they run JVM-side inside whole-stage codegen with no Python in the hot path;
at 100 TB these are embarrassingly parallel scans with no shuffle at all.

Parity notes: tokenization is `split(trim(text), '\\s+')`, identical to
DuckDB `regexp_split_to_array`; hashes are md5-derived (engine-portable,
unlike xxhash64/murmur which differ between engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed stopword set (the synthetic corpus is lowercase English-ish).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# Marker vocabularies for the language-ID heuristic. On real corpora these
# would be per-language stopword lists; scoring/argmax machinery is the same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}


def _in_set(values):
    """Single-arg lambda factory: PySpark HOFs introspect lambda arity, so
    default-arg captures (lambda x, m=...) are misread as multi-arg."""

    def f(x):
        return x.isin(*values)

    return f


def tokens(text: Column) -> Column:
    """Whitespace tokenization (matches DuckDB regexp_split_to_array)."""
    return F.split(F.trim(text), r"\s+")


def add_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, distinct-token count, type-token ratio, stopword ratio.

    The token array is materialized into a (dropped) column first so the
    split runs once per row — each stat then reads the bound attribute
    instead of re-embedding the split expression."""
    t = F.col("_toks")
    n = F.size(t)
    n_uniq = F.size(F.array_distinct(t))
    n_stop = F.size(F.filter(t, _in_set(STOPWORDS)))
    return (
        df.withColumn("_toks", tokens(F.col(text_col)))
        .withColumns(
            {
                "n_tokens": n.cast("long"),
                "n_unique_tokens": n_uniq.cast("long"),
                "type_token_ratio": n_uniq.cast("double") / n.cast("double"),
                "stopword_ratio": n_stop.cast("double") / n.cast("double"),
            }
        )
        .drop("_toks")
    )


def add_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document quality score in [0,1]:
    0.4·min(n_tokens/100,1) + 0.3·type_token_ratio + 0.3·(1−stopword_ratio).
    The shape mirrors heuristic quality filters in training-data pipelines
    (length + lexical diversity + boilerplate penalty)."""
    out = add_token_stats(df, text_col)
    length_term = F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_term
        + F.lit(0.3) * F.col("type_token_ratio")
        + F.lit(0.3) * (F.lit(1.0) - F.col("stopword_ratio"))
    )
    return out.withColumn("quality_score", score)


def add_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language by marker hits in the
    token list; argmax with fixed precedence (en>de>es>fr>zh) on ties.

    Scores are materialized as columns FIRST and the argmax chain reads the
    bound attributes: building the when-chain directly over the filter
    expressions duplicates each score's subtree ~2^k times (Catalyst has no
    CSE inside the chain), and each duplicate re-tokenizes the text."""
    toks = tokens(F.col(text_col))
    out = df.withColumn("_toks", toks).withColumns(
        {
            f"score_{lang}": F.size(F.filter(F.col("_toks"), _in_set(markers))).cast(
                "long"
            )
            for lang, markers in LANG_MARKERS.items()
        }
    ).drop("_toks")
    ordered = ["en", "de", "es", "fr", "zh"]
    best = F.col(f"score_{ordered[0]}")
    pred = F.lit(ordered[0])
    for lang in ordered[1:]:
        cond = F.col(f"score_{lang}") > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, F.col(f"score_{lang}")).otherwise(best)
    return out.withColumn("predicted_lang", pred)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased text
    (exact-dedup key; reference analog is the UNIQUE(city,timestamp) key,
    `weather_collector.py:157`)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fp", fingerprint(F.col(text_col)))


def shingle_set(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. MinHash is defined over shingles, not
    unigrams: with a small vocabulary unigram sets all collide (Jaccard ≈ 1
    between any two long docs), which degenerates LSH into all-pairs; n-gram
    shingles keep near-dup candidates sparse.

    Implementation note: the token array is LET-BOUND via a single-element
    `transform` so it is evaluated once per row. Catalyst does not eliminate
    common subexpressions inside HOF lambdas — naively referencing
    `tokens(text)` from the per-shingle lambda re-splits the text for every
    `element_at` (n splits per shingle; ~20× slower on the documents table)."""

    def build(t: Column) -> Column:
        # guard: Spark sequence(1, 0) counts DOWN ([1,0]); short docs → empty
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.expr("array()").cast("array<int>"))

        def gram(i: Column) -> Column:
            return F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])

        return F.transform(idx, gram)

    return F.array_distinct(F.flatten(F.transform(F.array(tokens(text)), build)))


def portable_token_hash(tok: Column) -> Column:
    """60-bit integer hash from md5 — identical in Spark and DuckDB (unlike
    engine-native hash functions). Used by minhash/simhash."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint")


def winnowing_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash all
    character k-grams of the normalized text, then keep the minimum hash of
    every w-length window — the classic rolling-hash fingerprint set used
    for plagiarism/near-dup detection. Deterministic and engine-portable
    (md5-derived hashes, plain min — the rightmost-tie refinement is
    dropped since distinct-set output makes it irrelevant).

    Pure array algebra per row, with BOTH expensive intermediates let-bound
    (the module's no-CSE-in-HOF-lambdas trap): the normalized string via a
    single-element transform — referencing `lower(trim(text))` directly from
    the per-position hash lambda re-lowered the whole string once per
    character position (~1.5M times at sf0.1; 10 s → 1.5 s) — and the hash
    array likewise, so k-gram hashing runs once, not once per window."""
    empty_i = F.expr("array()").cast("array<int>")

    def windows(h: Column) -> Column:
        widx = F.when(
            F.size(h) >= w, F.sequence(F.lit(1), F.size(h) - (w - 1))
        ).otherwise(empty_i)
        return F.transform(widx, lambda i: F.array_min(F.slice(h, i, w)))

    def from_chars(cs: Column) -> Column:
        # k-grams sliced from a char ARRAY: string substr(i, k) re-scans the
        # UTF8 string from position 0 each call (O(n) per gram, O(n²) per
        # doc); array slice indexes directly (another 2.5× on top of the
        # norm binding)
        n = F.size(cs)
        idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(empty_i)
        hs = F.transform(
            idx,
            lambda i: portable_token_hash(F.array_join(F.slice(cs, i, k), "")),
        )
        return F.flatten(F.transform(F.array(hs), windows))

    return F.array_distinct(
        F.flatten(
            F.transform(F.array(F.split(F.lower(F.trim(text)), "")), from_chars)
        )
    )


# Symbol alphabet for the character-entropy quality signal: ASCII letters +
# space. Anything else (digits, punctuation, non-Latin) is simply not
# counted; `n_counted_chars` exposes how much of the doc the estimate saw.
ENTROPY_SYMBOLS: tuple[str, ...] = tuple("abcdefghijklmnopqrstuvwxyz ")


def add_char_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy (nats) of the {a-z, space} character distribution.

    Low-entropy text (repeated characters, degenerate boilerplate) is a
    standard cheap quality filter in training-data pipelines. The per-symbol
    counts use the `length(x) - length(replace(x, c))` trick — 27 scalar
    expressions over the lowered text, zero explode, zero shuffle, pure
    whole-stage codegen; DuckDB mirrors it verbatim so the oracle is
    bit-identical (terms summed in the same fixed order, rounded 6 dp,
    `+ 0.0` to normalize a possible -0.0).
    """
    b = F.col("_low")
    # let-bind every per-symbol count as a real column so each replace()
    # runs once per row even though the count feeds total + 3 entropy uses
    cnt_cols = {
        f"_c{i}": (F.length(b) - F.length(F.replace(b, F.lit(c)))).cast("double")
        for i, c in enumerate(ENTROPY_SYMBOLS)
    }
    out = df.withColumn("_low", F.lower(F.col(text_col))).withColumns(cnt_cols)
    counts = [F.col(name) for name in cnt_cols]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    out = out.withColumn("_tot", total)
    t = F.col("_tot")
    ent = F.lit(0.0)
    for c in counts:
        ent = ent + F.when(c > 0, (c / t) * F.log(c / t)).otherwise(F.lit(0.0))
    return (
        out.withColumn("n_counted_chars", t.cast("bigint"))
        .withColumn(
            "char_entropy",
            F.when(t > 0, F.round(-ent, 6) + F.lit(0.0)).otherwise(F.lit(0.0)),
        )
        .drop("_low", "_tot", *cnt_cols)
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. 2022, arXiv:2107.06499):
    token k-grams occurring in >= `min_docs` distinct documents mark
    duplicated positions; overlapping marked spans merge (gaps-and-islands)
    and each document reports its duplicated-token count and fraction.

    Output: id_col, n_tokens, n_dup_spans, dup_tokens, dup_frac.

    100 TB shape: the k-gram -> distinct-doc-count groupBy is the single
    corpus-size shuffle (linear in total tokens — the MapReduce-friendly
    alternative to the paper's single-node suffix array); span merging is a
    per-document window after one id_col exchange. No Python in the path.
    """
    from pyspark.sql import Window

    t = df.where(F.length(F.trim(text_col)) > 0).select(
        id_col, F.split(F.trim(F.lower(text_col)), r"\s+").alias("w")
    )
    gram_struct = (
        f"transform(sequence(1, size(w) - {k - 1}), "
        f"i -> struct(i AS pos, concat_ws(' ', "
        + ", ".join(f"w[i+{j - 1}]" for j in range(k))
        + ") AS gram))"
    )
    g = (
        t.where(F.size("w") >= k)
        .select(id_col, F.explode(F.expr(gram_struct)).alias("s"))
        .select(id_col, "s.pos", "s.gram")
    )
    dup = (
        g.select("gram", id_col)
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gram")
    )
    hits = g.join(dup, "gram").select(
        id_col, "pos", (F.col("pos") + (k - 1)).alias("endp")
    )
    wp = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max("endp").over(wp.rowsBetween(Window.unboundedPreceding, -1))
    # a new island starts only when the gram leaves a GAP in marked tokens
    # (pos > prev_end + 1): overlapping AND token-adjacent spans merge, so
    # n_dup_spans counts contiguous duplicated REGIONS (property-tested
    # against a marked-token-run reference)
    new_island = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
    ).otherwise(0)
    isl = hits.withColumn("island", F.sum(new_island).over(wp))
    spans = isl.groupBy(id_col, "island").agg(
        F.min("pos").alias("s"), F.max("endp").alias("e")
    )
    agg = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
    )
    return (
        t.select(id_col, F.size("w").cast("long").alias("n_tokens"))
        .join(agg, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double") / F.col("n_tokens"),
                6,
            ).alias("dup_frac"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (training-corpus scrubbing)
# ---------------------------------------------------------------------------
# Patterns are deliberately RE2-compatible (no lookaround, no backrefs) so
# the SAME strings run identically under Spark's Java regex engine and the
# DuckDB (RE2) oracle. Ordered: redaction applies them sequentially, and the
# order matters where classes could overlap (emails before phones so the
# digits inside "user123@x.com" are consumed as part of the email first).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("credit_card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"),
    ("phone", r"\+?\d{1,3}[-. ]\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII census + redacted text: count matches per class and
    replace each with a `[CLASS]` token — the scrub stage every public-crawl
    corpus pipeline runs before training (cf. CCNet/Dolma-style pipelines).

    Pure codegen'd scalar work (regexp_extract_all / regexp_replace): zero
    shuffle, scales as a map-only pass. Counts are computed on the ORIGINAL
    text per class (order-independent census); redaction is sequential in
    PII_PATTERNS order so overlapping classes resolve deterministically.
    """
    out = df.select(
        id_col,
        F.col(text_col),
        *[
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
            for name, pat in PII_PATTERNS
        ],
    )
    red = F.col(text_col)
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    total = None
    for name, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.select(
        id_col,
        *[f"n_{name}" for name, _ in PII_PATTERNS],
        total.alias("n_pii_total"),
        F.md5(red).alias("redacted_md5"),
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: list[str],
    max_banned_ratio: float = 0.02,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Banned-term filter (the C4/Dolma-style blocklist stage): per doc the
    banned-token count, distinct banned terms hit, banned ratio, and the
    keep decision (ratio < threshold).

    The blocklist is embedded as an array literal — for real-world lists
    (thousands of terms) this stays a scalar `array_contains`-free form:
    `array_intersect`/`filter` over the token array are JVM higher-order
    functions, zero shuffle, one codegen'd scan. Ratios are exact decimals
    (banned/total at 6 dp) so the keep boundary is engine-portable."""
    bl = F.array(*[F.lit(t) for t in sorted(blocklist)])
    # null text must yield a TOTAL decision: split(null) is null and
    # size(null) is null, which would leak a null keep flag — a doc the
    # filter neither keeps nor drops. Coalesce the token array to empty so
    # a null doc gets n_tokens=0, banned_ratio NULL (0/0 undefined) and a
    # deterministic keep=0 (nothing worth keeping).
    toks = F.coalesce(F.split(F.trim(F.col(text_col)), r"\s+"), F.array())
    banned = F.filter(toks, lambda t: F.array_contains(bl, t))
    # explicit NULL (not IEEE NaN) when the doc has no tokens
    ratio = F.when(
        F.size(toks) > 0,
        F.round(F.size(banned).cast("double") / F.size(toks), 6),
    )
    return df.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(banned).cast("long").alias("n_banned"),
        F.size(F.array_intersect(F.array_distinct(toks), bl))
        .cast("long")
        .alias("distinct_banned_terms"),
        ratio.alias("banned_ratio"),
        F.coalesce((ratio < F.lit(max_banned_ratio)).cast("int"), F.lit(0)).alias(
            "keep"
        ),
    )
