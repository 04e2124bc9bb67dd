"""Deduplication operators over `documents` — exact and near-dup.

Training-data-pipeline dedup family (beyond-reference mandate):

- exact: md5-fingerprint groupBy (one shuffle on the 16-byte key).
- unigram/ngram Jaccard: explode distinct shingles → self-join on shingle
  within a block → count common / inclusion-exclusion. Blocked by `lang` so
  the candidate space never goes quadratic in the corpus.
- MinHash + LSH: k portable hash permutations over shingle hashes via
  higher-order array functions (no UDF, no shuffle for signatures); banding
  turns near-dup search into an equi-join on (band, band-hash) — the 100 TB
  path, since candidate generation is linear in corpus size.
- SimHash: 16-bit sign-vote fingerprint; hamming-close pairs via band join.
- embedding cosine near-dup: see similarity.py.

All hashes are md5-derived (portable across engines) so every operator here
has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import add_fingerprint, portable_token_hash, shingle_set, tokens

# MinHash parameters: k permutations h_i(x) = (a_i·x + b_i) mod P over the
# 31-bit reduction of the portable token hash. P = 2^31−1 (Mersenne prime);
# a_i,b_i fixed odd constants < P so a_i·x fits comfortably in int64.
MINHASH_P = 2_147_483_647
MINHASH_AB = [
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (134_775_813, 1),
    (1_664_525, 1_013_904_223),
    (22_695_477, 1_000_000_007),
    (69_069, 362_437),
    (48_271, 39_916_801),
    (16_807, 2_147_483_587),
]
N_BANDS = 4  # 4 bands × 2 rows: candidates iff any band matches


def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level exact-dup audit: total docs, distinct fingerprints,
    groups with >1 member (reference A9 duplicate audit generalized)."""
    fp = add_fingerprint(df, text_col)
    groups = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum((F.col("n") > 1).cast("long")).alias("n_dup_groups"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(F.lit(0))).alias(
            "n_redundant"
        ),
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per fingerprint (deterministic survivor —
    `dropDuplicates` picks an arbitrary row, which is not replayable)."""
    fp = add_fingerprint(df, text_col)
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )


def distinct_token_set(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    block_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-Jaccard near-dup pairs within blocks — exact result, computed
    over UNIQUE TOKEN SETS.

    Naive shape (explode all tokens → self-join on (block, token) → count)
    is quadratic in the per-token posting lists: on a corpus with shared
    vocabulary every token is near-universal and the join materializes
    ~Σ df(tok)² rows (26 s at sf0.1). Instead:

    1. collapse documents to unique (block, token-set) groups — one md5
       shuffle; duplicate-heavy corpora (the ones where near-dup pairs are
       dense in the first place) shrink by orders of magnitude;
    2. same-set doc pairs are emitted directly with jaccard = 1.0;
    3. the inverted-index join runs only between DISTINCT sets, with the
       standard length-ratio prune (J ≥ t ⇒ min|A|,|B| ≥ t·max|A|,|B|)
       applied inside the join;
    4. qualifying set pairs expand back to their doc-id lists.

    The jaccard division is the same int/int double arithmetic as before —
    exact and engine-portable, so the DuckDB oracle is unchanged. Scale:
    `block_col` bounds fanout; a set duplicated k times contributes C(k,2)
    OUTPUT pairs, so the expansion cost is the result size itself. For an
    unblocked corpus swap in minhash_lsh_candidates below."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.array_sort(distinct_token_set(F.col(text_col))).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))
    sets = (
        base.withColumn(
            "fp", F.md5(F.concat_ws("\x01", F.col("blk"), F.array_join("toks", " ")))
        )
        .groupBy("fp")
        .agg(
            F.first("blk").alias("blk"),
            F.first("toks").alias("toks"),
            F.first("n_toks").alias("n_toks"),
            F.sort_array(F.collect_list("id")).alias("ids"),
        )
        # materialize the unique-set table ONCE: it feeds six consumers
        # (same-pairs, the inverted index, token ranks, both verification
        # lookups, both expansion lookups) which would otherwise each replay
        # the scan+tokenize+groupBy. localCheckpoint (graph.py precedent)
        # truncates lineage without a persist() the session would leak —
        # blocks are dropped by the ContextCleaner when the frame is GC'd.
        .localCheckpoint(eager=True)
    )
    # (2) identical sets: every doc pair inside one group, jaccard exactly 1
    same = (
        sets.select("n_toks", "ids", F.explode("ids").alias("id_a"))
        .select("n_toks", "id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.col("n_toks").cast("bigint").alias("n_common"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    # (3) distinct-set candidates via PREFIX-FILTERED inverted index
    # (AllPairs/PPJoin): J(A,B) >= t implies the (|A| - ceil(t|A|) + 1)-
    # prefixes of A and B under one global token order intersect. Ordering
    # tokens rarest-first makes those prefixes the shortest posting lists,
    # so the candidate join touches a tiny fraction of the index.
    ex = sets.select("fp", "blk", "n_toks", F.explode("toks").alias("tok"))
    rank_df = (
        ex.groupBy("blk", "tok")
        .agg(F.count(F.lit(1)).alias("df_tok"))
        .withColumn(
            "tok_rank",
            F.row_number().over(
                Window.partitionBy("blk").orderBy("df_tok", "tok")
            ),
        )
        .select("blk", "tok", "tok_rank")
    )
    # prefix length with floor (>= the canonical ceil form — safe)
    pref_len = (
        F.col("n_toks")
        - F.floor(F.lit(threshold) * F.col("n_toks").cast("double")).cast("int")
        + F.lit(1)
    )
    pref = (
        ex.join(F.broadcast(rank_df), ["blk", "tok"])
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("fp").orderBy("tok_rank")),
        )
        .where(F.col("pos") <= pref_len)
        .select("fp", "blk", "n_toks", "tok")
        # the prefix index is tiny, so AQE would coalesce it to ~1 partition
        # — but the candidate join FANS OUT from here (posting-list cross
        # products) and the exact verification that follows must run wide;
        # round-robin repartition keeps that whole map stage parallel
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    a, b = pref.alias("a"), F.broadcast(pref.alias("b"))
    ratio_ok = F.least(F.col("a.n_toks"), F.col("b.n_toks")).cast("double") >= (
        F.lit(threshold)
        * F.greatest(F.col("a.n_toks"), F.col("b.n_toks")).cast("double")
    )
    # one candidate row per SHARED prefix token — dedup to unique (fp_a,
    # fp_b) pairs BEFORE the exact verification, not after: measured at
    # sf0.1 the raw candidate stream is 9.39M rows vs 1.49M unique pairs
    # (6.3×), and every duplicate row was paying the two lookup joins plus
    # the full array_intersect. distinct's map-side partial dedup keeps the
    # exchange far below the raw stream; the verify then runs once per pair.
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.fp") < F.col("b.fp"))
            & ratio_ok,
        )
        .select(F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"))
        .distinct()
        # AQE would coalesce the deduped exchange toward the advisory size
        # and run the per-pair array_intersect on a handful of tasks — the
        # same fan-in hazard as the prefix index above; explicit repartition
        # is never coalesced
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    # exact verification: |A ∩ B| over the full token arrays; the unique-set
    # table is tiny relative to the candidate stream -> broadcast both side
    # lookups so verification is map-side (no candidate shuffle at all)
    verified = (
        cand.join(
            F.broadcast(
                sets.select(
                    F.col("fp").alias("fp_a"),
                    F.col("toks").alias("toks_a"),
                    F.col("n_toks").alias("na"),
                )
            ),
            "fp_a",
        )
        .join(
            F.broadcast(
                sets.select(
                    F.col("fp").alias("fp_b"),
                    F.col("toks").alias("toks_b"),
                    F.col("n_toks").alias("nb"),
                )
            ),
            "fp_b",
        )
        .withColumn(
            "n_common", F.size(F.array_intersect("toks_a", "toks_b")).cast("bigint")
        )
    )
    jac = F.col("n_common").cast("double") / (
        (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
    )
    # candidates are already unique pairs, so the post-filter frame needs no
    # second distinct
    qualifying = (
        verified.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("fp_a", "fp_b", "n_common", "jaccard")
    )
    # (4) expand set pairs back to doc pairs (disjoint id lists; orient by id)
    cross = (
        qualifying.join(
            F.broadcast(
                sets.select(F.col("fp").alias("fp_a"), F.col("ids").alias("ids_a"))
            ),
            "fp_a",
        )
        .join(
            F.broadcast(
                sets.select(F.col("fp").alias("fp_b"), F.col("ids").alias("ids_b"))
            ),
            "fp_b",
        )
        .select("n_common", "jaccard", F.explode("ids_a").alias("ia"), "ids_b")
        .select("n_common", "jaccard", "ia", F.explode("ids_b").alias("ib"))
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "n_common",
            "jaccard",
        )
    )
    return same.unionByName(cross).orderBy("id_a", "id_b")


def _perm(a: int, b: int):
    return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P


def add_minhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """k minhash values as named columns, via array higher-order functions —
    per-row, no UDF, no shuffle. Defined over 3-gram shingles (unigram sets
    degenerate on small vocabularies — every pair becomes a candidate). The
    md5 shingle hashing is materialized ONCE into an intermediate column;
    each permutation then scans the precomputed int array (Catalyst does not
    CSE the md5 across k projections — hashing inside each transform made
    this 8× slower)."""
    hset = F.transform(
        shingle_set(F.col(text_col)),
        lambda t: portable_token_hash(t) % MINHASH_P,
    )
    out = df.withColumn("_hset", hset)
    out = out.withColumns(
        {
            f"mh_{i}": F.array_min(F.transform(F.col("_hset"), _perm(ai, bi)))
            for i, (ai, bi) in enumerate(MINHASH_AB)
        }
    )
    return out.drop("_hset")


def minhash_lsh_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """LSH banding: N_BANDS bands of k/N_BANDS rows; docs are candidates iff
    some band's signature slice matches exactly. Candidate generation is an
    equi-join on (band_id, band_key) — linear scan + one shuffle, no O(n²).
    Returns candidate pairs with the minhash-estimated Jaccard."""
    k = len(MINHASH_AB)
    rows_per_band = k // N_BANDS
    # repartition before the signature compute: a small single-file corpus
    # arrives as ONE scan partition, serializing the md5/shingle work — the
    # narrow repartition spreads it across every core/executor
    base = df.select(F.col(id_col).alias("id"), text_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    # Signatures are computed exactly once: each doc row fans out to N_BANDS
    # band rows, then a single groupBy(band, key) collects co-bucketed docs.
    # (The previous design self-joined the band frame, which either recomputes
    # the md5/minhash plan on both sides or needs a persist() that leaks cached
    # partitions across calls — the bucket-groupBy needs neither.)
    sigs = add_minhash(base, text_col).drop(text_col)
    sig_arr = F.array(*[F.col(f"mh_{i}") for i in range(k)])
    bands = sigs.select(
        "id",
        sig_arr.alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh_{bi * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for bi in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.key")
    # One shuffle: bucket docs sharing a band key, emit intra-bucket pairs.
    # Bucket membership is sorted by id so pairs come out (id_a < id_b); the
    # estimated Jaccard is the fraction of equal signature components,
    # computed via zip_with over the carried signature arrays (no re-join).
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(F.struct("id", "sig"))).alias("docs"))
        .where(F.size("docs") > 1)
    )
    pair_idx = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size("docs") - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size("docs") - 1),
                lambda j: F.struct(i.alias("i"), j.alias("j")),
            ),
        )
    )
    matches = F.zip_with(
        F.col("da.sig"), F.col("db.sig"), lambda x, y: (x == y).cast("int")
    )
    est = (
        F.aggregate(matches, F.lit(0), lambda acc, x: acc + x).cast("double")
        / F.lit(float(k))
    )
    return (
        buckets.select(F.col("docs"), F.explode(pair_idx).alias("p"))
        .select(
            F.col("docs")[F.col("p.i")].alias("da"),
            F.col("docs")[F.col("p.j")].alias("db"),
        )
        .select(
            F.col("da.id").alias("id_a"),
            F.col("db.id").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .distinct()
        .orderBy("id_a", "id_b")
    )


def simhash_expr(text: Column, bits: int = 16) -> Column:
    """SimHash fingerprint: for each bit j, vote +1/−1 per distinct token
    according to bit j of its portable hash; bit j of the output is 1 iff the
    vote is positive. Pure array algebra, per-row.

    The hashed-token array is let-bound through a single-element `transform`
    so tokenize+md5 run once per row: referencing the hash-set expression
    from each of the `bits` aggregates would re-evaluate it per bit
    (Catalyst does no CSE inside HOF lambdas)."""

    def voter(j):
        def f(acc, h):
            bit = F.shiftright(h, j).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return f

    def build(hs: Column) -> Column:
        sim = F.lit(0).cast("bigint")
        for j in range(bits):
            vote = F.aggregate(hs, F.lit(0).cast("bigint"), voter(j))
            sim = sim + F.when(vote > 0, F.lit(2**j)).otherwise(F.lit(0))
        return sim

    hset = F.transform(distinct_token_set(text), portable_token_hash)
    return F.element_at(F.transform(F.array(hset), build), 1)


def add_simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    return df.withColumn("simhash", simhash_expr(F.col(text_col), bits))


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: all pairs with Hamming distance ≤ max_hamming
    between their `bits`-bit simhashes.

    Candidate generation is banded exactly like minhash-LSH: split the
    simhash into n_bands bit-slices; by pigeonhole any pair within
    max_hamming < n_bands differing bits agrees on at least one whole band,
    so an equi-join (here: bucket groupBy + intra-bucket pairs, one shuffle)
    on (band, slice-value) finds EVERY qualifying pair — linear in corpus,
    no O(n²), no recall loss. The exact Hamming filter is then one
    bit_count(xor) per candidate."""
    assert max_hamming < n_bands, "pigeonhole guarantee needs max_hamming < n_bands"
    assert bits % n_bands == 0
    width = bits // n_bands
    mask = (1 << width) - 1
    base = df.select(F.col(id_col).alias("id"), text_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    # Fingerprints via explode + codegen'd bit-count sums rather than the
    # scalar simhash_expr (r11): the expression form runs `bits` interpreted
    # HOF aggregates per row — 32 × |token set| lambda evaluations per doc,
    # ~32M for this corpus — while this shape hashes each token ONCE and
    # computes the 32 per-bit counts as whole-stage-codegen conditional
    # sums. Identical values: bit j's vote (+1 per set bit, −1 per clear)
    # is positive iff 2·cnt_j > n over the SAME distinct-token hash set,
    # all in exact integer arithmetic; docs with an empty token set
    # (dropped by the explode) re-enter with simhash 0, exactly what the
    # fold over an empty array produced. Cost: one extra doc-key shuffle of
    # 33 pre-aggregated longs per doc — dimension-cardinality, scales.
    hs = base.select(
        "id",
        F.explode(
            F.transform(distinct_token_set(F.col(text_col)), portable_token_hash)
        ).alias("h"),
    )
    cnts = hs.groupBy("id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftright("h", j).bitwiseAND(F.lit(1))).alias(f"_c{j}")
            for j in range(bits)
        ],
    )
    sh_expr = None
    for j in range(bits):
        term = F.when(
            F.col(f"_c{j}") * 2 > F.col("_n"), F.lit(2**j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        sh_expr = term if sh_expr is None else sh_expr + term
    sims = (
        base.select("id")
        .join(cnts.select("id", sh_expr.alias("sh")), "id", "left")
        .select("id", F.coalesce("sh", F.lit(0).cast("bigint")).alias("sh"))
    )
    bands = sims.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright("sh", j * width).bitwiseAND(F.lit(mask)).alias("bv"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", "bk.band", "bk.bv")
    buckets = (
        bands.groupBy("band", "bv")
        .agg(F.sort_array(F.collect_list(F.struct("id", "sh"))).alias("docs"))
        .where(F.size("docs") > 1)
    )
    pair_idx = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size("docs") - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size("docs") - 1),
                lambda j: F.struct(i.alias("i"), j.alias("j")),
            ),
        )
    )
    hamming = F.bit_count(F.col("da.sh").bitwiseXOR(F.col("db.sh")))
    return (
        buckets.select(F.col("docs"), F.explode(pair_idx).alias("p"))
        .select(
            F.col("docs")[F.col("p.i")].alias("da"),
            F.col("docs")[F.col("p.j")].alias("db"),
        )
        .select(
            F.col("da.id").alias("id_a"),
            F.col("db.id").alias("id_b"),
            hamming.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("id_a", "id_b")
    )


def passage_chunks(text: Column, chunk_words: int = 8) -> Column:
    """Non-overlapping `chunk_words`-word passages of the tokenized text
    (tail passage may be shorter). Passage-level exact dedup is the standard
    boilerplate detector in training-data pipelines: a passage repeated
    across many documents (headers, license blocks, navigation chrome) is
    boilerplate even when the documents as wholes are unique."""

    def build(t: Column) -> Column:
        n_chunks = F.greatest(
            F.lit(1), F.ceil(F.size(t) / F.lit(float(chunk_words))).cast("bigint")
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(t, i * chunk_words + 1, F.lit(chunk_words)), " "
            ),
        )

    # let-bind the token array (HOF lambdas defeat CSE; see shingle_set)
    return F.flatten(F.transform(F.array(tokens(text)), build))


def passage_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 8,
) -> DataFrame:
    """Per-document boilerplate audit from corpus-global passage frequency.

    Plan shape (the 100 TB design): explode passages (linear in corpus
    bytes), ONE shuffle partitioned by the 16-byte md5 passage key with a
    window count (no self-join, no second scan), then a groupBy back on the
    doc id. A passage is "dup" when its text occurs more than once anywhere
    in the corpus.
    """
    chunks = df.select(
        F.col(id_col),
        F.explode(passage_chunks(F.col(text_col), chunk_words)).alias("chunk"),
    ).select(F.col(id_col), F.md5(F.col("chunk")).alias("h"))
    freq = F.count(F.lit(1)).over(Window.partitionBy("h"))
    per_chunk = chunks.withColumn("f", freq)
    n_chunks = F.count(F.lit(1)).alias("n_chunks")
    n_dup = F.sum((F.col("f") > 1).cast("bigint")).alias("n_dup_chunks")
    return (
        per_chunk.groupBy(id_col)
        .agg(n_chunks, n_dup)
        .withColumn(
            "boilerplate_ratio",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks").cast("double"), 6),
        )
    )
