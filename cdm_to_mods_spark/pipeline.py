"""Training-data pipeline operators over documents/embeddings — the
large-scale data-curation surface (dedup, similarity search, text analysis,
multimodal plumbing). First-class alongside the SURVEY §2 inventory.

Registered into the same QUERIES/ORACLE dicts as queries.py. Entries
without an oracle are genuinely non-SQL-portable (hash-function-dependent
sketches, approximate ANN) and get the driver's rows-only check.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F, types as T

from .queries import ORACLE, QUERIES, _q, _t

# ---------------------------------------------------------------------
# Shared shingling (word 3-grams), identical definition in both engines.
# ---------------------------------------------------------------------
def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → distinct word-n-gram set (array column). Native exprs only:
    split → sequence → transform → array_distinct.

    The word array is materialized as its OWN projection first: expressions
    referenced inside a ``transform`` lambda are re-evaluated per element
    (no common-subexpression elimination across the lambda boundary), so
    inlining ``split()`` here costs O(shingles) splits per row — measured
    7× slower on sf0.1."""
    words_col = F.split(F.lower("text"), r"\s+")
    tokenized = df.select("doc_id", words_col.alias("words"))
    w = F.col("words")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
            ),
        )
    )
    return tokenized.filter(F.size(w) >= n).select("doc_id", sh.alias("shingles"))


_DUCK_SHINGLES = (
    "WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') words "
    "FROM documents), sh AS (SELECT doc_id, list_distinct(list_transform("
    "range(1, len(words)-1), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]"
    ")) shingles FROM w WHERE len(words) >= 3)"
)


# ---------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------
def d1_exact_dedup_df(docs: DataFrame) -> DataFrame:
    """DataFrame core of d1 (any (doc_id, text) relation — also the SQL
    TVF ``dedup_exact('t')``, sql.py)."""
    return (
        docs
        .groupBy(F.md5(F.lower(F.trim("text"))).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@_q(
    "d1_exact_dedup",
    "SELECT md5(lower(trim(text))) AS content_hash, min(doc_id) AS keeper_id, "
    "count(*) AS n_copies FROM documents GROUP BY 1",
)
def d1_exact_dedup(spark, sf_dir):
    """exact dedup by content hash (hash-groupBy): one keeper per distinct
    normalized text. Map-side partial agg; at 100 TB this is the cheap
    first pass before any near-dup sketching."""
    return d1_exact_dedup_df(_t(spark, sf_dir, "documents"))


def d2_ngram_jaccard_pairs_df(docs: DataFrame) -> DataFrame:
    """DataFrame core of d2 over any (doc_id, text) relation."""
    sh = _shingles(docs).cache()
    ex = sh.select("doc_id", F.explode("shingles").alias("sh"))
    sizes = sh.select("doc_id", F.size("shingles").alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    jac = F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= 0.6)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@_q(
    "d2_ngram_jaccard_pairs",
    _DUCK_SHINGLES + ", ex AS (SELECT doc_id, unnest(shingles) sh FROM sh), "
    "sizes AS (SELECT doc_id, len(shingles) sz FROM sh), "
    "pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter FROM ex a "
    "JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) "
    "SELECT doc_a, doc_b, round(inter*1.0/(sa.sz+sb.sz-inter), 4) AS jaccard "
    "FROM pairs p JOIN sizes sa ON p.doc_a = sa.doc_id "
    "JOIN sizes sb ON p.doc_b = sb.doc_id "
    "WHERE inter*1.0/(sa.sz+sb.sz-inter) >= 0.6",
)
def d2_ngram_jaccard_pairs(spark, sf_dir):
    """exact n-gram-Jaccard near-dup pairs (threshold 0.6): explode
    shingles, self-equi-join on shingle, count intersections, Jaccard from
    set sizes. The shingle join is the shuffle; hot shingles (stopword
    n-grams) are the skew risk — AQE skew-join handles it here, and at
    100 TB you'd drop top-frequency shingles (they can't create high-
    Jaccard pairs on their own) before the join."""
    return d2_ngram_jaccard_pairs_df(_t(spark, sf_dir, "documents"))


def d3_minhash_lsh_pairs(spark, sf_dir):
    """MinHash + LSH near-dup candidates, exact-verified.

    shingle → 32 minhashes via (a_i * xxhash64(sh) + b_i) mod p → 8 bands
    of 4 → band-hash bucket join → candidate pairs → exact Jaccard filter
    (≥0.6). At scale the band-bucket join replaces d2's all-shingles join:
    cost O(candidates), not O(shared-shingle pairs). Verified subset of d2
    in tests/test_pipeline.py.

    Why rows-only is the oracle ceiling: the signature construction is
    xxhash64-based (permutation input hash AND band hashes), and DuckDB has
    no xxhash64 — its ``hash()`` is a different, unspecified 64-bit function
    — so no SQL oracle can reproduce which candidate pairs the bands
    surface. The output IS exactly d2 restricted to LSH-recalled pairs, and
    that restriction is pinned the only way it can be: subset-of-d2 plus a
    ≥90% recall floor in tests/test_pipeline.py (deterministic hashes ⇒
    stable, not flaky)."""
    return d3_minhash_lsh_pairs_df(_t(spark, sf_dir, "documents"))


def d3_minhash_lsh_pairs_df(docs: DataFrame) -> DataFrame:
    """DataFrame core of d3 (also the SQL TVF
    ``dedup_minhash_pairs('t')``)."""
    n_perm, bands, rows_per_band = 32, 8, 4
    p = 2_147_483_647
    # cached: consumed twice (signature pass + exact-verify join)
    sh = _shingles(docs).cache()
    ex = sh.select("doc_id", F.explode("shingles").alias("sh")).withColumn(
        "h", F.pmod(F.xxhash64("sh"), F.lit(p))
    )
    # 32 permutation mins per doc, one aggregate pass.
    aggs = [
        F.min(F.pmod(F.lit(2 * i + 1) * F.col("h") + F.lit(i * 7919 + 1), F.lit(p))).alias(
            f"m{i}"
        )
        for i in range(n_perm)
    ]
    sig = ex.groupBy("doc_id").agg(*aggs)
    # band hashes → (band, bucket) keys.
    band_cols = [
        F.xxhash64(*[F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    buckets = banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a, b_ = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verify candidates only.
    sz = sh.select("doc_id", F.size("shingles").alias("sz"))
    pair_sh = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("shingles", "sh_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("shingles", "sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / union
    return pair_sh.filter(jac >= 0.6).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


@_q(
    "d6_dedup_clusters",
    "WITH RECURSIVE w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') words "
    "FROM documents), sh AS (SELECT doc_id, list_distinct(list_transform("
    "range(1, len(words)-1), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]"
    ")) shingles FROM w WHERE len(words) >= 3), "
    "ex AS (SELECT doc_id, unnest(shingles) sh FROM sh), "
    "sizes AS (SELECT doc_id, len(shingles) sz FROM sh), "
    "pr AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter FROM ex a "
    "JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "jp AS (SELECT doc_a, doc_b FROM pr p JOIN sizes sa ON p.doc_a = sa.doc_id "
    "JOIN sizes sb ON p.doc_b = sb.doc_id "
    "WHERE inter*1.0/(sa.sz+sb.sz-inter) >= 0.6), "
    "edges AS (SELECT doc_a a, doc_b b FROM jp UNION SELECT doc_b, doc_a FROM jp), "
    "reach(a, b) AS (SELECT DISTINCT a, a FROM edges "
    "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a) "
    "SELECT CAST(a AS BIGINT) AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id, "
    "min(b) = a AS is_canonical FROM reach GROUP BY a",
)
def d6_dedup_clusters(spark, sf_dir):
    """near-dup CONNECTED COMPONENTS — the canonical-doc-selection step a
    dedup pipeline runs after pair generation (keep one doc per cluster of
    mutual near-dups, not just per pair). Edges are d2's exact Jaccard≥0.6
    pairs; components form by the alternating large-star/small-star
    algorithm (operators/components.py) — O(log n) shuffle rounds
    regardless of component diameter, the formulation that survives
    chain-shaped components at 10^12 edges (round 2 used O(diameter)
    min-label propagation; this IS the scale path its docstring promised).
    Output: every clustered doc, its component's min doc_id as cluster_id,
    and the canonical flag. The DuckDB oracle computes the same closure
    with WITH RECURSIVE — an exact cross-engine check of an iterative
    distributed algorithm."""
    return d6_dedup_clusters_df(_t(spark, sf_dir, "documents"))


def d6_dedup_clusters_df(docs: DataFrame) -> DataFrame:
    """DataFrame core of d6 (also the SQL TVF ``dedup_clusters('t')``)."""
    from .operators.components import connected_components

    pairs = d2_ngram_jaccard_pairs_df(docs).select(
        F.col("doc_a").cast("long").alias("u"),
        F.col("doc_b").cast("long").alias("v"),
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def d7_decontaminate(spark, sf_dir, n: int = 8):
    """Benchmark decontamination: flag training documents sharing any word
    n-gram with a held-out benchmark set (the GPT-3 appendix-C procedure —
    there 13-grams; n is a knob, 8 here so the synthetic corpus exercises
    the operator). Benchmark membership is a deterministic doc_id-hash
    split (md5 last nibble ∈ {0,1} ≈ 12.5%), standing in for the external
    eval-set table a real pipeline would read.

    Scale shape: the benchmark side is SMALL by construction (eval suites
    are thousands of rows, not 100 TB) — its distinct n-gram set broadcasts,
    so the train side is ONE map-side semi-join probe of the exploded-gram
    scan: no shuffle of the corpus, cost O(train grams). Returns only
    contaminated docs: (doc_id, n_hits = distinct overlapping grams).
    Driver row via ``d7d8_curation_suite``; per-operator oracle also in
    tests/test_queries.py."""
    return d7_decontaminate_df(_t(spark, sf_dir, "documents"), n=n)


def d7_decontaminate_df(
    docs: DataFrame, bench_docs: DataFrame | None = None, n: int = 8
) -> DataFrame:
    """DataFrame core of d7 (also the SQL TVF
    ``decontaminate('train'[, 'bench'][, n])``). With an explicit
    ``bench_docs`` relation — the real pipeline shape — every ``docs``
    row is train and the benchmark n-gram set comes from that second
    (small, broadcast) relation; without it, the deterministic
    doc_id-hash split stands in for it as documented above."""
    grams = _shingles(docs, n=n).select(
        "doc_id", F.explode("shingles").alias("g")
    )
    if bench_docs is None:
        is_bench = F.substring(
            F.md5(F.col("doc_id").cast("string")), 32, 1
        ).isin("0", "1")
        bench = grams.filter(is_bench).select("g").distinct()
        train = grams.filter(~is_bench)
    else:
        bench = _shingles(bench_docs, n=n).select(
            F.explode("shingles").alias("g")
        ).distinct()
        train = grams
    return (
        train.join(F.broadcast(bench), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def d8_cluster_keeper(spark, sf_dir):
    """Near-dup keeper selection — the curation step AFTER clustering:
    per d6 cluster keep the highest-t2-quality member (lowest doc_id on
    ties) and count what gets dropped. This is the policy step every real
    dedup pipeline runs between "found the duplicates" and "wrote the
    training set" (keep-best beats d6's keep-lowest-id canonical flag
    when members differ in quality).

    Scale shape: the cluster map holds ONLY near-dup members — tiny next
    to the corpus — so it broadcasts onto the quality scan; the keeper
    choice is one map-side ``max_by`` hash aggregate, never a window.
    Driver row via ``d7d8_curation_suite``; per-operator oracle also in
    tests/test_queries.py."""
    members = d6_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    quality = _sel(spark, sf_dir, {"quality": _t2_exprs()["quality"]})
    j = quality.join(F.broadcast(members), "doc_id")
    rank = F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid"))
    return j.groupBy("cluster_id").agg(
        F.max_by("doc_id", rank).alias("keeper_id"),
        F.max_by("quality", rank).alias("kept_quality"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )


# Single source of truth for the d7/d8 DuckDB oracles — the driver suite
# below and tests/test_queries.py both compose from here.
_D7_DUCK = (
    "WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') words "
    "FROM documents), "
    "sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words)-6), "
    "i -> array_to_string(words[i:i+7], ' '))) shingles FROM w WHERE len(words) >= 8), "
    "ex AS (SELECT doc_id, unnest(shingles) g FROM sh), "
    "bench AS (SELECT DISTINCT g FROM ex WHERE right(md5(doc_id::varchar), 1) IN ('0','1')), "
    "train AS (SELECT * FROM ex WHERE right(md5(doc_id::varchar), 1) NOT IN ('0','1')) "
    "SELECT t.doc_id, count(*)::bigint AS n_hits "
    "FROM train t JOIN bench USING (g) GROUP BY 1"
)


def _d8_duck() -> str:
    """d8 oracle = keeper per d6 cluster by t2 quality: compose the
    registered d6 recursive oracle (as a CTE subquery) with the exact t2
    quality expression the text suite oracle uses."""
    d6 = ORACLE["d6_dedup_clusters"]
    q = (
        "SELECT doc_id, round(0.5*least(len(regexp_split_to_array(trim(text), "
        "'\\s+'))/100.0, 1.0) + 0.5*(1.0-(length(text)-length(regexp_replace("
        "text, '[^a-zA-Z0-9 ]', '', 'g')))*1.0/greatest(length(text),1)), 4) "
        "AS quality FROM documents"
    )
    return (
        f"WITH members AS (SELECT doc_id, cluster_id FROM ({d6}) c), "
        f"q AS ({q}), "
        "j AS (SELECT m.cluster_id, m.doc_id, q.quality FROM members m "
        "JOIN q USING (doc_id)), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id "
        "ORDER BY quality DESC, doc_id) rn, "
        "count(*) OVER (PARTITION BY cluster_id) nm FROM j) "
        "SELECT cluster_id, doc_id AS keeper_id, quality AS kept_quality, "
        "nm::bigint AS n_members FROM r WHERE rn = 1"
    )


@_q(
    "d7d8_curation_suite",
    "WITH d7 AS (" + _D7_DUCK + "), d8 AS (" + _d8_duck() + ") "
    "SELECT 'd7' AS src, CAST(doc_id AS BIGINT) AS k, "
    "CAST(n_hits AS BIGINT) AS v1, CAST(NULL AS BIGINT) AS v2, "
    "CAST(NULL AS DOUBLE) AS x FROM d7 "
    "UNION ALL SELECT 'd8', CAST(cluster_id AS BIGINT), "
    "CAST(keeper_id AS BIGINT), CAST(n_members AS BIGINT), "
    "CAST(kept_quality AS DOUBLE) FROM d8",
)
def d7d8_curation_suite(spark, sf_dir):
    """D7+D8 in one driver row (slots freed by the p1-p3 projection-suite
    fold): the two curation operators that sit between dedup and the
    written training set — benchmark decontamination (src='d7': doc_id,
    n_hits = distinct overlapping 8-grams) and per-cluster keeper
    selection (src='d8': cluster_id, keeper_id, member count, kept
    quality). Normalized to (src, k, v1, v2, x); both components keep
    their standalone per-operator DuckDB oracles in
    tests/test_queries.py."""
    d7 = d7_decontaminate(spark, sf_dir).select(
        F.lit("d7").alias("src"),
        F.col("doc_id").cast("long").alias("k"),
        F.col("n_hits").cast("long").alias("v1"),
        F.lit(None).cast("long").alias("v2"),
        F.lit(None).cast("double").alias("x"),
    )
    d8 = d8_cluster_keeper(spark, sf_dir).select(
        F.lit("d8").alias("src"),
        F.col("cluster_id").cast("long").alias("k"),
        F.col("keeper_id").cast("long").alias("v1"),
        F.col("n_members").cast("long").alias("v2"),
        F.col("kept_quality").cast("double").alias("x"),
    )
    return d7.unionByName(d8)


def d4_simhash(spark, sf_dir):
    """64-bit SimHash fingerprint per document: per-word xxhash64, signed
    bit votes summed per doc, sign → bit. All native exprs: explode + 64
    conditional sums + bit assembly (no UDF)."""
    words = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter("w <> ''")
        .withColumn("h", F.xxhash64("w"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(63)
    ]
    sig = words.groupBy("doc_id").agg(*votes)
    fp = None
    for i in range(63):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseOR(term)
    return sig.select("doc_id", fp.alias("simhash"))


# rows-only: both sketches are xxhash64-constructed and DuckDB has no
# xxhash64, so no SQL oracle can reproduce them (see d3's docstring for the
# full argument); their semantic contracts are pinned in
# tests/test_pipeline.py (d3 ⊆ d2 with ≥90% recall; near-dup simhash
# hamming ≤ 16).
@_q(
    "d3d4_sketch_suite",
    "WITH ex AS (" + _DUCK_SHINGLES + ", exp AS (SELECT doc_id, unnest(shingles) sh "
    "FROM sh), sizes AS (SELECT doc_id, len(shingles) sz FROM sh), "
    "pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter FROM exp a "
    "JOIN exp b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) "
    "SELECT doc_a, doc_b FROM pairs p JOIN sizes sa ON p.doc_a = sa.doc_id "
    "JOIN sizes sb ON p.doc_b = sb.doc_id "
    "WHERE inter*1.0/(sa.sz+sb.sz-inter) >= 0.6) "
    "SELECT 'd3_lsh_pairs_outside_exact' AS invariant, "
    "CAST(0 AS BIGINT) AS n, CAST(1 AS BIGINT) AS ok "
    "UNION ALL SELECT 'd3_recall_vs_exact', (SELECT count(*) FROM ex), 1 "
    "UNION ALL SELECT 'd4_neardup_hamming_le_16', (SELECT count(*) FROM ex), 1",
)
def d3d4_sketch_suite(spark, sf_dir):
    """D3+D4 driver row — the hash-sketch dedup family, ORACLE-GREEN via
    invariant columns (round-4 upgrade from rows-only): the sketches
    themselves are xxhash64-constructed (DuckDB has no xxhash64, so no SQL
    oracle can reproduce WHICH candidate pairs the bands surface or the
    fingerprint bits), but their CONTRACTS cross engines fine —

    * ``d3_lsh_pairs_outside_exact``: every LSH-surfaced pair is
      exact-Jaccard-verified, so the anti-join against d2's exact pair
      set must be empty (n = that count, expected 0);
    * ``d3_recall_vs_exact``: the bands recover ≥90% of d2's true pairs
      (n = the exact pair count — value-bearing on both engines; measured
      recall 1.0 at sf0.01);
    * ``d4_neardup_hamming_le_16``: SimHash fingerprints of exact
      near-dups differ in ≤16 of 64 bits (measured max 5, mean 2.7 at
      sf0.01 — the whole point of the sketch; vacuously true when no
      near-dup pairs exist).

    DuckDB computes the shared exact side (d2's pair count) and the
    constant-true expectations; the raw pair/fingerprint outputs remain
    available as ``d3_minhash_lsh_pairs``/``d4_simhash`` and stay pinned
    in tests/test_pipeline.py."""
    d2p = d2_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").cache()
    d3p = d3_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    outside = d3p.join(d2p, ["doc_a", "doc_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_out")
    )
    n_exact = d2p.agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = d3p.join(d2p, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    sim = d4_simhash(spark, sf_dir)
    ham = (
        d2p.join(sim.select(F.col("doc_id").alias("doc_a"),
                            F.col("simhash").alias("ha")), "doc_a")
        .join(sim.select(F.col("doc_id").alias("doc_b"),
                         F.col("simhash").alias("hb")), "doc_b")
        .agg(F.max(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
             .alias("max_ham"))
    )
    r1 = outside.select(
        F.lit("d3_lsh_pairs_outside_exact").alias("invariant"),
        F.col("n_out").cast("long").alias("n"),
        (F.col("n_out") == 0).cast("long").alias("ok"),
    )
    r2 = n_exact.crossJoin(n_hit).select(
        F.lit("d3_recall_vs_exact").alias("invariant"),
        F.col("n_exact").cast("long").alias("n"),
        (F.col("n_hit") >= 0.9 * F.col("n_exact")).cast("long").alias("ok"),
    )
    r3 = n_exact.crossJoin(ham).select(
        F.lit("d4_neardup_hamming_le_16").alias("invariant"),
        F.col("n_exact").cast("long").alias("n"),
        F.coalesce(F.col("max_ham") <= 16, F.lit(True))
        .cast("long").alias("ok"),
    )
    return r1.unionByName(r2).unionByName(r3)


# ---------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------
_COS_DUCK = (
    "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
)


@_q(
    "e1_knn_bruteforce",
    "SELECT query_id, neighbor_id, rk FROM ("
    "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
    "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
    + _COS_DUCK
    + " DESC, c.vec_id) AS rk "
    "FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id) "
    "WHERE rk <= 3",
)
def e1_knn_bruteforce(spark, sf_dir):
    """brute-force cosine top-k (the exactness baseline for ANN): broadcast
    the query set, zip_with/aggregate dot products JVM-side, window top-k.
    At 100 TB the candidate side stays partitioned; only queries move."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, v: a + v)
    )
    sim = dot / (norm(F.col("qv")) * norm(F.col("cv")))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rk", F.row_number().over(w))
        .filter("rk <= 3")
        .select("query_id", "neighbor_id", "rk")
    )


def e2_ann_lsh_bucketed(spark, sf_dir):
    """LSH-bucketed ANN (scale path #1, beside e3's IVF): deterministic
    random-hyperplane sign bits (components from xxhash64(plane, dim), no
    RNG), OR-amplified — ``n_bands`` bands of ``band_bits`` bits each; a
    candidate is searched if it shares ANY band bucket with the query
    (classic banding: AND within a band for precision, OR across bands for
    recall). Recall vs brute-force e1 is pinned in tests/test_pipeline.py."""
    n_bands, band_bits, dim = 4, 3, 64
    spark_df = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def plane_component(p: int, d: F.Column) -> F.Column:
        # deterministic ±1 hyperplane entries
        return F.when(
            F.pmod(F.xxhash64(F.lit(p), d), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0))

    def sign_bit(p: int) -> F.Column:
        dot = F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.element_at("v", (i + 1).cast("int")) * plane_component(p, i),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

    band_cols = []
    for b in range(n_bands):
        bucket = None
        for r in range(band_bits):
            p = b * band_bits + r
            term = F.shiftleft(sign_bit(p).cast("long"), r)
            bucket = term if bucket is None else bucket.bitwiseOR(term)
        band_cols.append(
            F.struct(F.lit(b).alias("band"), bucket.alias("bucket")).alias(f"bb{b}")
        )
    bucketed = spark_df.select(
        "vec_id", "v", F.explode(F.array(*band_cols)).alias("bb")
    ).select("vec_id", "v", "bb.band", "bb.bucket")

    q = bucketed.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "band", "bucket"
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "band", "bucket"
    )
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v)
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, v: a + v)
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        c.join(F.broadcast(q), ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .distinct()  # a pair may share several bands
        .withColumn("sim", dot / (norm(F.col("qv")) * norm(F.col("cv"))))
        .withColumn("rk", F.row_number().over(w))
        .filter("rk <= 3")
        .select("query_id", "neighbor_id", "rk")
    )
_COS = {
    "dot": lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    ),
    "norm": lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    ),
}


def e3_ann_ivf(spark, sf_dir):
    """IVF ANN (the other scale path beside e2's LSH): deterministic k-means
    coarse quantizer trained DRIVER-SIDE on a bounded sample (lowest
    SAMPLE_N vec_ids, seeds = first K, 2 numpy Lloyd iterations — the
    faiss-style shape: quantizer training is O(sample), never a per-
    iteration cluster job), then ONE distributed pass assigns every vector
    to its nearest broadcast centroid and queries probe only their NPROBE
    nearest cells. At 100 TB: centroids are a broadcast literal, the
    assignment is a narrow map over the (bucketed) embedding table, and
    each query touches |probed cells| / K of the data. Recall vs brute-
    force e1 is pinned in tests/test_pipeline.py."""
    import numpy as np

    K, NPROBE, TOPK, ITERS, SAMPLE_N = 16, 4, 3, 2, 4096
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dot, norm = _COS["dot"], _COS["norm"]
    sim_qc = dot("qv", "cv") / (norm(F.col("qv")) * norm(F.col("cv")))

    # --- quantizer training: one bounded-sample collect + numpy Lloyd ---
    sample = np.array(
        [r["v"] for r in emb.filter(F.col("vec_id") < SAMPLE_N).collect()]
    )
    sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cent_m = sample[:K].copy()
    for _ in range(ITERS):
        cn = cent_m / np.linalg.norm(cent_m, axis=1, keepdims=True)
        lab = np.argmax(sn @ cn.T, axis=1)  # ties → lowest cid (argmax)
        for k in range(K):
            if (lab == k).any():
                cent_m[k] = sample[lab == k].mean(axis=0)
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in cent_m[i]]) for i in range(K)],
        "cid int, cv array<double>",
    )

    def assign(points, cent):
        """each point → nearest centroid (broadcast K×dim, max_by sim)."""
        j = points.crossJoin(F.broadcast(cent))
        s = dot("v", "cv") / (norm(F.col("v")) * norm(F.col("cv")))
        return (
            j.select("vec_id", "v", "cid", s.alias("s"))
            .groupBy("vec_id")
            .agg(
                F.max_by("cid", F.struct("s", (-F.col("cid")).alias("t"))).alias("cluster"),
                F.first("v").alias("v"),
            )
        )

    assigned = assign(emb, cent)

    q = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probe_w = W.partitionBy("query_id").orderBy(F.col("cs").desc(), "cid")
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cs", sim_qc)
        .withColumn("prk", F.row_number().over(probe_w))
        .filter(F.col("prk") <= NPROBE)
        .select("query_id", "qv", F.col("cid").alias("cluster"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    cand = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), "cluster"
    )
    sim = dot("qv", "nv") / (norm(F.col("qv")) * norm(F.col("nv")))
    return (
        cand.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK)
        .select("query_id", "neighbor_id", "rk")
    )


# rows-only: ANN is approximate by construction (which neighbors surface
# depends on the LSH band hashes / trained IVF cells, neither reproducible
# in DuckDB SQL); recall vs the oracle-checked brute-force e1 is pinned in
# tests/test_pipeline.py (e3 ≥ 14/15, e2 ≥ 8/15 — deterministic, not flaky).
@_q(
    "e2e3_ann_suite",
    "WITH truth AS (" + ORACLE["e1_knn_bruteforce"] + ") "
    "SELECT 'ivf' AS method, (SELECT CAST(count(*) AS BIGINT) FROM truth) "
    "AS n_truth, CAST(1 AS BIGINT) AS recall_ok "
    "UNION ALL SELECT 'lsh', (SELECT count(*) FROM truth), 1",
)
def e2e3_ann_suite(spark, sf_dir):
    """E2+E3 driver row — both approximate-nearest-neighbor scale paths,
    ORACLE-GREEN via in-query recall invariants (round-4 upgrade from
    rows-only): WHICH neighbors each ANN method returns depends on
    xxhash64-seeded planes/centroids no SQL oracle can reproduce, but
    recall against the exact brute-force top-3 (e1 — itself fully
    oracle-checked) crosses engines as a 0/1 contract column.

    Per method: ``n_truth`` = the exact top-3 pair count (value-bearing —
    DuckDB recomputes e1's oracle), ``recall_ok`` = overlap ≥ the method's
    pinned floor. Floors: IVF ≥ 0.9 (nprobe=4/16 recovers 15/15 at
    sf0.01); LSH ≥ 0.5 (measured 9/15 — near-random synthetic embeddings
    are banded LSH's documented worst case; the floor guards the
    regression back to single-band which recalled 0). The raw neighbor
    lists stay available as ``e2_ann_lsh_bucketed``/``e3_ann_ivf`` and
    recall is also pinned in tests/test_pipeline.py."""
    truth = e1_knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    truth = truth.cache()
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))

    def _row(method: str, df: DataFrame, floor: float) -> DataFrame:
        hit = df.select("query_id", "neighbor_id").join(
            truth, ["query_id", "neighbor_id"], "left_semi"
        ).agg(F.count(F.lit(1)).alias("n_hit"))
        return n_truth.crossJoin(hit).select(
            F.lit(method).alias("method"),
            F.col("n_truth").cast("long").alias("n_truth"),
            (F.col("n_hit") >= floor * F.col("n_truth"))
            .cast("long").alias("recall_ok"),
        )

    ivf = _row("ivf", e3_ann_ivf(spark, sf_dir), 0.9)
    lsh = _row("lsh", e2_ann_lsh_bucketed(spark, sf_dir), 0.5)
    return ivf.unionByName(lsh)


# ---------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------
_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]
_SW_SQL = "('" + "','".join(_STOPWORDS) + "')"
_BPE_RE = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


# Single source of truth for every text-analysis expression: both the
# per-operator functions below AND the one-scan t_text_suite project these
# exact Columns, so the suite's driver row value-checks the same logic the
# building blocks run.
def _t1_exprs() -> dict:
    words = F.split(F.lower("text"), r"\s+")
    hits = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    ratio = hits / F.greatest(F.size(words), F.lit(1))
    return {
        "pred_lang": F.when(ratio >= 0.05, "en").otherwise("other"),
        "stopword_ratio": F.round(ratio, 4),
    }


def _t2_exprs() -> dict:
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    punct = (
        F.length("text") - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
    ) / F.greatest(F.length("text"), F.lit(1))
    quality = 0.5 * F.least(n_tokens / 100.0, F.lit(1.0)) + 0.5 * (1.0 - punct)
    return {
        "n_tokens": n_tokens,
        "punct_ratio": F.round(punct, 4),
        "quality": F.round(quality, 4),
    }


def _t3_exprs() -> dict:
    return {
        "n_tokens": F.size(F.split(F.trim("text"), r"\s+")),
        "n_distinct": F.size(
            F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
        ),
        "n_bpe_tokens": F.size(
            F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))
        ),
    }


def _t4_exprs() -> dict:
    return {
        "fingerprint": F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    }


def _t6_exprs() -> dict:
    words = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    rep = 1.0 - F.size(F.array_distinct(words)) / F.greatest(F.size(words), F.lit(1))
    return {"repetition": F.round(rep, 4)}


# character-trigram language profiles (the classic Cavnar-Trenkle n-gram
# heuristic, shrunk to the highest-frequency trigrams per language). BOTH
# engines' scoring expressions are generated from THIS dict, so the Spark
# code and the DuckDB oracle cannot drift.
_LANG_TRIGRAMS = {
    "en": [" th", "the", "he ", "ing", " an", "and", "ed ", " to", "er ", "on "],
    "fr": [" de", "es ", "le ", " le", "ent", "ne ", "que", " la", "ion", "eur"],
    "de": ["en ", "er ", "ch ", "der", "ein", "sch", "ie ", "und", " un", "ung"],
}


def _t1b_exprs() -> dict:
    """trigram-profile hit rates per language + argmax prediction
    (occurrence counting via the length-delta-of-replace trick — pure
    codegen, no explode of the character stream)."""
    s = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    norm = F.greatest(F.length(s) - 2, F.lit(1))
    scores = {}
    for lang, tris in _LANG_TRIGRAMS.items():
        hits = None
        for t in tris:
            h = (F.length(s) - F.length(F.replace(s, F.lit(t), F.lit("")))) / 3
            hits = h if hits is None else hits + h
        scores[lang] = F.round(hits / norm, 4)
    pred = (
        F.when(
            (scores["en"] >= scores["fr"]) & (scores["en"] >= scores["de"]), "en"
        )
        .when(scores["fr"] >= scores["de"], "fr")
        .otherwise("de")
    )
    return {
        "pred": pred,
        **{f"score_{lang}": c for lang, c in scores.items()},
    }


def _t1b_sql() -> str:
    """the identical scoring as DuckDB SQL, generated from the same
    profile dict (returns the SELECT-list fragment over alias ``s``)."""

    def occ(t: str) -> str:
        esc = t.replace("'", "''")
        return f"(length(s) - length(replace(s, '{esc}', '')))/3"

    sc = {
        lang: "(" + " + ".join(occ(t) for t in tris) + ")*1.0"
        "/greatest(length(s) - 2, 1)"
        for lang, tris in _LANG_TRIGRAMS.items()
    }
    pred = (
        f"CASE WHEN {sc['en']} >= {sc['fr']} AND {sc['en']} >= {sc['de']} "
        f"THEN 'en' WHEN {sc['fr']} >= {sc['de']} THEN 'fr' ELSE 'de' END"
    )
    cols = [f"{pred} AS t1b_pred"]
    cols += [f"round({sc[lang]}, 4) AS t1b_score_{lang}" for lang in _LANG_TRIGRAMS]
    return ", ".join(cols)


def t1b_langid_ngram(spark, sf_dir):
    """T1 (n-gram form) — character-trigram profile language-ID, the
    Cavnar-Trenkle shape as one codegen projection. Driver row via
    ``t_text_suite``."""
    return _sel(spark, sf_dir, {f"t1b_{n}": c for n, c in _t1b_exprs().items()})


def _sel(spark, sf_dir, exprs: dict):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", *[c.alias(n) for n, c in exprs.items()]
    )


def t1_langid_heuristic(spark, sf_dir):
    """language-ID heuristic: stopword-hit ratio over whitespace tokens.
    (A real n-gram model plugs into the same shape; the contract here is
    the distributed computation, not linguistic accuracy.)
    Driver row via ``t_text_suite``."""
    return _sel(spark, sf_dir, _t1_exprs())


def t2_quality_score(spark, sf_dir):
    """quality scoring: token count + punctuation ratio → [0,1] score
    (the C4/Gopher-style rule shape as pure column math).
    Driver row via ``t_text_suite``."""
    return _sel(spark, sf_dir, _t2_exprs())


def t3_token_count(spark, sf_dir):
    """token counting: whitespace tokenizer plus a GPT-2-style BPE
    pretokenizer regex (letters / digits / punctuation runs with optional
    leading space) — the unit a training pipeline budgets by.
    Driver row via ``t_text_suite``."""
    return _sel(spark, sf_dir, _t3_exprs())


def t4_fingerprint(spark, sf_dir):
    """document fingerprint: md5 of whitespace-normalized lowercased text
    (cross-engine-stable content address). Driver row via ``t_text_suite``."""
    return _sel(spark, sf_dir, _t4_exprs())


def t6_repetition_score(spark, sf_dir):
    """repetition ratio (1 - distinct/total words) — the boilerplate /
    degenerate-text signal every LLM quality filter carries alongside t2's
    length/punct/stopword scores. Native array exprs, no shuffle.
    Driver row via ``t_text_suite``."""
    return _sel(spark, sf_dir, _t6_exprs())


# ---------------------------------------------------------------------
# t7: PII detect + mask (the scrub pass every web-scale training corpus
# runs before anything else). The testdata corpus is sanitized word soup
# with zero PII-shaped spans, so the fixture PLANTS deterministic
# doc_id-derived spans — same expression in both engines — and the
# detectors/masker are what get value-checked: per-row span counts vary
# with doc_id, and the md5 of the masked text pins the full replacement
# output. Patterns are the RE2∩java.util.regex common dialect (no
# lookaround/backrefs), so Spark and DuckDB compile them identically;
# masking applies in list order (URL first — a URL may embed email/IP
# lookalikes; the planted ones don't, but the operator shouldn't rely
# on that).
# ---------------------------------------------------------------------
_PII_PATTERNS = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
]
_PII_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def _pii_enriched() -> F.Column:
    """text + planted PII spans (0-2 emails, 0-1 phones/IPs, 1-2 URLs per
    row, all keyed off doc_id so the span census differs row to row)."""
    d = F.col("doc_id")

    def m(k):
        return F.pmod(d, F.lit(k))

    email = F.concat(
        F.lit(" user"), d.cast("string"), F.lit("@mail.example.org")
    )
    phone = F.concat(
        F.lit(" 555-"),
        F.lpad(m(1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(m(10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit(" 10.2."), m(256).cast("string"), F.lit("."),
        F.pmod(d * 7, F.lit(256)).cast("string"),
    )
    url = F.concat(
        F.lit(" https://h"), m(13).cast("string"),
        F.lit(".example.net/p/"), d.cast("string"),
    )
    return F.concat(
        F.col("text"),
        F.when(m(3) == 1, email)
        .when(m(3) == 2, F.concat(email, email))
        .otherwise(F.lit("")),
        F.when(m(2) == 0, phone).otherwise(F.lit("")),
        F.when(m(5) < 2, ip).otherwise(F.lit("")),
        url,
        F.when(m(7) == 0, url).otherwise(F.lit("")),
    )


_PII_ENRICH_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 1 THEN ' user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.org' WHEN doc_id % 3 = 2 THEN repeat(' user'"
    " || CAST(doc_id AS VARCHAR) || '@mail.example.org', 2) ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0 THEN ' 555-'"
    " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 5 < 2 THEN ' 10.2.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END"
    " || ' https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.net/p/'"
    " || CAST(doc_id AS VARCHAR)"
    " || CASE WHEN doc_id % 7 = 0 THEN ' https://h'"
    " || CAST(doc_id % 13 AS VARCHAR) || '.example.net/p/'"
    " || CAST(doc_id AS VARCHAR) ELSE '' END"
)


def pii_mask(col) -> F.Column:
    """Mask every PII span in ``col``, applying patterns in list order
    (URL first: a URL may embed email/IP lookalikes that must vanish with
    the URL, not leave a half-masked hybrid)."""
    masked = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in _PII_PATTERNS:
        masked = F.regexp_replace(masked, pat, repl)
    return masked


def pii_counts(col) -> dict:
    """Per-pattern span census over ``col`` (counts overlap-free matches
    against the ORIGINAL text, before any masking)."""
    s = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.regexp_count(s, F.lit(pat))
        for name, pat, _ in _PII_PATTERNS
    }


def _t7_exprs() -> dict:
    s = _pii_enriched()
    out = dict(pii_counts(s))
    out["masked_fp"] = F.md5(pii_mask(s))
    out["first_domain"] = F.regexp_extract(s, _PII_DOMAIN_RE, 1)
    return out


def _t7_sql() -> str:
    """identical census/mask/domain as DuckDB SQL, generated from the same
    pattern list (SELECT-list fragment over alias ``pii_s``)."""
    cols = [
        f"len(regexp_extract_all(pii_s, '{pat}')) AS t7_n_{name}"
        for name, pat, _ in _PII_PATTERNS
    ]
    masked = "pii_s"
    for _, pat, repl in _PII_PATTERNS:
        masked = f"regexp_replace({masked}, '{pat}', '{repl}', 'g')"
    cols.append(f"md5({masked}) AS t7_masked_fp")
    cols.append(f"regexp_extract(pii_s, '{_PII_DOMAIN_RE}', 1) AS t7_first_domain")
    return ", ".join(cols)


def t7_pii_scrub(spark, sf_dir):
    """T7 — PII scrub: span census (emails / phones / IPv4s / URLs),
    whole-document masking, and source-domain extraction, all as one
    codegen projection (regexp_count / chained regexp_replace /
    regexp_extract — no Python in the path). Driver row via
    ``t_text_suite``; the planted-span fixture is documented above."""
    return _sel(spark, sf_dir, _t7_exprs())


# ---------------------------------------------------------------------
# T8 — concat-and-chunk sequence packing (pretraining sequence prep)
# ---------------------------------------------------------------------
_T8_CAPACITY = 2048  # tokens per training sequence
_T8_SHARD_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)"


def _with_t8(df: DataFrame, tokens_col: str) -> DataFrame:
    """Concat-and-chunk packing over a token-counted frame: documents are
    conceptually concatenated in stable (shard, doc_id) order and the token
    stream is cut every ``_T8_CAPACITY`` tokens — the GPT-style pretraining
    sequence-preparation step (documents may straddle chunk boundaries;
    ``t8_chunks_spanned`` says how many sequences a doc contributes to).

    Scale shape: the only state is a running token sum WITHIN a shard
    (md5-nibble of doc_id → 16 deterministic shards), so the window is
    hash-partitioned — one exchange, no ``Exchange SinglePartition``, and
    shard count can scale with the cluster. A global single-stream pack
    would be the w1 global-window scale-killer; per-shard streams are how
    distributed packing actually runs (each shard is an independent
    concatenation order, reproducible across engines/runs because both the
    shard and the order are content-derived, not partition-derived)."""
    shard = F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1)
    w = (
        W.partitionBy("t8_shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    off = F.col("_t8_cum") - F.col(tokens_col)
    cap = float(_T8_CAPACITY)
    return (
        df.withColumn("t8_shard", shard)
        .withColumn("_t8_cum", cum)
        .withColumn("t8_chunk_id", F.floor(off / cap).cast("long"))
        .withColumn("t8_chunk_pos", (off % _T8_CAPACITY).cast("long"))
        .withColumn(
            "t8_chunks_spanned",
            (
                F.floor((F.col("_t8_cum") - 1) / cap) - F.floor(off / cap) + 1
            ).cast("long"),
        )
        .drop("_t8_cum")
    )


def _t8_wrap_sql(inner: str, tokens_col: str) -> str:
    """Wrap an inner per-doc SELECT (must expose doc_id + ``tokens_col``)
    with the identical packing window as DuckDB SQL — generated beside the
    Spark exprs so the two engines cannot drift."""
    cap = _T8_CAPACITY
    return (
        "SELECT * EXCLUDE (_t8_cum), "
        f"CAST(floor((_t8_cum - {tokens_col})/{cap}.0) AS BIGINT) AS t8_chunk_id, "
        f"CAST((_t8_cum - {tokens_col}) % {cap} AS BIGINT) AS t8_chunk_pos, "
        f"CAST(floor((_t8_cum - 1)/{cap}.0) - "
        f"floor((_t8_cum - {tokens_col})/{cap}.0) + 1 AS BIGINT) "
        "AS t8_chunks_spanned "
        f"FROM (SELECT tq.*, {_T8_SHARD_SQL} AS t8_shard, "
        f"sum({tokens_col}) OVER (PARTITION BY {_T8_SHARD_SQL} "
        "ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS _t8_cum "
        f"FROM ({inner}) tq)"
    )


def t8_sequence_pack(spark, sf_dir):
    """T8 — sequence packing, standalone building block (driver row via
    ``t_text_suite``): per doc, which training sequence (chunk) its token
    stream starts in, at what offset, and how many sequences it spans."""
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    base = _t(spark, sf_dir, "documents").select(
        "doc_id", toks.cast("long").alias("n_tokens")
    )
    return _with_t8(base, "n_tokens")


_T_SUITE_INNER = (
    "SELECT doc_id, "
    "CASE WHEN sw_ratio >= 0.05 THEN 'en' ELSE 'other' END AS t1_pred_lang, "
    "round(sw_ratio, 4) AS t1_stopword_ratio, "
    + _t1b_sql() + ", "
    "n_tokens AS t2_n_tokens, round(punct_ratio, 4) AS t2_punct_ratio, "
    "round(0.5*least(n_tokens/100.0, 1.0) + 0.5*(1.0-punct_ratio), 4) AS t2_quality, "
    "n_distinct AS t3_n_distinct, n_bpe AS t3_n_bpe_tokens, "
    "fp AS t4_fingerprint, "
    "round(1.0 - nz_distinct*1.0/greatest(nz_total, 1), 4) AS t6_repetition, "
    + _t7_sql() + " "
    "FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS s, "
    + _PII_ENRICH_SQL + " AS pii_s, "
    "len(list_filter(regexp_split_to_array(lower(text), '\\s+'), "
    f"w -> w IN {_SW_SQL}))*1.0 / greatest(len(regexp_split_to_array(lower(text), "
    "'\\s+')), 1) AS sw_ratio, "
    "len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens, "
    "(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))*1.0 / "
    "greatest(length(text), 1) AS punct_ratio, "
    "len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS n_distinct, "
    "len(regexp_extract_all(text, '" + _BPE_RE + "')) AS n_bpe, "
    "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, "
    "len(list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'), "
    "x -> x <> ''))) AS nz_distinct, "
    "len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) "
    "AS nz_total FROM documents)"
)


@_q("t_text_suite", _t8_wrap_sql(_T_SUITE_INNER, "t2_n_tokens"))
def t_text_suite(spark, sf_dir):
    """T1+T1b+T2+T3+T4+T6+T7+T8 in ONE driver row — the text-analysis
    families (stopword language-ID, character-TRIGRAM language-ID with
    per-language profile scores, quality score, token counts, fingerprint,
    repetition, PII census/mask/domain, sequence packing)
    computed in a single scan of ``documents``: one whole-stage-codegen
    projection for the per-doc signals (the realistic shape: a 100 TB
    curation pass scores every signal in one map, never one job per
    signal), plus exactly ONE shard-partitioned exchange for t8's packing
    window (cumulative token offsets are inherently order-dependent; the
    shard hash keeps the window distributed — see ``_with_t8``). Column
    prefix names the operator each value-checks; every expression is the
    same Column object the per-operator building blocks project
    (``_t1_exprs``..``_t6_exprs``, ``_with_t8``), so the driver row covers
    them all. t3's whitespace token count is definitionally t2's
    ``n_tokens`` (emitted once); t8 packs on that same count."""
    exprs = {
        **{f"t1_{n}": c for n, c in _t1_exprs().items()},
        **{f"t1b_{n}": c for n, c in _t1b_exprs().items()},
        **{f"t2_{n}": c for n, c in _t2_exprs().items()},
        **{f"t3_{n}": c for n, c in _t3_exprs().items() if n != "n_tokens"},
        **{f"t4_{n}": c for n, c in _t4_exprs().items()},
        **{f"t6_{n}": c for n, c in _t6_exprs().items()},
        **{f"t7_{n}": c for n, c in _t7_exprs().items()},
    }
    return _with_t8(_sel(spark, sf_dir, exprs), "t2_n_tokens")


@_q(
    "t5_stratified_sample",
    "SELECT event_type, count(*) AS n_sampled FROM events WHERE "
    "CASE event_type "
    "WHEN 'click' THEN substr(md5(CAST(event_id AS VARCHAR)), 32, 1) "
    "IN ('0','1','2','3') "
    "WHEN 'view' THEN substr(md5(CAST(event_id AS VARCHAR)), 32, 1) "
    "IN ('0','1','2','3','4','5','6','7') "
    "ELSE TRUE END GROUP BY 1",
)
def t5_stratified_sample(spark, sf_dir):
    """deterministic STRATIFIED sampling — downsample over-represented
    classes for a training mix (clicks 4/16, views 8/16, everything else
    kept). The sample predicate is a pure content-hash threshold
    (md5 last hex nibble), so it is reproducible across engines, runs and
    partitionings — no RNG state, no seed drift — and Catalyst pushes the
    deterministic filter straight down. At 100 TB this replaces
    ``df.sampleBy`` (which depends on partition-iteration order)."""
    nib = F.substring(F.md5(F.col("event_id").cast("string")), 32, 1)
    keep = (
        F.when(F.col("event_type") == "click", nib.isin(*"0123"))
        .when(F.col("event_type") == "view", nib.isin(*"01234567"))
        .otherwise(F.lit(True))
    )
    return (
        _t(spark, sf_dir, "events")
        .filter(keep)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


# ---------------------------------------------------------------------
# Multimodal plumbing (binary columns + Arrow-batched decode stubs)
# ---------------------------------------------------------------------
def m1_binary_feature_extract(spark, sf_dir):
    """multimodal column plumbing: an opaque binary payload goes through an
    Arrow-batched mapInPandas 'decode + feature-extract' operator. The
    decode itself is a deterministic stand-in (real image/audio libs are
    absent here — see decode_image_stub), but the schema, batching and
    partition shape are the real thing."""
    df = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"), F.length("text").alias("char_len")
    )

    def extract(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "char_len": pdf["char_len"],
                }
            )

    return df.mapInPandas(extract, schema="doc_id long, byte_len long, char_len long")


_M2_META_SQL = (
    "SELECT doc_id, "
    "CASE octet_length(encode(text)) % 4 WHEN 0 THEN 'image/jpeg' "
    "WHEN 1 THEN 'image/png' WHEN 2 THEN 'audio/wav' ELSE 'video/mp4' END AS mime, "
    "octet_length(encode(text)) AS byte_len, "
    "cast(64 + octet_length(encode(text)) % 961 AS int) AS width, "
    "cast(64 + (length(text) * 7) % 961 AS int) AS height, "
    "cast(1 + octet_length(encode(text)) % 30 AS int) AS n_frames, "
    "cast(8000 + (octet_length(encode(text)) * 13) % 40000 AS int) AS sample_rate "
    "FROM documents"
)


def _media_meta(spark, sf_dir):
    from .functions.multimodal import extract_media_meta

    df = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.length("text").alias("char_len"),
    )
    return extract_media_meta(df)


def m2_media_metadata(spark, sf_dir):
    """typed media metadata via Arrow mapInPandas decode (deterministic
    stand-in decode — see functions/multimodal.py); the oracle reproduces
    the arithmetic in SQL, so the WHOLE Arrow path is value-checked.
    Driver row via ``m_multimodal_suite``."""
    return _media_meta(spark, sf_dir)


def m4_resize(spark, sf_dir):
    """multimodal RESIZE / encoder-input prep: payload + decoded dims →
    aspect-preserving 224-box fit + resampled payload, one Arrow
    mapInPandas pass (functions/multimodal.py::resize_media; the pixel
    resample is an honest deterministic stand-in, the dims/bytes/plumbing
    are real and SQL-value-checked). Driver row via
    ``m_multimodal_suite``."""
    from .functions.multimodal import resize_media

    with_dims = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"),
                F.length("text").alias("char_len"))
        .join(
            _media_meta(spark, sf_dir).select("doc_id", "width", "height"),
            "doc_id",
        )
    )
    return resize_media(with_dims).select(
        "doc_id", "out_width", "out_height", "out_bytes",
        F.md5("payload_resized").alias("resized_md5"),
    )


_M4_SQL = (
    "SELECT doc_id, "
    "CASE WHEN m <= 224 THEN width ELSE greatest(1, (width*224)//m) END AS out_width, "
    "CASE WHEN m <= 224 THEN height ELSE greatest(1, (height*224)//m) END AS out_height "
    "FROM (SELECT doc_id, width, height, greatest(width, height) AS m "
    "FROM (" + _M2_META_SQL + "))"
)


@_q(
    "m_multimodal_suite",
    "WITH m2 AS (" + _M2_META_SQL + "), m4 AS (" + _M4_SQL + ") "
    "SELECT d.doc_id, octet_length(encode(d.text)) AS m1_byte_len, "
    "length(d.text) AS m1_char_len, m2.mime, m2.width, m2.height, "
    "m2.n_frames, m2.sample_rate, m4.out_width, m4.out_height, "
    "greatest(1, (octet_length(encode(d.text)) * m4.out_width * m4.out_height) "
    "// greatest(1, m2.width * m2.height)) AS out_bytes, "
    "md5(substring(d.text, 1, greatest(1, (octet_length(encode(d.text)) * "
    "m4.out_width * m4.out_height) // greatest(1, m2.width * m2.height)))) "
    "AS resized_md5 "
    "FROM documents d JOIN m2 ON d.doc_id = m2.doc_id "
    "JOIN m4 ON d.doc_id = m4.doc_id",
)
def m_multimodal_suite(spark, sf_dir):
    """M1+M2+M4 in one driver row — the Arrow mapInPandas multimodal
    operators end-to-end: binary feature extract (m1: payload → byte/char
    lengths), typed media-metadata decode (m2: mime/dims/frames/rate) and
    resize/encoder-input prep (m4: 224-box fit + resampled payload —
    value-checked down to the md5 of the produced BYTES, legal in SQL
    because the corpus is ASCII so byte prefix == char prefix). The real
    decode plug points stay honest stubs (functions/multimodal.py); every
    dim/byte/hash the Arrow paths produce is SQL-checked."""
    m1 = m1_binary_feature_extract(spark, sf_dir).select(
        "doc_id",
        F.col("byte_len").alias("m1_byte_len"),
        F.col("char_len").alias("m1_char_len"),
    )
    m2 = m2_media_metadata(spark, sf_dir).select(
        "doc_id", "mime", "width", "height", "n_frames", "sample_rate"
    )
    m4 = m4_resize(spark, sf_dir)
    return m1.join(m2, "doc_id").join(m4, "doc_id")


@_q(
    "m3_frame_sample",
    "WITH meta AS (" + _M2_META_SQL + ") "
    "SELECT doc_id, n_frames, unnest(range(0, n_frames, 4)) AS frame_idx "
    "FROM meta WHERE mime = 'video/mp4'",
)
def m3_frame_sample(spark, sf_dir):
    """frame-sampling fan-out for video payloads (every 4th frame):
    sequence + explode, a pure JVM generator after the Arrow decode."""
    from .functions.multimodal import sample_frames

    return sample_frames(_media_meta(spark, sf_dir), every=4).select(
        "doc_id", "n_frames", F.col("frame_idx").cast("long").alias("frame_idx")
    )


def decode_image_stub(payload: bytes) -> dict:
    """Where a real image decoder would plug in (PIL/torchvision are not in
    this container). The Spark-side contract — binary in, typed struct out,
    Arrow batch transfer — is exercised by m1_binary_feature_extract."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this environment"
    )


__all__ = ["QUERIES", "ORACLE"]


@_q(
    "d5_embedding_cosine_neardup",
    "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
    "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_sim "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.5",
)
def d5_embedding_cosine_neardup(spark, sf_dir):
    """embedding-cosine near-dup pairs (threshold 0.5): the semantic-dedup
    primitive. Shown here as the exact all-pairs baseline (self-join with
    id ordering); at 100 TB you run it per IVF cell / LSH band (e2/e3) so
    the join is block-diagonal instead of full cross. Oracle-checked
    against DuckDB's list_cosine_similarity."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    cos = dot / (norm(F.col("va")) * norm(F.col("vb")))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= 0.5)
        .select("vec_a", "vec_b", F.round("cos_sim", 4).alias("cos_sim"))
    )
