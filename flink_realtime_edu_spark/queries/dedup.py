"""Deduplication queries — SURVEY.md §2.10 X4/X5.

Every query here is oracle-checked. Exact dedup and exact n-gram
Jaccard trivially so (md5 + pure counting agree across engines).
The near-dup pipelines get oracles three different ways:

- MinHash pairs: SEMANTIC oracle — DuckDB computes the exact-Jaccard
  pair set that LSH provably recovers on this corpus.
- SimHash pairs + minhash signature sample: dual-engine md5-twin
  signatures (operators/dedup.py::simhash_signature_md5 /
  minhash_signature_md5_km) — DuckDB recomputes the identical
  signatures, so the banding/verify logic is hash-checked exactly.
  The SipHash/xxhash64 fast paths stay the scale default, pinned by
  unit + property tests instead.
- Winnowing fingerprints: the rolling hash is plain mod-2^64
  arithmetic — DuckDB replays it with HUGEINT partial sums.

The testdata contains 25 planted near-dup pairs at sf0.01 (shingle
Jaccard ≈ 0.9-0.99): MinHash at J ≥ 0.7 recovers EXACTLY the
oracle-checked exact-Jaccard J ≥ 0.7 set (tests/test_operators.py),
and SimHash — a bit-level similarity, not Jaccard — finds a heavily
overlapping set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_edu_spark.operators.graph import connected_components
from flink_realtime_edu_spark.operators.dedup import (
    clip_spans,
    duplicated_spans,
    fingerprint_overlap_pairs,
    jaccard_pairs_exact,
    minhash_near_duplicates,
    minhash_signature_md5_km,
    simhash_near_duplicates,
    simhash_signature_md5,
    winnow_fingerprints_udf,
)
from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load, load_wide


@register(
    "exact_dedup_docs",
    survey_rows=("X4", "F8", "A9"),
    oracle="""
SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
""",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup: group by content hash, keep the smallest
    doc_id (deterministic canonical representative). At 100 TB the
    md5 group-by shuffles only (hash, id) pairs — never the text."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "near_dup_minhash",
    survey_rows=("X5",),
    bench=True,
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
  FROM toks, unnest(generate_series(1, greatest(len(w) - 2, 1))) t(i)
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) >= 0.7
""",
)
def near_dup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs (32 hashes, 8 bands, 3-word
    shingles, Jaccard ≥ 0.7). Bucketed end-to-end: the only join is
    on (band_id, band_hash). Signatures come from the Arrow-vectorized
    SipHash+Kirsch–Mitzenmacher pandas UDF (operators/dedup.py) —
    measured 3.5× faster than the pure-expression form; verification
    re-shingles only docs present in candidate pairs.

    Oracle note (semantic, not algebraic): the DuckDB side computes
    the EXACT Jaccard ≥ 0.7 pair set. The LSH stage can only miss
    pairs (the verify stage computes exact Jaccard, so false
    positives are impossible); with 8 bands × 4 rows, recall at the
    corpus's planted similarity (J ≈ 0.9–0.99) is ≈ 0.9998, and the
    recovered set is verified equal to the exact set at sf0.001/0.01/
    0.1 (deterministic data + fixed hash keys ⇒ stable). A borderline
    J≈0.7 pair could in principle be missed — that is the documented
    LSH recall trade-off, and exactly what the oracle would surface.

    The corpus is loaded via load_wide: the signature UDF is the one
    headline stage with real per-row CPU behind a single-row-group
    scan, and spreading the scan to all cores first measured
    2.73 s → 1.85 s at sf0.1 (r13; a no-op at cluster scale where
    row groups ≫ cores — see sources.load_wide)."""
    return minhash_near_duplicates(
        load_wide(spark, sf_dir, "documents"), threshold=0.7
    ).orderBy("id_a", "id_b")


# The md5-60bit SimHash twin (operators/dedup.py::simhash_signature_md5)
# recomputed in DuckDB: same per-token hash, same per-bit majority vote,
# same bit-pack — then brute-force xor/bit_count over all pairs (gate
# scale only; the Spark side's pigeonhole banding has FULL recall at
# the radius, so the two pair sets are equal by construction, not luck).
_SIMHASH_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), th AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
  FROM tok WHERE w <> ''
), bits AS (
  SELECT doc_id, b,
         CASE WHEN 2 * sum((h >> b) & 1) > count(*)
              THEN (1::BIGINT << b) ELSE 0::BIGINT END AS contrib
  FROM th, unnest(generate_series(0, 59)) g(b)
  GROUP BY doc_id, b
), sig AS (
  SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS sim FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 3
"""


@register("near_dup_simhash", survey_rows=("X5",), oracle=_SIMHASH_ORACLE)
def near_dup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (60-bit md5-twin signatures,
    4-chunk pigeonhole bands, hamming ≤ 3). The signature is the
    dual-engine md5 variant so DuckDB recomputes it exactly and
    hash-checks the banding+verify pipeline; the SipHash-UDF
    signature (same banding, ~10× faster per token) remains the
    scale default and is pinned in tests/test_operators.py.

    r13 note: spreading the corpus first (sources.load_wide, the
    near_dup_minhash win) was A/B-measured HERE at 2.88 → 3.47 s —
    worse — and not applied: the explode→md5→60-aggregate stage
    already reduces to doc-count rows map-side, and the added
    exchange plus wider partial-agg state outweighed the
    parallelism."""
    docs = load(spark, sf_dir, "documents")
    sig = simhash_signature_md5(docs)
    return simhash_near_duplicates(docs, sig_df=sig, sig_bits=60).orderBy(
        "id_a", "id_b"
    )


# Winnowing is deterministic ARITHMETIC, not a keyed hash: k-gram
# rolling hash = Σ byte_j · BASE^(k-1-j) mod 2^64 (FNV-prime base,
# numpy uint64 wraparound), window-min, distinct. DuckDB replicates it
# bit-for-bit with HUGEINT partial sums + the precomputed BASE powers
# inlined below (counts/distinctness are unaffected by the final
# int64 reinterpret on the Spark side, so no sign juggling needed).
# ASCII assumption: the SQL replay reads per-CHAR codepoints
# (ord/substr) while the numpy core reads utf-8 BYTES — identical on
# the ASCII testdata corpus; a non-ASCII corpus would need DuckDB's
# encode()+blob indexing on the oracle side (the Spark result itself
# is byte-correct either way).
_WINNOW_POWERS = [
    14218562807570617051,
    15895002104753931833,
    913917546033277539,
    11527715348014283921,
    624165263380053675,
    956575116354345,
    1099511628211,
    1,
]
_WINNOW_GRAM_TERMS = " + ".join(
    f"(CASE WHEN i+{j} <= length(text) THEN ord(substr(text, i+{j}, 1)) "
    f"ELSE 0 END)::HUGEINT * {p}::HUGEINT"
    for j, p in enumerate(_WINNOW_POWERS)
)
# grams per doc (k=8, zero-padded below k like the numpy core), then
# window-4 sliding mins over full windows only, distinct per doc.
_WINNOW_FPS = f"""
d AS (SELECT doc_id, CASE WHEN text = '' OR text IS NULL THEN ' ' ELSE text END AS text
      FROM documents),
pos AS (
  SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
  FROM d
), gram AS (
  SELECT doc_id, i,
         CAST(({_WINNOW_GRAM_TERMS}) % 18446744073709551616::HUGEINT AS UBIGINT) AS g
  FROM pos
), gcount AS (
  SELECT doc_id, count(*) AS n FROM gram GROUP BY doc_id
), winmin AS (
  SELECT gram.doc_id, i,
         min(g) OVER (PARTITION BY gram.doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
         n
  FROM gram JOIN gcount ON gram.doc_id = gcount.doc_id
), fp AS (
  SELECT DISTINCT doc_id, m
  FROM winmin WHERE n < 4 AND i = 1 OR i <= n - 3
)
"""


@register(
    "doc_fingerprint_stats",
    survey_rows=("X4", "X7", "F8"),
    oracle=f"""
WITH {_WINNOW_FPS}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints
FROM fp WHERE doc_id < 200 GROUP BY doc_id
""",
)
def doc_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint cardinality per document (rolling-hash
    k-gram mins — the MOSS scheme; operators/dedup.py). The rolling
    hash is plain mod-2^64 arithmetic, so the DuckDB oracle
    recomputes the identical fingerprint sets (HUGEINT partial sums)
    — overlap semantics additionally pinned in
    tests/test_operators.py on planted shared substrings."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.size(winnow_fingerprints_udf()(F.col("text")))
        .cast("bigint")
        .alias("n_fingerprints"),
    ).orderBy("doc_id")


@register(
    "fingerprint_overlap_docs",
    survey_rows=("X4", "X5"),
    oracle=f"""
WITH {_WINNOW_FPS},
rare AS (
  SELECT m FROM fp GROUP BY m HAVING count(*) <= 20
), kept AS (
  SELECT fp.doc_id, fp.m FROM fp JOIN rare ON fp.m = rare.m
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM kept a JOIN kept b ON a.m = b.m AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 8
""",
)
def fingerprint_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing ≥ 8 winnowing fingerprints — the
    containment/plagiarism detector (catches partial overlap that
    whole-document Jaccard misses). Same max_df=20 stop-fingerprint
    filter on both sides; the oracle replays the arithmetic
    fingerprints and the inverted-index pair count in SQL."""
    return fingerprint_overlap_pairs(
        load_wide(spark, sf_dir, "documents"), min_shared=8
    ).orderBy("id_a", "id_b")


@register(
    "near_dup_jaccard",
    survey_rows=("X5", "X4", "F5"),
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
  FROM toks, unnest(generate_series(1, greatest(len(w) - 2, 1))) t(i)
), rare AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 100
), kept AS (
  SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s
), sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) >= 0.5
""",
)
def near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (3-word shingles, J ≥ 0.5,
    shingle df-cap 100) — the hash-free X5 variant. Candidate pairs
    form only where a distinct shingle is shared (inverted-index
    self-join on the shingle, i.e. blocking — never a global cross
    product), and the intersection size is counted in the same join
    (see operators.dedup.jaccard_pairs_exact). Shingles appearing in
    more than 100 documents are dropped before the self-join — the
    prefix-filtering df-cap that keeps the inverted index LINEAR in
    corpus size instead of quadratic on one hot stop-phrase shingle;
    the oracle applies the identical cap, so Jaccard is exact over
    the capped shingle universe in both engines. No hashing → fully
    DuckDB-expressible → oracle-checked, unlike the minhash/simhash
    variants."""
    return jaccard_pairs_exact(
        load_wide(spark, sf_dir, "documents"),
        shingle_words=3,
        threshold=0.5,
        max_df=100,
    )


@register(
    "corpus_curation_pipeline",
    survey_rows=("X4", "X5", "X7", "J5", "J6", "A1"),
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, source, text, string_split(text, ' ') AS toks
  FROM documents
), good AS (
  SELECT * FROM scored
  WHERE len(toks) BETWEEN 20 AND 80
    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.5
), canon AS (
  SELECT MIN(doc_id) AS doc_id FROM good GROUP BY md5(text)
), uniq AS (
  SELECT * FROM good WHERE doc_id IN (SELECT doc_id FROM canon)
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS s
  FROM uniq, unnest(generate_series(1, greatest(len(toks) - 2, 1))) t(i)
), rare AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 100
), shk AS (
  SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s
), sizes AS (SELECT doc_id, count(*) AS n FROM shk GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM shk a JOIN shk b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), dups AS (
  SELECT DISTINCT i.id_b AS doc_id
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) >= 0.5
), kept AS (
  SELECT * FROM uniq WHERE doc_id NOT IN (SELECT doc_id FROM dups)
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(len(toks)) AS BIGINT) AS total_tokens
FROM kept GROUP BY 1, 2
""",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation over `documents`, every stage
    oracle-checked as ONE composed plan: (1) quality filter (token
    count 20-80, type-token ratio > 0.5 — the doc_quality_scores
    'good' rule); (2) exact dedup keeping the smallest doc_id per
    md5(text); (3) near-dup removal dropping every doc with an exact
    3-shingle Jaccard ≥ 0.5 neighbor of smaller id (greedy,
    deterministic); (4) per-(lang, source) surviving doc and token
    counts.

    Scale: the filter prunes before any shuffle; exact dedup shuffles
    (hash, id) only; near-dup candidates form only inside shingle
    buckets (at 100 TB swap stage 3's candidate generator for the
    MinHash signatures of near_dup_minhash, same verify stage);
    integer token sums need no decimal repair."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    good = d.filter(n.between(20, 80) & (ttr > 0.5))
    canon = good.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    uniq = good.join(canon.select("doc_id"), on="doc_id", how="left_semi")
    dup_ids = (
        jaccard_pairs_exact(uniq, shingle_words=3, threshold=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    kept = uniq.join(dup_ids, on="doc_id", how="left_anti")
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n.cast("bigint")).alias("total_tokens"),
    )


@register(
    "near_dup_clusters",
    survey_rows=("X4", "X5"),
    oracle="""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
  FROM toks, unnest(generate_series(1, greatest(len(w) - 2, 1))) t(i)
), rare AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 100
), kept AS (
  SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s
), sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY 1
""",
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: transitive closure of the exact
    3-shingle Jaccard ≥ 0.5 pair set (near_dup_jaccard's edges),
    labeling every paired doc with the minimum doc_id of its connected
    component — the "keep one per duplicate group" step a pair list
    alone cannot express (A~B, B~C must cluster A,B,C together).

    Spark side: hash-min label propagation (operators/graph.py) — per
    round one equi-join + one keyed min, lineage truncated per round;
    converges in diameter+1 rounds (dup clusters are near-cliques).
    Oracle: DuckDB recursive CTE computing min reachable id — a
    genuinely different closure algorithm agreeing exactly."""
    pairs = jaccard_pairs_exact(
        load(spark, sf_dir, "documents"), shingle_words=3, threshold=0.5
    ).select("id_a", "id_b")
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@register(
    "leakage_safe_split",
    survey_rows=("X4", "X5", "X7", "F8", "J2", "A3"),
    oracle="""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
  FROM toks, unnest(generate_series(1, greatest(len(w) - 2, 1))) t(i)
), rare AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 100
), kept AS (
  SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s
), sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
), comp AS (
  SELECT node, MIN(lab) AS component FROM reach GROUP BY 1
), grouped AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS group_id,
         len(string_split(d.text, ' ')) AS n_toks
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
)
SELECT CASE WHEN md5(CAST(group_id AS VARCHAR)) < 'c' THEN 'train'
            WHEN md5(CAST(group_id AS VARCHAR)) < 'e' THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT group_id) AS n_groups,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens
FROM grouped GROUP BY 1
""",
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split (~75/12.5/12.5 by md5-hex
    threshold): the split unit is the near-dup CLUSTER (connected
    component of exact Jaccard ≥ 0.5 pairs; singletons are their own
    group), so near-duplicates can never straddle train and test —
    the leakage rule a per-document split violates. Deterministic and
    engine-independent: assignment is a pure function of the group id
    (md5 prefix, mixture_sample_by_source's idiom), not of
    partitioning or seeds. Scale: components over the (small) pair
    list, one broadcastable left join to attach group ids, then a
    codegen'd group-by — no per-doc state."""
    d = load(spark, sf_dir, "documents")
    pairs = jaccard_pairs_exact(d, shingle_words=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    grouped = d.join(comp, d.doc_id == comp.node, "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("group_id"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
    )
    h = F.md5(F.col("group_id").cast("string"))
    split = F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
    return grouped.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("group_id").alias("n_groups"),
        F.sum("n_toks").alias("total_tokens"),
    )


@register(
    "minhash_signatures_sample",
    survey_rows=("X5",),
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 100
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
  FROM toks, unnest(generate_series(1, greatest(len(w) - 2, 1))) t(i)
), h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h1,
         CAST(concat('0x', substr(md5(s), 16, 15)) AS BIGINT) AS h2
  FROM sh
)
SELECT doc_id,
       min(h1 + 0 * h2) AS mh0, min(h1 + 1 * h2) AS mh1,
       min(h1 + 2 * h2) AS mh2, min(h1 + 3 * h2) AS mh3
FROM h GROUP BY doc_id
""",
)
def minhash_signatures_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 MinHash signature values for the lowest 100 doc_ids —
    a deterministic, non-empty window into the signature stage (the
    pair outputs above are legitimately empty on dedup-free data).
    Uses the md5 Kirsch–Mitzenmacher twin (operators/dedup.py::
    minhash_signature_md5_km): h1 + i·h2 over distinct 3-word
    shingles with both md5 halves < 2^60, so DuckDB reproduces every
    value exactly; the production near-dup pipeline keeps the faster
    SipHash signatures."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return minhash_signature_md5_km(d, n_hashes=4).orderBy("doc_id")


@register(
    "near_dup_incremental",
    survey_rows=("X5", "X4", "J1"),
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
  FROM toks, unnest(generate_series(1, greatest(len(w) - 2, 1))) t(i)
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
delta AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 7),
inter AS (
  SELECT a.doc_id AS id_delta, b.doc_id AS id_other, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
  WHERE a.doc_id IN (SELECT doc_id FROM delta)
    AND (b.doc_id NOT IN (SELECT doc_id FROM delta) OR a.doc_id < b.doc_id)
  GROUP BY 1, 2
)
SELECT i.id_delta, i.id_other,
       round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_delta
JOIN sizes sb ON sb.doc_id = i.id_other
WHERE round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) >= 0.7
""",
)
def near_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash near-dup: today's ingest batch (doc_id %
    10 = 7, the same delta as incremental_dedup_delta) is checked
    against the WHOLE corpus via the LSH band index — candidates form
    only where a delta band hash collides with any band hash
    (delta ⋈ all on (band_id, band_hash)), then exact Jaccard
    verifies. Output: (id_delta, id_other, jaccard ≥ 0.7), with
    delta-internal pairs reported once (id_delta < id_other).

    This is the near-dup complement of the exact incremental path:
    at 100 TB the corpus side of the join is the PERSISTED band
    index (24 bytes per doc-band — the index the full-corpus job
    already materializes), so a daily delta costs
    O(|delta| bands ⋈ index) instead of re-banding the world. The
    oracle (semantic, like near_dup_minhash's) computes the exact
    delta-vs-all Jaccard ≥ 0.7 pair set, which LSH recovers at the
    planted similarity with recall ≈ 1 and the verify stage keeps
    false-positive-free."""
    from flink_realtime_edu_spark.operators.dedup import (
        jaccard_verify,
        lsh_bands,
    )
    from flink_realtime_edu_spark.session import materialize

    d = load(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 10 == 7
    bands_all = materialize(lsh_bands(d))
    bands_delta = bands_all.join(
        d.filter(is_delta).select("doc_id"), on="doc_id", how="left_semi"
    )
    cand = (
        bands_delta.select(F.col("doc_id").alias("id_delta"), "band_id", "band_hash")
        .join(
            bands_all.select(F.col("doc_id").alias("id_other"), "band_id", "band_hash"),
            on=["band_id", "band_hash"],
        )
        .filter(F.col("id_delta") != F.col("id_other"))
        # delta-internal pairs once; cross pairs keyed by the delta side
        .filter(
            (F.col("id_other") % 10 != 7) | (F.col("id_delta") < F.col("id_other"))
        )
        .select("id_delta", "id_other")
        .distinct()
    )
    verified = jaccard_verify(
        cand.withColumnsRenamed({"id_delta": "id_a", "id_other": "id_b"}), d
    ).filter(F.col("jaccard") >= 0.7)
    return verified.select(
        F.col("id_a").alias("id_delta"), F.col("id_b").alias("id_other"), "jaccard"
    )


@register(
    "dup_span_stats",
    survey_rows=("X4", "X7", "W3"),
    oracle="""
WITH grams AS (
  SELECT doc_id, p, substr(text, p, 40) AS g
  FROM documents,
       LATERAL unnest(generate_series(1, length(text) - 39)) AS t(p)
  WHERE length(text) >= 40
),
dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
hits AS (
  SELECT doc_id, p FROM grams WHERE g IN (SELECT g FROM dup)
),
brks AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 40
              THEN 0 ELSE 1 END AS brk
  FROM hits
),
islands AS (
  SELECT doc_id, p,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS span_seq
  FROM brks
),
spans AS (
  SELECT doc_id, MIN(p) AS span_start, MAX(p) - MIN(p) + 40 AS span_len
  FROM islands GROUP BY doc_id, span_seq
)
SELECT d.source AS source,
       CAST(COUNT(DISTINCT s.doc_id) AS BIGINT) AS docs_hit,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(s.span_len) AS BIGINT) AS dup_chars,
       CAST(MAX(s.span_len) AS BIGINT) AS max_span_len
FROM spans s JOIN documents d USING (doc_id)
GROUP BY d.source
""",
)
def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup report: maximal duplicated character
    spans (k = 40, stride 1 — exact cover of every duplicated
    substring of ≥ 40 chars) aggregated per source. The Spark side
    runs the xxhash64-keyed scale path of
    operators.dedup.duplicated_spans; the oracle replays the raw-gram
    variant in SQL — the two are pinned identical on this corpus by
    tests/test_spans.py (hash-vs-raw twin, the SipHash/md5-twin
    discipline of the other near-dup oracles).

    load_wide (r13): the k-gram explosion ran as an 11 s single-CPU
    stage behind the one-row-group scan; spreading the corpus first
    measured 5.22 -> 3.08 s (no-op at cluster scale)."""
    d = load_wide(spark, sf_dir, "documents")
    spans = duplicated_spans(d, k=40, stride=1, hash_grams=True)
    return (
        spans.join(d.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("docs_hit"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_len").cast("long").alias("dup_chars"),
            F.max("span_len").cast("long").alias("max_span_len"),
        )
    )


@register(
    "span_clip_checksums",
    survey_rows=("X4", "X7", "F1"),
    oracle="""
WITH grams AS (
  SELECT doc_id, p, substr(text, p, 40) AS g
  FROM documents,
       LATERAL unnest(generate_series(1, length(text) - 39)) AS t(p)
  WHERE length(text) >= 40
),
marked AS (
  SELECT doc_id, p,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS df
  FROM grams
),
hits AS (SELECT doc_id, p FROM marked WHERE df >= 2 AND rn >= 2),
brks AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 40
              THEN 0 ELSE 1 END AS brk
  FROM hits
),
islands AS (
  SELECT doc_id, p,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS span_seq
  FROM brks
),
spans AS (
  SELECT doc_id, MIN(p) AS span_start, MAX(p) - MIN(p) + 40 AS span_len
  FROM islands GROUP BY doc_id, span_seq
),
sent AS (
  SELECT doc_id, span_start, span_len FROM spans
  UNION ALL
  SELECT doc_id, length(text) + 1, 0 FROM documents
  WHERE doc_id IN (SELECT doc_id FROM spans)
),
cuts AS (
  SELECT doc_id, span_start,
         COALESCE(lag(span_start + span_len)
                    OVER (PARTITION BY doc_id ORDER BY span_start),
                  1) AS cur
  FROM sent
),
segs AS (
  SELECT c.doc_id, c.span_start,
         substr(d.text, c.cur, c.span_start - c.cur) AS seg
  FROM cuts c JOIN documents d USING (doc_id)
),
clipped0 AS (
  SELECT doc_id, string_agg(seg, '' ORDER BY span_start) AS ct
  FROM segs GROUP BY doc_id
),
clipped AS (
  SELECT d.source, d.text, COALESCE(c.ct, d.text) AS ct
  FROM documents d LEFT JOIN clipped0 c USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ct <> text THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_clipped,
       CAST(SUM(length(text)) AS BIGINT) AS chars_before,
       CAST(SUM(length(ct)) AS BIGINT) AS chars_after,
       CAST(COUNT(DISTINCT md5(ct)) AS BIGINT) AS distinct_clipped
FROM clipped
GROUP BY source
""",
)
def span_clip_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of substring dedup — Lee et al.'s
    remove-all-but-one ExactSubstr policy: duplicated_spans with
    keep_first=True exempts each gram's globally-first occurrence, so
    one canonical copy survives, then clip_spans reassembles every
    document minus its flagged spans in one JVM-side F.aggregate fold
    (no UDF, no explode-back). The md5-of-clipped-text distinct count
    makes the oracle sensitive to every reassembled byte, not just
    lengths — a value-level proof the Spark fold and the SQL
    string_agg replay produce identical corpora.

    load_wide (r13): same single-task gram-explosion stage as
    dup_span_stats; measured 5.09 -> 3.19 s at sf0.1."""
    d = load_wide(spark, sf_dir, "documents")
    spans = duplicated_spans(
        d, k=40, stride=1, hash_grams=True, keep_first=True
    )
    clipped = clip_spans(d, spans)
    ct = F.col("clipped_text")
    return clipped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(ct != F.col("text"), 1).otherwise(0))
        .cast("long")
        .alias("docs_clipped"),
        F.sum(F.length("text")).cast("long").alias("chars_before"),
        F.sum(F.length(ct)).cast("long").alias("chars_after"),
        F.countDistinct(F.md5(ct)).alias("distinct_clipped"),
    )


@register(
    "dup_cluster_canonicals",
    survey_rows=("X4", "X5", "W1", "A1"),
    oracle="""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
  FROM toks, unnest(generate_series(1, greatest(len(w) - 2, 1))) t(i)
), rare AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 100
), kept AS (
  SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s
), sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE round(i.n_inter / (sa.n + sb.n - i.n_inter), 6) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
), comp AS (
  SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY 1
), scored AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY c.cluster_id
           ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT cluster_id,
       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
         AS canonical_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS dropped_chars
FROM scored GROUP BY cluster_id
""",
)
def dup_cluster_canonicals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANONICAL SELECTION per duplicate cluster — the step between
    clustering and clipping that a curation pipeline actually ships:
    near_dup_clusters' transitive closure (exact 3-shingle Jaccard ≥
    0.5 edges → hash-min components), each cluster keeping its
    longest member (n_chars DESC, doc_id tie-break — the
    keep-longest heuristic; swap the ORDER BY for any quality score),
    reported as (cluster, canonical, members, total/dropped chars) so
    the dropped-volume accounting is auditable. Plan: the components'
    label propagation plus ONE window pass over cluster members and a
    per-cluster aggregate — members shuffle by cluster_id, never the
    corpus. Oracle: the recursive-CTE closure joined to documents
    with the same argmax window."""
    d = load(spark, sf_dir, "documents")
    pairs = jaccard_pairs_exact(d, shingle_words=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    from pyspark.sql import Window

    scored = comp.join(d.select("doc_id", "n_chars"), on="doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("cluster_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
        .cast("long")
        .alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.when(F.col("rn") > 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("dropped_chars"),
    )
