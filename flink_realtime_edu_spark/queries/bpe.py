"""BPE merge learning — tokenizer training over the corpus
(SURVEY.md §2.10 X7/X1 extension; Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016 — public).

The missing half of the tokenizer story next to ``bpe_token_counts``
(which APPLIES a tokenizer): LEARNING the merges. Classic byte-pair
encoding: start from characters, repeatedly count adjacent symbol
pairs across the corpus (weighted by word frequency) and merge the
most frequent pair into one symbol.

Spark-first decomposition (the k-means discipline — iterative
algorithms want small driver state and one job per pass):

- the corpus collapses ONCE to the distinct-word frequency frame
  (orders smaller than the corpus; the only stage that touches full
  text), each word represented as a space-delimited symbol string;
- each round is one aggregation job over that frame (explode adjacent
  pairs → sum(freq) → global top-1 with a lexicographic tie-break),
  and the driver carries only the learned merge list;
- applying a merge is a single literal `replace` of " l r " with
  " lr " over the symbol strings — no UDF, no extra shuffle.

Dual-engine exactness: symbol strings are built with the SAME
regexp_replace('([\\s\\S])' → char + space) in both engines — the
class form, not '.', because Java's dot excludes all five line
terminators while RE2's excludes only \\n, so '(.)' silently
diverges on \\r/U+2028-bearing words ([\\s\\S] matches every char
in both) — and both
engines' `replace` scan left-to-right non-overlapping (verified
bit-identical, including the shared-boundary-space case " a b a b "
→ " ab a b "). SCOPE: the char split is BMP-only — Spark/Java regex
operates on UTF-16 code units while DuckDB's RE2 operates on
codepoints, so an astral character (emoji, supplementary CJK) would
split into two surrogate halves on the Spark side only. The corpus
is ASCII-clean so this is latent; a non-BMP corpus needs a
codepoint-safe split (e.g. split to codepoints via
``F.split(w, '(?<=.)(?=.)')`` is NOT enough — use a pandas UDF) on
the Spark side before the oracle comparison holds. With that caveat,
the DuckDB oracle replays the identical five
rounds as chained CTEs and must reproduce every (round, left,
right, pair_count) row exactly. The single-scan merge is the
distributed-friendly variant of canonical greedy BPE; they differ
only on immediately-adjacent repeats of the merged pair (" a a a "
merges once, not twice) — deterministically, in both engines.

Scale: rounds × one shuffle over the distinct-word frame. At 100 TB
the word-frequency frame is still vocabulary-sized (~10^7 rows);
the corpus itself is scanned exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_edu_spark.queries import register
from flink_realtime_edu_spark.sources import load

_N_MERGES = 5

# One round of pair counting + top-1 selection, as SQL over a symbol
# frame named {src}. Produces the best (left, right, c).
_PAIR_BEST = """
SELECT s.l AS "left", s.r AS "right", SUM(s.freq) AS c FROM (
  SELECT freq, sy[i] AS l, sy[i + 1] AS r
  FROM (SELECT freq, string_split(trim(symstr), ' ') AS sy FROM {src}),
       unnest(generate_series(1, greatest(len(sy) - 1, 0))) t(i)
) s GROUP BY 1, 2 ORDER BY c DESC, "left", "right" LIMIT 1
"""

_MERGE_STEP = """
SELECT freq, replace(symstr,
    ' ' || (SELECT "left" FROM b{i}) || ' ' || (SELECT "right" FROM b{i}) || ' ',
    ' ' || (SELECT "left" FROM b{i}) || (SELECT "right" FROM b{i}) || ' ') AS symstr
FROM r{prev}
"""


def _bpe_oracle(n_merges: int) -> str:
    parts = [
        """WITH words AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
), r0 AS (
  SELECT freq, ' ' || regexp_replace(w, '([\\s\\S])', '\\1 ', 'g') AS symstr FROM words
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f", b{i} AS ({_PAIR_BEST.format(src=f'r{i - 1}')})")
        if i < n_merges:
            parts.append(f", r{i} AS ({_MERGE_STEP.format(i=i, prev=i - 1)})")
    selects = [
        f'SELECT {i} AS round, "left", "right", CAST(c AS BIGINT) AS pair_count FROM b{i}'
        for i in range(1, n_merges + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register(
    "bpe_merge_learning",
    survey_rows=("X7", "X1", "F1", "A1"),
    oracle=_bpe_oracle(_N_MERGES),
)
def bpe_merge_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first five BPE merges over the documents corpus: one
    row per round — (round, left, right, pair_count), the merge table
    a subword tokenizer trainer emits. See the module docstring for
    the iteration/scale shape and the dual-engine merge semantics."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    sym = words.select(
        F.concat(F.lit(" "), F.regexp_replace("w", r"([\s\S])", "$1 ")).alias("symstr"),
        "freq",
    ).persist()
    try:
        syms = F.split(F.trim("symstr"), " ")
        n = F.size(syms)
        # guard n < 2: sequence(1, n-1) with n=1 is sequence(1, 0),
        # which COUNTS DOWN ([1, 0] — default step -1), and the i=0
        # index would then hit element_at(sy, 0) → ANSI error; DuckDB's
        # generate_series(1, 0) is empty, so the guard also keeps the
        # two engines on the same (empty) pair set for 1-symbol words.
        pair_idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
            F.array().cast("array<int>")
        )
        rows = []
        cur = sym
        for rnd in range(1, _N_MERGES + 1):
            pairs = (
                cur.select(
                    "freq",
                    F.explode(pair_idx).alias("i"),
                    syms.alias("sy"),
                )
                .select(
                    "freq",
                    F.element_at("sy", F.col("i")).alias("left"),
                    F.element_at("sy", F.col("i") + 1).alias("right"),
                )
                .groupBy("left", "right")
                .agg(F.sum("freq").alias("c"))
            )
            best = pairs.orderBy(
                F.col("c").desc(), F.col("left"), F.col("right")
            ).first()
            if best is None:
                raise ValueError(
                    f"BPE round {rnd}: no adjacent pairs in the corpus "
                    "(empty documents or single-character words only)"
                )
            rows.append((rnd, best["left"], best["right"], int(best["c"])))
            cur = cur.withColumn(
                "symstr",
                F.replace(
                    F.col("symstr"),
                    F.lit(f" {best['left']} {best['right']} "),
                    F.lit(f" {best['left']}{best['right']} "),
                ),
            )
        return spark.createDataFrame(
            rows, "round int, left string, right string, pair_count bigint"
        )
    finally:
        sym.unpersist()
