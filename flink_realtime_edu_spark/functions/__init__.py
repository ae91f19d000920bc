"""Column-expression helpers shared across queries.

Oracle-deterministic floating aggregates
----------------------------------------
Money/measure columns in the testdata are DOUBLE (FIXTURES.md). A
plain ``SUM(double)`` is order-dependent in the last ulps, so Spark
and DuckDB would disagree on the value hash. Both engines cast each
input to DECIMAL(30,8) first (exact, order-independent sum), cast
the total back to DOUBLE, and round — giving bit-identical results
regardless of partitioning / shuffle order. This is the M0 decision
from SURVEY.md §7 "hard parts #1"; the DuckDB-side twins live in
``queries/*.py`` oracle strings (`dec_sum_sql` / `dec_avg_sql`).

At 100 TB this costs one extra cast per row inside the hash
aggregate — still whole-stage-codegen'd, still map-side partial
aggregation; it does NOT add a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-ROW cast target. Precision 18 is the widest decimal Spark
# stores long-backed (Decimal.MAX_LONG_DIGITS): at 30,8 every input
# row allocated a heap BigDecimal inside the hash aggregate, and the
# single-scan pricing stage spent ~2× the CPU (measured r13:
# pricing_summary partial-agg stage 0.97 s → ~0.5 s CPU at sf0.1).
# The SUM result type is decimal(p+10, s) either way, so the
# accumulator is exact and the DOUBLE the caller sees is
# bit-identical to the DuckDB oracle's DECIMAL(30,8) twin as long as
# no per-row value overflows: |x| < 10^10 (testdata maxima ~5×10^5 —
# prices, quantities, event values; a future column near 10^10 must
# widen this or the cast NULLs out). Sum capacity decimal(28,8) ≈
# 10^20 absolute — 10^12 rows of 10^6-scale money still exact.
_DEC = "decimal(18,8)"

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def dec_sum(c: ColumnOrName, scale: int = 2) -> Column:
    """Order-independent SUM over a DOUBLE column, rounded.

    DuckDB twin: ``ROUND(CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE), s)``.
    """
    return F.round(F.sum(_col(c).cast(_DEC)).cast("double"), scale)


def dec_avg(c: ColumnOrName, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum, double divide, round.

    The divide happens on identical doubles in both engines, so the
    result is bit-identical. DuckDB twin:
    ``ROUND(CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)/COUNT(*), s)``.
    """
    return F.round(F.sum(_col(c).cast(_DEC)).cast("double") / F.count(F.lit(1)), scale)


def dec_sum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of :func:`dec_sum` (used to build oracle strings)."""
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE), {scale})"


def dec_avg_sql(expr: str, scale: int = 6) -> str:
    """DuckDB SQL twin of :func:`dec_avg`."""
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*), {scale})"


# ---------------------------------------------------------------------------
# Vector helpers (embeddings: array<float>[64], FIXTURES.md)
# ---------------------------------------------------------------------------


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Sequential-order double dot product via higher-order functions.

    Stays JVM-side (no UDF): ``aggregate(zip_with(a,b,*), 0.0, +)``.
    Accumulation is left-to-right over the array, matching DuckDB's
    ``list_dot_product`` on DOUBLE[] element order — bit-identical.
    """
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: ColumnOrName, b: ColumnOrName, scale: int = 6) -> Column:
    """Rounded cosine similarity; round BEFORE any ranking so top-k
    selection is identical in both engines (ties broken by id)."""
    return F.round(dot(a, b) / (l2_norm(a) * l2_norm(b)), scale)


# ---------------------------------------------------------------------------
# Text helpers (documents.text is space-separated tokens, FIXTURES.md)
# ---------------------------------------------------------------------------


def tokens(c: ColumnOrName) -> Column:
    """Whitespace tokenization (the reference's IK-analyzer UDTF maps to
    split+explode for whitespace languages, SURVEY.md §2.10 X1)."""
    return F.split(_col(c), " ")


def word_shingles(c: ColumnOrName, n: int = 3) -> Column:
    """n-gram word shingles as an array<string> (for MinHash, X5).

    Pure higher-order functions — no Python UDF: slide a window of n
    over the token array and concat.
    """
    toks = tokens(c)
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
