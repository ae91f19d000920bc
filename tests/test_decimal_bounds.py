"""Guard the decimal(18,8) per-row cast boundary (VERDICT r13 #3).

Since r13 the Spark side of every ``functions.dec_sum`` / ``dec_avg``
aggregate casts each input row to decimal(18,8) (long-backed — see
``functions._DEC``) while the DuckDB oracle twin stays DECIMAL(30,8).
The schemes are bit-identical ONLY while every per-row |value| stays
below 1e10: past that, Spark's non-ANSI cast NULLs the row and the
SUM silently drops it, surfacing only as a downstream oracle hash
mismatch. Nothing in the code can enforce what the DRIVER'S testdata
contains — this test does, loudly, against every scale factor
present, with a 10× safety margin (1e9): a future testdata refresh
that moves a money/measure column near the boundary fails HERE with
the boundary named, instead of as an opaque hash diff.

Footer-statistics only (pyarrow min/max) — no Spark session, no data
scan; runs in milliseconds.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pytest

# Every DOUBLE column that flows through a per-row decimal(18,8) cast
# somewhere in the query inventory (dec_sum/dec_avg users and inline
# _DEC sites). The guard bound is 1e9 — one order of magnitude under
# the 1e10 decimal(18,8) overflow boundary.
_GUARDED_COLUMNS: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_extendedprice", "l_quantity", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
    "events": ("value",),
}
_BOUND = 1e9  # 10× margin under the 1e10 decimal(18,8) row boundary


def _sf_dirs() -> list[Path]:
    root = Path("/root/testdata")
    return sorted(p for p in root.glob("sf*") if p.is_dir())


@pytest.mark.parametrize("sf_dir", _sf_dirs(), ids=lambda p: p.name)
def test_money_columns_stay_inside_decimal18_boundary(sf_dir: Path):
    offenders: list[str] = []
    for table, cols in _GUARDED_COLUMNS.items():
        path = sf_dir / f"{table}.parquet"
        if not path.exists():
            continue
        meta = pq.ParquetFile(str(path)).metadata
        names = {
            meta.schema.column(i).path: i for i in range(meta.num_columns)
        }
        for col in cols:
            if col not in names:
                continue
            extreme = 0.0
            for rg in range(meta.num_row_groups):
                stats = meta.row_group(rg).column(names[col]).statistics
                assert stats is not None and stats.has_min_max, (
                    f"{sf_dir.name}/{table}.{col}: no parquet min/max "
                    "stats — cannot guard the decimal(18,8) boundary"
                )
                extreme = max(
                    extreme, abs(float(stats.min)), abs(float(stats.max))
                )
            if extreme >= _BOUND:
                offenders.append(
                    f"{sf_dir.name}/{table}.{col}: max|x|={extreme:.6g}"
                )
    assert not offenders, (
        "testdata column(s) within 10x of the 1e10 decimal(18,8) "
        "per-row overflow boundary — widen functions._DEC (and the "
        "equivalence argument in functions/__init__.py) before "
        f"trusting dec_sum/dec_avg: {offenders}"
    )
