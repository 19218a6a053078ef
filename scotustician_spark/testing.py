"""Differential-testing helpers shared by tests/ and tools/.

The driver's correctness gate compares a Spark result against a DuckDB
oracle by row-count, sorted column names, and an order-insensitive
value hash (floats rounded to 6 significant digits before hashing to
absorb float summation-order differences between engines). These
helpers replicate that comparison exactly so local pytest == driver
verdict.
"""

from __future__ import annotations

import hashlib
import math


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_lines(cols: list[str], rows) -> list[str]:
    """Rows → sorted list of normalized pipe-joined lines, columns in
    name order (order-insensitive on both axes)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


def value_hash(cols: list[str], rows) -> str:
    h = hashlib.sha256()
    for ln in norm_lines(cols, rows):
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def register_duckdb_views(con, sf_dir: str) -> None:
    import os

    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def compare_spark_duckdb(sdf, con, oracle_sql: str) -> list[str]:
    """Run both sides; return a list of problem strings (empty = match)."""
    srows = sdf.collect()
    scols = sdf.columns
    res = con.execute(oracle_sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems: list[str] = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if problems:
        return problems
    sl = norm_lines(scols, [[r[c] for c in scols] for r in srows])
    ol = norm_lines(ocols, orows)
    if sl != ol:
        diff = next((f"spark={a!r} oracle={b!r}" for a, b in zip(sl, ol) if a != b), "")
        problems.append(f"value mismatch: first diff {diff[:300]}")
    return problems
