"""Local mirror of the driver's Spark-vs-DuckDB compare.

Normalizes both result sets to column-name-sorted, row-sorted tuples of
canonical strings and asserts exact equality — the same invariant the
driver's order-insensitive value-hash checks.
"""

from __future__ import annotations

import datetime
import math


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; identical doubles → identical text
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    return df.columns, [tuple(r) for r in df.collect()]


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _kind(type_str: str) -> str:
    """Collapse a Spark simpleString / DuckDB type name to a hash-kind.

    The driver's value hash goes through pandas, where DuckDB HUGEINT
    (the result type of SUM over integers) becomes float64 while Spark
    bigint stays int64 — identical values, different hash. Giving
    HUGEINT its own kind makes the local suite fail exactly where the
    driver would.
    """
    t = type_str.strip().upper()
    if t.endswith("[]") or t.startswith("ARRAY"):
        return "list"
    if t == "HUGEINT":
        return "hugeint"
    if t in ("TINYINT", "SMALLINT", "INT", "INTEGER", "BIGINT", "LONG"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t in ("STRING", "VARCHAR", "TEXT"):
        return "str"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t in ("BOOLEAN", "BOOL"):
        return "bool"
    return "other"


def assert_type_parity(df, con, sql: str, name: str = "?") -> None:
    """Column-name-matched type-kind compare (mirrors the driver hash)."""
    s_types = {f.name: _kind(f.dataType.simpleString()) for f in df.schema.fields}
    rel = con.sql(sql)
    d_types = {c: _kind(str(t)) for c, t in zip(rel.columns, rel.types)}
    mism = {
        c: (s_types[c], d_types[c])
        for c in s_types
        if c in d_types and s_types[c] != d_types[c]
    }
    assert not mism, (
        f"{name}: type-kind mismatch (spark, duck): {mism} — the driver's "
        f"pandas-based value hash WILL diverge here (e.g. wrap integer "
        f"SUM oracles in CAST(... AS BIGINT))"
    )


#: Queries allowed to return ZERO rows at the sf0.001 smoke scale —
#: each is non-empty at sf0.01 (the driver's gate scale; verified by
#: the r14 empty-result audit) but its filter legitimately drains the
#: 150-row/6k-row smoke tables. Everything else must return rows: an
#: empty result makes the value-hash comparison vacuous (empty
#: matches empty — how the pre-r14 Fisher index hid a degenerate
#: 1995 period split and dedup_embedding_cosine hid an unreachable
#: 0.93 threshold).
SMOKE_EMPTY_OK = frozenset(
    {
        # empty at sf0.001 only (filters drain the 150-row/6k-row
        # smoke tables); non-empty at sf0.01 and sf0.1
        "agg_nation_trade_volume",
        "dedup_incremental",
        "join_spatial_grid",
        # empty at sf0.1 only: the synthetic corpus vocabulary does
        # not grow with scale, so gram document frequency rises
        # linearly and the ABSOLUTE GRAM_DF_CAP (the deliberate
        # 100 TB fan-out bound — cap² per gram must not scale with
        # corpus) drops every gram the planted near-dup pairs share.
        # Non-empty at sf0.001/sf0.01, where the driver's gate runs.
        # A relative cap would keep these non-empty but makes the
        # pair join corpus-quadratic — rejected (see neardup.df_capped).
        "dedup_ngram_jaccard",
        "dedup_cluster_cc",
    }
)


def assert_parity(df, con, sql: str, name: str = "?") -> None:
    # The DRIVER canonicalizes via pandas sort_values over every output
    # column; a list/struct/map-typed column is unhashable there and the
    # whole row crashes (round-3 multimodal_embed_extract failure). The
    # local _canon handles lists fine, so without this guard the local
    # suite passes where the driver dies — fail here instead.
    complex_cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} break the "
        f"driver's pandas canonicalization — explode or serialize them"
    )
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    assert s_rows or name in SMOKE_EMPTY_OK, (
        f"{name}: empty result — the value-hash comparison is vacuous "
        f"(empty matches empty). If the emptiness is data-legitimate "
        f"at THIS scale factor only, allowlist it in SMOKE_EMPTY_OK "
        f"after verifying it returns rows at sf0.01; otherwise fix "
        f"the query's constants against the testdata ranges (see the "
        f"r14 Fisher-index degeneracy in SCALE.md)."
    )
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert_type_parity(df, con, sql, name)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn = normalize(s_cols, s_rows)
    dn = normalize(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
