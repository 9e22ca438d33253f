"""Unified data-quality audit (VERDICT r6 #7): the q77 column profile,
qi2 entropy profile, ql1 FD audit, and ql2 inclusion audit are the four
reports a data-quality user runs nightly over the same tables — run
separately they re-scan the same inputs four times. ``profile_tables``
derives all four from ONE scan per table:

- each table scans once into a long entries frame via a single
  ``explode`` projection (codegen): one entry per profiled COLUMN
  (``kind='col'``) and one per unordered FD column PAIR
  (``kind='pair'``, carrying both values) — pairs cannot be recovered
  from a single-column unpivot (it destroys joint distributions), so
  they ride the same generator instead of a second scan;
- one hash aggregate to ``(kind, name, va, vb) → row count``, persisted
  (``tracked_persist``) — this reduced frame IS the shared input every
  report reads (EXPLAINS shows InMemoryTableScan under all four);
- column profile (rows/nulls/distincts/min/max) and Shannon entropy
  (1e-9-unit BIGINT, the qi2/PSI quantized-term discipline) re-aggregate
  the ``col`` entries; each FD direction of a pair re-aggregates the
  SAME ``pair`` counts (A→B groups on ``va``, B→A on ``vb``); inclusion
  dependencies anti-join the distinct ``col`` values of key columns
  across tables (NULLs excluded per the SQL-FK convention, ADVICE r6).

Scale shape: the explode multiplies scan output by (|cols| + |pairs|),
but everything downstream operates on the REDUCED counts frame (Σ
per-column + per-pair cardinalities, not rows), and the table is read
once instead of once per report — at 100 TB the trade is one wide
pass + a persisted index-sized frame vs. four cold scans. Mirrors the
single-report semantics exactly: profile ``n_distinct`` excludes NULLs
(q77), entropy counts NULL as a category (qi2), FD violating-group /
row-mass / max-fanout definitions are ql1's, coverage is ql2's 4dp
round-half-up basis points.

Output is one tall frame:
``(report, table_name, subject, object, metric, value, value_str)`` —
every metric an exact BIGINT except min/max, which emit their rendered
string in ``value_str`` (dates and categoricals order correctly as
strings; numeric columns should be pre-rendered by the caller).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alaska_etl_spark.cache import tracked_persist
from alaska_etl_spark.functions.fixedpoint import div_half_up

__all__ = ["table_entry_counts", "profile_tables"]

_OUT_COLS = ["report", "table_name", "subject", "object", "metric", "value", "value_str"]


def table_entry_counts(
    df: DataFrame, cols: list[str], pairs: list[tuple[str, str]]
) -> DataFrame:
    """ONE scan → ``(kind, name, va, vb, _c)``: per-column value counts
    (``kind='col'``, ``vb`` NULL) and per-unordered-pair joint value
    counts (``kind='pair'``, ``name='a|b'``) from a single explode."""
    entries = F.array(
        *[
            F.struct(
                F.lit("col").alias("kind"),
                F.lit(c).alias("name"),
                F.col(c).cast("string").alias("va"),
                F.lit(None).cast("string").alias("vb"),
            )
            for c in cols
        ],
        *[
            F.struct(
                F.lit("pair").alias("kind"),
                F.lit(f"{a}|{b}").alias("name"),
                F.col(a).cast("string").alias("va"),
                F.col(b).cast("string").alias("vb"),
            )
            for a, b in pairs
        ],
    )
    long = df.select(F.explode(entries).alias("_e")).select("_e.*")
    return long.groupBy("kind", "name", "va", "vb").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )


def _profile_report(col_counts: DataFrame, table: str) -> DataFrame:
    per_col = col_counts.groupBy("name").agg(
        F.sum("_c").cast("bigint").alias("_n_rows"),
        F.sum(F.when(F.col("va").isNull(), F.col("_c")).otherwise(0))
        .cast("bigint")
        .alias("_n_null"),
        F.count("va").cast("bigint").alias("_n_distinct"),  # non-null groups
        F.min("va").alias("_min"),
        F.max("va").alias("_max"),
    )
    return per_col.select(
        F.expr(
            "stack(5, "
            "'n_rows', _n_rows, CAST(NULL AS STRING), "
            "'n_null', _n_null, CAST(NULL AS STRING), "
            "'n_distinct', _n_distinct, CAST(NULL AS STRING), "
            "'min', CAST(NULL AS BIGINT), _min, "
            "'max', CAST(NULL AS BIGINT), _max) "
            "AS (metric, value, value_str)"
        ),
        F.lit("profile").alias("report"),
        F.lit(table).alias("table_name"),
        F.col("name").alias("subject"),
        F.lit(None).cast("string").alias("object"),
    ).select(*_OUT_COLS)


def _entropy_report(col_counts: DataFrame, table: str, scale: int) -> DataFrame:
    totals = col_counts.groupBy("name").agg(
        F.sum("_c").cast("bigint").alias("_n")
    )
    terms = col_counts.join(F.broadcast(totals), "name").select(
        "name",
        F.round(
            F.lit(scale)
            * (F.col("_c") / F.col("_n"))
            * (F.log(F.col("_n")) - F.log(F.col("_c")))
        )
        .cast("long")
        .alias("_t"),
    )
    return (
        terms.groupBy("name")
        .agg(F.sum("_t").cast("bigint").alias("value"))
        .select(
            F.lit("entropy").alias("report"),
            F.lit(table).alias("table_name"),
            F.col("name").alias("subject"),
            F.lit(None).cast("string").alias("object"),
            F.lit("entropy_units").alias("metric"),
            "value",
            F.lit(None).cast("string").alias("value_str"),
        )
    )


def _fd_report(
    pair_counts: DataFrame, table: str, pairs: list[tuple[str, str]]
) -> DataFrame:
    parts = []
    for a, b in pairs:
        pc = pair_counts.filter(F.col("name") == f"{a}|{b}")
        for det, dep, key in ((a, b, "va"), (b, a, "vb")):
            per_det = pc.groupBy(key).agg(
                F.count(F.lit(1)).cast("bigint").alias("_fan"),
                F.sum("_c").cast("bigint").alias("_mass"),
            )
            parts.append(
                per_det.agg(
                    F.count(F.lit(1)).cast("bigint").alias("_n_groups"),
                    F.sum(F.when(F.col("_fan") > 1, 1).otherwise(0))
                    .cast("bigint")
                    .alias("_vg"),
                    F.sum(F.when(F.col("_fan") > 1, F.col("_mass")).otherwise(0))
                    .cast("bigint")
                    .alias("_vr"),
                    F.max("_fan").cast("bigint").alias("_mf"),
                ).select(
                    F.expr(
                        "stack(4, "
                        "'n_groups', _n_groups, "
                        "'violating_groups', _vg, "
                        "'violating_rows', _vr, "
                        "'max_fanout', _mf) AS (metric, value)"
                    ),
                    F.lit("fd").alias("report"),
                    F.lit(table).alias("table_name"),
                    F.lit(det).alias("subject"),
                    F.lit(dep).alias("object"),
                    F.lit(None).cast("string").alias("value_str"),
                ).select(*_OUT_COLS)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _ind_report(
    key_sets: "list[tuple[str, str, DataFrame]]", bp_scale: int = 10**4
) -> DataFrame:
    parts = []
    for lt, lc, lf in key_sets:
        for rt, rc, rf in key_sets:
            if (lt, lc) == (rt, rc):
                continue
            missing = lf.join(rf, on="_k", how="left_anti")
            parts.append(
                lf.agg(F.count(F.lit(1)).cast("bigint").alias("_nd"))
                .crossJoin(
                    missing.agg(F.count(F.lit(1)).cast("bigint").alias("_nm"))
                )
                .select(
                    F.expr(
                        "stack(2, 'n_distinct', _nd, 'n_missing', _nm) "
                        "AS (metric, value)"
                    ),
                    div_half_up(f"{bp_scale} * (_nd - _nm)", "_nd").alias("_bp"),
                    F.lit("ind").alias("report"),
                    F.lit(lt).alias("table_name"),
                    F.lit(lc).alias("subject"),
                    F.lit(f"{rt}.{rc}").alias("object"),
                    F.lit(None).cast("string").alias("value_str"),
                )
                .select(*_OUT_COLS, "_bp")
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # the coverage row rides the same 2-row stack result: emit it once
    # per pair by duplicating the n_distinct row's _bp under its own
    # metric name
    coverage = (
        out.filter(F.col("metric") == "n_distinct")
        .select(
            "report", "table_name", "subject", "object",
            F.lit("coverage_bp").alias("metric"),
            F.col("_bp").alias("value"),
            F.lit(None).cast("string").alias("value_str"),
        )
    )
    return out.select(*_OUT_COLS).unionByName(coverage)


def profile_tables(
    tables: "list[tuple[str, DataFrame, list[str], list[tuple[str, str]]]]",
    ind_keys: "list[tuple[str, str]]",
    *,
    entropy_cols: "dict[str, list[str]] | None" = None,
    scale: int = 10**9,
) -> DataFrame:
    """The unified audit. ``tables`` is ``[(name, df, profile_cols,
    fd_pairs)]``; ``ind_keys`` is ``[(table_name, key_col)]`` where the
    key col must appear in that table's ``profile_cols`` (its distinct
    values come from the shared counts frame, not a new scan);
    ``entropy_cols`` optionally restricts the entropy report per table
    (default: all profile cols). Returns the tall report frame ordered
    by (report, table_name, subject, object, metric)."""
    reports = []
    key_sets: list[tuple[str, str, DataFrame]] = []
    for name, df, cols, pairs in tables:
        counts = tracked_persist(table_entry_counts(df, cols, pairs))
        col_counts = counts.filter(F.col("kind") == "col")
        ecols = (entropy_cols or {}).get(name, cols)
        reports.append(_profile_report(col_counts, name))
        if ecols:
            reports.append(
                _entropy_report(
                    col_counts.filter(F.col("name").isin(ecols)), name, scale
                )
            )
        if pairs:
            reports.append(
                _fd_report(counts.filter(F.col("kind") == "pair"), name, pairs)
            )
        for t, k in ind_keys:
            if t == name:
                assert k in cols, f"IND key {t}.{k} must be profiled"
                key_sets.append(
                    (
                        t,
                        k,
                        col_counts.filter(
                            (F.col("name") == k) & F.col("va").isNotNull()
                        ).select(F.col("va").alias("_k")),
                    )
                )
    if key_sets:
        reports.append(_ind_report(key_sets))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("report", "table_name", "subject", "object", "metric")
