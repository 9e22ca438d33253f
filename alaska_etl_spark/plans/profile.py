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
- the per-table entry frames UNION (tagged by table) into ONE hash
  aggregate to ``(table, kind, name, va, _ha, _hb) → row count``,
  persisted (``tracked_persist``) and materialized behind a one-job
  barrier — this single reduced frame IS the shared input every report
  reads (EXPLAINS shows one InMemoryRelation under all four). The r8
  shape built a separate counts cache per table, which cost a full
  explode→aggregate→cache chain (≈6 stages) per table AND let
  concurrent report stages race to build each not-yet-materialized
  cache (tasks of sibling stages recompute cache partitions — no
  cross-task wait in BlockManager.getOrElseUpdate); the r9 anatomy
  measured the orders counts reduce running twice. One union, one
  aggregate, one cache, one barrier;
- column profile (rows/nulls/distincts/min/max) and Shannon entropy
  (1e-9-unit BIGINT, the qi2/PSI quantized-term discipline) re-aggregate
  the ``col`` entries FOR ALL TABLES IN ONE PASS (groupBy table+name);
  each FD direction of a pair re-aggregates the SAME ``pair`` counts
  (A→B groups on ``va``, B→A on ``vb``); inclusion dependencies
  anti-join the distinct ``col`` values of key columns across tables
  (NULLs excluded per the SQL-FK convention, ADVICE r6).

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

__all__ = ["table_entries", "profile_tables", "format_validity"]

_OUT_COLS = ["report", "table_name", "subject", "object", "metric", "value", "value_str"]


def table_entries(
    df: DataFrame, cols: list[str], pairs: list[tuple[str, str]]
) -> DataFrame:
    """ONE scan → long entry frame ``(kind, name, va, _ha, _hb)``:
    per-column value entries (``kind='col'``, string ``va`` — the
    profile needs real min/max renderings and the IND report real
    cross-table values) and per-unordered-pair joint entries
    (``kind='pair'``, ``name='a|b'``) from a single explode.

    Pair entries carry xxhash64 IDENTITIES (8-byte longs), not string
    values: FD metrics are pure counts over groupings, so any injective
    mapping gives identical numbers, and the string form measured ~2×
    the shuffle bytes on key-grain pairs (the audit's dominant mass).
    A 64-bit collision would merge two determinant groups and surface
    as a mismatch against the value-keyed SQL oracle — the same
    accepted-and-checked stance as the simjoin gram hashing. NULLs hash
    to the seed constant, preserving NULL-is-a-group semantics.

    The scan keeps its natural split parallelism: an r9 A/B measured a
    pre-explode ``repartition(defaultParallelism)`` at 20× MORE
    executor-CPU for the same rows (26 vs 1.2 CPU-s on sf0.1 orders) —
    32 concurrent partial-agg hash maps contend in the shared local
    JVM, while the single clustered split runs the codegen pipeline at
    memory speed. At 100 TB the scan has thousands of splits and
    parallelism is free."""
    need = sorted({c for c in cols} | {c for p in pairs for c in p})
    entries = F.array(
        *[
            F.struct(
                F.lit("col").alias("kind"),
                F.lit(c).alias("name"),
                F.col(c).cast("string").alias("va"),
                F.lit(None).cast("bigint").alias("_ha"),
                F.lit(None).cast("bigint").alias("_hb"),
            )
            for c in cols
        ],
        *[
            F.struct(
                F.lit("pair").alias("kind"),
                F.lit(f"{a}|{b}").alias("name"),
                F.lit(None).cast("string").alias("va"),
                F.xxhash64(F.col(a)).alias("_ha"),
                F.xxhash64(F.col(b)).alias("_hb"),
            )
            for a, b in pairs
        ],
    )
    return df.select(*need).select(F.explode(entries).alias("_e")).select("_e.*")


def _profile_report(col_counts: DataFrame) -> DataFrame:
    per_col = col_counts.groupBy("table_name", "name").agg(
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
        "table_name",
        F.col("name").alias("subject"),
        F.lit(None).cast("string").alias("object"),
    ).select(*_OUT_COLS)


def _entropy_report(col_counts: DataFrame, scale: int) -> DataFrame:
    totals = col_counts.groupBy("table_name", "name").agg(
        F.sum("_c").cast("bigint").alias("_n")
    )
    terms = col_counts.join(F.broadcast(totals), ["table_name", "name"]).select(
        "table_name",
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
        terms.groupBy("table_name", "name")
        .agg(F.sum("_t").cast("bigint").alias("value"))
        .select(
            F.lit("entropy").alias("report"),
            "table_name",
            F.col("name").alias("subject"),
            F.lit(None).cast("string").alias("object"),
            F.lit("entropy_units").alias("metric"),
            "value",
            F.lit(None).cast("string").alias("value_str"),
        )
    )


def _fd_report(pair_counts: DataFrame) -> DataFrame:
    """ALL FD directions of ALL tables from TWO aggregates total (not
    two per direction): the forward determinant is the pair's ``va``,
    the reverse determinant its ``vb`` — one union doubles the pair
    counts into (table, pair, direction, determinant-value) rows, one
    aggregate computes per-determinant fan-out/mass, one more reduces
    to the per-direction report. Per-direction sub-plans (the first
    cut) paid the ~0.1 s stage floor 2·|pairs|·2 times — 24
    driver-scheduled stages for the 6-pair audit; this shape pays it
    twice."""
    fwd = pair_counts.select(
        "table_name", "name", F.lit("f").alias("_dir"), F.col("_ha").alias("_k"), "_c"
    )
    rev = pair_counts.select(
        "table_name", "name", F.lit("r").alias("_dir"), F.col("_hb").alias("_k"), "_c"
    )
    per_det = (
        fwd.unionByName(rev)
        .groupBy("table_name", "name", "_dir", "_k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_fan"),
            F.sum("_c").cast("bigint").alias("_mass"),
        )
    )
    stats = per_det.groupBy("table_name", "name", "_dir").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_groups"),
        F.sum(F.when(F.col("_fan") > 1, 1).otherwise(0)).cast("bigint").alias("_vg"),
        F.sum(F.when(F.col("_fan") > 1, F.col("_mass")).otherwise(0))
        .cast("bigint")
        .alias("_vr"),
        F.max("_fan").cast("bigint").alias("_mf"),
    )
    left = F.split(F.col("name"), r"\|")[0]
    right = F.split(F.col("name"), r"\|")[1]
    return stats.select(
        F.expr(
            "stack(4, "
            "'n_groups', _n_groups, "
            "'violating_groups', _vg, "
            "'violating_rows', _vr, "
            "'max_fanout', _mf) AS (metric, value)"
        ),
        F.lit("fd").alias("report"),
        "table_name",
        F.when(F.col("_dir") == "f", left).otherwise(right).alias("subject"),
        F.when(F.col("_dir") == "f", right).otherwise(left).alias("object"),
        F.lit(None).cast("string").alias("value_str"),
    ).select(*_OUT_COLS)


def _ind_report(
    col_counts: DataFrame, ind_keys: "list[tuple[str, str]]", bp_scale: int = 10**4
) -> DataFrame:
    """ALL inclusion pairs from ONE value self-join (not one anti-join
    per ordered pair): the key columns' distinct values (straight off
    the shared counts cache) tag into one (column-id, value) frame; a
    single self-join on the value counts |K_L ∩ K_R| for EVERY pair
    simultaneously, and n_missing = |K_L| − |K_L ∩ K_R|. The per-pair
    anti-join cut paid the stage floor 3·|pairs| times (36 stages for
    4 key columns); this is one join + two small aggregates, and at
    scale the shared value frame shuffles once instead of once per
    pair. Join identity, not rendered value: the self-join only tests
    cross-table equality, and 8-byte xxhash64 longs shuffle ~5×
    lighter than rendered key strings (the value-keyed oracle still
    checks the exact counts)."""
    spark = col_counts.sparkSession
    key_cond = None
    for t, k in ind_keys:
        c = (F.col("table_name") == t) & (F.col("name") == k)
        key_cond = c if key_cond is None else (key_cond | c)
    tagged = tracked_persist(
        col_counts.filter(key_cond)
        .filter(F.col("va").isNotNull())
        .select(
            F.concat_ws(".", "table_name", "name").alias("_cid"),
            F.xxhash64(F.col("va")).alias("_k"),
        )
    )
    nd = tagged.groupBy("_cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nd")
    )
    common = (
        tagged.alias("a")
        .join(tagged.alias("b"), "_k")
        .filter(F.col("a._cid") != F.col("b._cid"))
        .groupBy(F.col("a._cid").alias("_lcid"), F.col("b._cid").alias("_rcid"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nc"))
    )
    ids = [(f"{t}.{c}", t, c) for t, c in ind_keys]
    pairs_df = spark.createDataFrame(
        [
            (ln, lt, lc, rn, rt, rc)
            for ln, lt, lc in ids
            for rn, rt, rc in ids
            if ln != rn
        ],
        "_lcid string, _lt string, _lc string, _rcid string, _rt string, _rc string",
    )
    stats = (
        F.broadcast(pairs_df)
        .join(nd.select(F.col("_cid").alias("_lcid"), "_nd"), "_lcid")
        .join(common, ["_lcid", "_rcid"], "left")
        .select(
            "_lt", "_lc", "_rcid", "_nd",
            (F.col("_nd") - F.coalesce(F.col("_nc"), F.lit(0)))
            .cast("bigint")
            .alias("_nm"),
        )
    )
    return stats.select(
        F.expr(
            "stack(3, 'n_distinct', _nd, 'n_missing', _nm, "
            # nullif: a key column that is entirely NULL has _nd = 0;
            # both engines must emit NULL there, not raise (ADVICE r7 —
            # DuckDB's integer // by zero errors while Spark's div
            # returns NULL; the oracle twin carries the same nullif).
            f"'coverage_bp', (2 * {bp_scale} * (_nd - _nm) + _nd) "
            "div nullif(2 * _nd, 0)) "
            "AS (metric, value)"
        ),
        F.lit("ind").alias("report"),
        F.col("_lt").alias("table_name"),
        F.col("_lc").alias("subject"),
        F.col("_rcid").alias("object"),
        F.lit(None).cast("string").alias("value_str"),
    ).select(*_OUT_COLS)


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
    parts = []
    fd_any = False
    ecol_cond = None
    for name, df, cols, pairs in tables:
        parts.append(
            table_entries(df, cols, pairs).select(
                F.lit(name).alias("table_name"), "*"
            )
        )
        fd_any = fd_any or bool(pairs)
        for c in (entropy_cols or {}).get(name, cols):
            cond = (F.col("table_name") == name) & (F.col("name") == c)
            ecol_cond = cond if ecol_cond is None else (ecol_cond | cond)
    tcols = {n: cs for n, _, cs, _ in tables}
    for t, k in ind_keys:
        assert k in tcols.get(t, []), f"IND key {t}.{k} must be profiled"
    long = parts[0]
    for p in parts[1:]:
        long = long.unionByName(p)
    counts = tracked_persist(
        long.groupBy("table_name", "kind", "name", "va", "_ha", "_hb").agg(
            F.count(F.lit(1)).cast("bigint").alias("_c")
        )
    )
    # One-job materialization barrier: the report union references this
    # cache 4-5 times and Spark runs sibling stages of one job
    # concurrently — tasks hitting a not-yet-built cache partition each
    # recompute it (no cross-task wait in BlockManager), so without the
    # barrier the whole explode+aggregate ran up to twice (r9 anatomy).
    counts.count()
    col_counts = counts.filter(F.col("kind") == "col")
    reports = [_profile_report(col_counts)]
    if ecol_cond is not None:
        reports.append(_entropy_report(col_counts.filter(ecol_cond), scale))
    if fd_any:
        reports.append(_fd_report(counts.filter(F.col("kind") == "pair")))
    if ind_keys:
        reports.append(_ind_report(col_counts, ind_keys))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("report", "table_name", "subject", "object", "metric")


def format_validity(
    tables: "list[tuple[str, DataFrame, list[tuple[str, str, str, object]]]]",
) -> DataFrame:
    """Format/constraint validity audit — the rule-driven sibling of
    the statistical profile: per (table, column, rule), how many
    non-NULL values satisfy a declared format contract. Rules are
    declarative so the DuckDB oracle can carry the identical
    semantics: ``("regex", pattern)`` uses a conservative shared
    dialect (anchors, classes, bounded quantifiers — valid in both
    Java regex and DuckDB RE2), ``("non_negative", None)`` is the
    numeric range form. NULLs are exempt (the profile's null_bp
    reports them; validity is about malformed PRESENT values).

    Each table's rules ride ONE tagged explode + ONE hash aggregate
    (the r7 stage-floor rule); tables union. Returns (table_name,
    subject, rule, n_checked, n_valid, valid_bp) ordered."""
    from alaska_etl_spark.functions.fixedpoint import div_half_up

    outs = []
    for name, df, rules in tables:
        entries = []
        for col, rule_name, kind, arg in rules:
            if kind == "regex":
                ok = F.col(col).cast("string").rlike(arg)
            elif kind == "non_negative":
                ok = F.col(col) >= 0
            else:
                raise ValueError(f"unknown rule kind {kind!r}")
            entries.append(
                F.struct(
                    F.lit(col).alias("_c"),
                    F.lit(rule_name).alias("_r"),
                    F.col(col).isNotNull().alias("_nn"),
                    F.coalesce(ok, F.lit(False)).alias("_ok"),
                )
            )
        outs.append(
            df.select(F.explode(F.array(*entries)).alias("_e"))
            .select("_e._c", "_e._r", "_e._nn", "_e._ok")
            .filter(F.col("_nn"))
            .groupBy("_c", "_r")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_checked"),
                F.sum(F.when(F.col("_ok"), 1).otherwise(0))
                .cast("bigint")
                .alias("n_valid"),
            )
            .select(
                F.lit(name).alias("table_name"),
                F.col("_c").alias("subject"),
                F.col("_r").alias("rule"),
                "n_checked",
                "n_valid",
                div_half_up("10000 * n_valid", "nullif(n_checked, 0)").alias(
                    "valid_bp"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name", "subject", "rule")
