"""Unified data-quality audit (plans/profile.py): one scan per table
feeding the profile / entropy / FD / IND reports. Pinned against the
four standalone operators it unifies (q77-style counts,
text.column_entropy, text.fd_audit, text.inclusion_audit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from alaska_etl_spark.operators.text import column_entropy, fd_audit, inclusion_audit
from alaska_etl_spark.plans.profile import profile_tables


def _frame(spark):
    rows = [
        (1, "A", "high", None),
        (2, "A", "low", 10),
        (3, "B", "low", 10),
        (4, "B", "low", 20),
        (5, None, "high", 30),
        (5, None, "high", 30),  # duplicate key value: o→k FD violation
    ]
    return spark.createDataFrame(rows, "k bigint, cat string, pri string, v int")


def _audit(spark):
    df = _frame(spark)
    ref = spark.createDataFrame([(10,), (20,), (99,)], "r bigint")
    return (
        profile_tables(
            [("t", df, ["k", "cat", "pri", "v"], [("cat", "pri"), ("k", "cat")]),
             ("ref", ref, ["r"], [])],
            ind_keys=[("t", "v"), ("ref", "r")],
            entropy_cols={"t": ["cat", "pri"], "ref": []},
        )
        .collect()
    )


def _rows(audit, report):
    return {
        (r.table_name, r.subject, r.object, r.metric): (r.value, r.value_str)
        for r in audit
        if r.report == report
    }


def test_profile_report_counts_and_bounds(spark):
    prof = _rows(_audit(spark), "profile")
    assert prof[("t", "k", None, "n_rows")][0] == 6
    assert prof[("t", "cat", None, "n_null")][0] == 2
    assert prof[("t", "cat", None, "n_distinct")][0] == 2  # NULL excluded
    assert prof[("t", "cat", None, "min")] == (None, "A")
    assert prof[("t", "pri", None, "max")] == (None, "low")
    assert prof[("t", "v", None, "n_null")][0] == 1
    assert prof[("ref", "r", None, "n_distinct")][0] == 3


def test_entropy_matches_standalone_operator(spark):
    ent = _rows(_audit(spark), "entropy")
    standalone = {
        r.column_name: r.entropy_units
        for r in column_entropy(_frame(spark), ["cat", "pri"]).collect()
    }
    assert ent[("t", "cat", None, "entropy_units")][0] == standalone["cat"]
    assert ent[("t", "pri", None, "entropy_units")][0] == standalone["pri"]
    assert ("t", "k", None, "entropy_units") not in ent  # restricted


def test_fd_matches_standalone_operator(spark):
    fd = _rows(_audit(spark), "fd")
    standalone = {
        (r.determinant, r.dependent): r
        for r in fd_audit(
            _frame(spark).select(
                F.col("k").cast("string").alias("k"), "cat", "pri"
            ),
            ["k", "cat"],
        ).collect()
    }
    for det, dep in (("k", "cat"), ("cat", "k")):
        ref = standalone[(det, dep)]
        assert fd[("t", det, dep, "n_groups")][0] == ref.n_groups
        assert fd[("t", det, dep, "violating_groups")][0] == ref.violating_groups
        assert fd[("t", det, dep, "violating_rows")][0] == ref.violating_rows
        assert fd[("t", det, dep, "max_fanout")][0] == ref.max_fanout
    # cat -> pri: cat=A maps to {high, low} -> violated
    assert fd[("t", "cat", "pri", "violating_groups")][0] >= 1


def test_ind_matches_standalone_operator(spark):
    ind = _rows(_audit(spark), "ind")
    frames = [
        ("t", _frame(spark).select(F.col("v").cast("string").alias("v")), "v"),
        (
            "ref",
            spark.createDataFrame([(10,), (20,), (99,)], "r bigint").select(
                F.col("r").cast("string").alias("r")
            ),
            "r",
        ),
    ]
    standalone = {
        (r.from_table, r.to_table): r for r in inclusion_audit(frames).collect()
    }
    fwd = standalone[("t", "ref")]
    assert ind[("t", "v", "ref.r", "n_distinct")][0] == fwd.n_distinct == 3
    assert ind[("t", "v", "ref.r", "n_missing")][0] == fwd.n_missing == 1  # 30
    assert ind[("t", "v", "ref.r", "coverage_bp")][0] == fwd.coverage_bp
    rev = standalone[("ref", "t")]
    assert ind[("ref", "r", "t.v", "n_missing")][0] == rev.n_missing == 1  # 99


def test_one_scan_per_table(spark):
    """The four reports share each table's persisted counts frame: the
    audit plan references the source via InMemoryTableScan, and the raw
    source scan appears at most once per table inside the cached
    relation, not once per report."""
    df = _frame(spark)
    audit = profile_tables(
        [("t", df, ["k", "cat"], [("k", "cat")])],
        ind_keys=[],
        entropy_cols={"t": ["cat"]},
    )
    plan = audit._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


# --- hypothesis: the unified audit equals a pure-Python replica ------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_val = st.one_of(st.none(), st.integers(0, 5))
_rows_strategy = st.lists(st.tuples(_val, _val), min_size=1, max_size=25)


@given(rows=_rows_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_profile_and_fd_match_python_replica(spark, rows):
    df = spark.createDataFrame(rows, "a int, b int")
    audit = profile_tables(
        [("t", df, ["a", "b"], [("a", "b")])], ind_keys=[], entropy_cols={"t": []}
    ).collect()
    got = {
        (r.report, r.subject, r.object, r.metric): (r.value, r.value_str)
        for r in audit
    }
    for col, idx in (("a", 0), ("b", 1)):
        vals = [r[idx] for r in rows]
        nn = [v for v in vals if v is not None]
        assert got[("profile", col, None, "n_rows")][0] == len(vals)
        assert got[("profile", col, None, "n_null")][0] == vals.count(None)
        assert got[("profile", col, None, "n_distinct")][0] == len(set(nn))
        exp_min = min((str(v) for v in nn), default=None)
        exp_max = max((str(v) for v in nn), default=None)
        assert got[("profile", col, None, "min")][1] == exp_min
        assert got[("profile", col, None, "max")][1] == exp_max
    # FD a->b (NULL is a value, per ql1 semantics)
    from collections import defaultdict

    groups = defaultdict(set)
    mass = defaultdict(int)
    for a, b in rows:
        groups[a].add(b)
        mass[a] += 1
    fan = {k: len(v) for k, v in groups.items()}
    assert got[("fd", "a", "b", "n_groups")][0] == len(groups)
    assert got[("fd", "a", "b", "violating_groups")][0] == sum(
        1 for f in fan.values() if f > 1
    )
    assert got[("fd", "a", "b", "violating_rows")][0] == sum(
        mass[k] for k, f in fan.items() if f > 1
    )
    assert got[("fd", "a", "b", "max_fanout")][0] == max(fan.values())


def test_format_validity_rules_and_null_exemption(spark):
    import pytest

    from alaska_etl_spark.plans.profile import format_validity

    t = spark.createDataFrame(
        [
            ("Customer#000000001", 10.0),
            ("Customer#0001", -5.0),       # bad name, negative balance
            (None, None),                   # NULLs exempt from both rules
        ],
        "name string, bal double",
    )
    out = format_validity(
        [
            (
                "t",
                t,
                [
                    ("name", "name_format", "regex", "^Customer#[0-9]{9}$"),
                    ("bal", "non_negative", "non_negative", None),
                ],
            )
        ]
    ).collect()
    got = {(r.subject, r.rule): r for r in out}
    nm = got[("name", "name_format")]
    assert (nm.n_checked, nm.n_valid, nm.valid_bp) == (2, 1, 5000)
    nn = got[("bal", "non_negative")]
    assert (nn.n_checked, nn.n_valid, nn.valid_bp) == (2, 1, 5000)
    with pytest.raises(ValueError):
        format_validity([("t", t, [("name", "x", "nonsense", None)])])
