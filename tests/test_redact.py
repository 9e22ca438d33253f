"""PII redaction (operators/redact.py): every kind replaced with its
typed token, declaration order respected (an SSN must surface as [SSN],
never a phone fragment), counts audited on the original text."""

from __future__ import annotations

from pyspark.sql import functions as F

from alaska_etl_spark.operators.redact import pii_counts, redact_pii, scrub_documents


def _scrub_one(spark, text: str):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return scrub_documents(df).collect()[0]


def test_each_kind_redacted(spark):
    r = _scrub_one(
        spark,
        "mail a.user+tag@sub.example.org call +1 (907) 555-0042 "
        "from 192.168.10.7 ssn 123-45-6789 done",
    )
    assert r.text_clean == "mail [EMAIL] call [PHONE] from [IPV4] ssn [SSN] done"
    assert (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4) == (1, 1, 1, 1)


def test_ssn_wins_over_phone_shape(spark):
    """Declaration order: the SSN pattern runs before phone, so a
    123-45-6789 string lands as [SSN] even though digits-with-dashes is
    phone-adjacent territory."""
    r = _scrub_one(spark, "id 999-88-7777 end")
    assert r.text_clean == "id [SSN] end"


def test_clean_text_untouched_and_counts_zero(spark):
    text = "no personal data here just words and numbers like 42"
    r = _scrub_one(spark, text)
    assert r.text_clean == text
    assert (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4) == (0, 0, 0, 0)


def test_multiple_matches_all_replaced_and_counted(spark):
    r = _scrub_one(spark, "a@b.co then c@d.org then 10.0.0.1 and 10.0.0.2")
    assert r.text_clean == "[EMAIL] then [EMAIL] then [IPV4] and [IPV4]"
    assert r.n_email == 2 and r.n_ipv4 == 2


def test_custom_patterns_and_token(spark):
    df = spark.createDataFrame([("key sk-abcdef1234 here",)], "text string")
    out = df.select(
        redact_pii("text", patterns={"apikey": r"sk-[A-Za-z0-9]{10}"}, token="<{kind}>").alias("t")
    ).collect()[0].t
    assert out == "key <APIKEY> here"
    counts = pii_counts("text", patterns={"apikey": r"sk-[A-Za-z0-9]{10}"})
    [row] = df.select(*[c.alias(n) for n, c in counts.items()]).collect()
    assert row.n_apikey == 1


def test_pseudonymize_consistent_oneway_and_null_safe(spark):
    import hashlib

    from alaska_etl_spark.operators.redact import pseudonymize

    df = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9), (4, None)], "row_id bigint, user_id bigint"
    )
    out = {r.row_id: r.user_id for r in pseudonymize(df, ["user_id"], salt="s1").collect()}
    # same input -> same pseudonym; distinct inputs -> distinct
    assert out[1] == out[2] != out[3]
    assert out[4] is None
    # matches the documented construction exactly
    want = hashlib.sha256(b"s1:7").hexdigest()[:16]
    assert out[1] == want
    # a different salt re-keys everything
    out2 = {r.row_id: r.user_id for r in pseudonymize(df, ["user_id"], salt="s2").collect()}
    assert out2[1] != out[1] and out2[1] == out2[2]


def test_pseudonymize_preserves_joins_across_tables(spark):
    from alaska_etl_spark.operators.redact import pseudonymize

    a = spark.createDataFrame([(7, "x"), (9, "y")], "user_id bigint, a string")
    b = spark.createDataFrame([(7, 10.0), (7, 20.0), (8, 5.0)], "user_id bigint, v double")
    pa = pseudonymize(a, ["user_id"], salt="k")
    pb = pseudonymize(b, ["user_id"], salt="k")
    joined = pa.join(pb, "user_id")
    assert joined.count() == a.join(b, "user_id").count() == 2


def test_k_anonymity_audit_counts_violations(spark):
    from alaska_etl_spark.operators.redact import k_anonymity_audit

    # groups: A->4 rows, B->2 rows, C->1 row (singleton)
    rows = [("A",)] * 4 + [("B",)] * 2 + [("C",)]
    df = spark.createDataFrame(rows, "qi string")
    out = {r.k: r for r in k_anonymity_audit(df, ["qi"], ks=(2, 3, 5)).collect()}
    for k in (2, 3, 5):
        assert (out[k].n_rows, out[k].n_groups, out[k].k_anonymity) == (7, 3, 1)
    assert (out[2].groups_below, out[2].rows_below) == (1, 1)
    assert (out[3].groups_below, out[3].rows_below) == (2, 3)
    assert (out[5].groups_below, out[5].rows_below) == (3, 7)
    # basis points: round_half_up(10000 * 3/7) = 4286
    assert out[3].rows_below_bp == 4286
    assert out[5].rows_below_bp == 10000


def test_k_anonymity_audit_fully_anonymous(spark):
    from alaska_etl_spark.operators.redact import k_anonymity_audit

    rows = [(g,) for g in ("x", "y") for _ in range(5)]
    df = spark.createDataFrame(rows, "qi string")
    out = {r.k: r for r in k_anonymity_audit(df, ["qi"], ks=(2, 5)).collect()}
    assert out[2].k_anonymity == 5 and out[2].groups_below == 0
    assert out[5].groups_below == 0 and out[5].rows_below_bp == 0


def test_k_anonymity_audit_multi_column_qi(spark):
    from alaska_etl_spark.operators.redact import k_anonymity_audit
    from pyspark.sql import functions as F

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 1)]
    df = spark.createDataFrame(rows, "seg string, nat int")
    out = {
        r.k: r
        for r in k_anonymity_audit(df, ["seg", F.col("nat")], ks=(2,)).collect()
    }
    # groups (a,1)=2, (a,2)=1, (b,1)=1
    assert (out[2].n_groups, out[2].groups_below, out[2].rows_below) == (3, 2, 2)
