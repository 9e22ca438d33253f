"""PII detection/redaction for training-data pipelines: emails, phone
numbers, IPv4 addresses, SSN-shaped ids → typed placeholder tokens,
plus per-kind match counts for corpus auditing.

Pure ``regexp_replace``/``regexp_extract_all`` expressions — the whole
scrub runs inside whole-stage codegen, no Python in the hot path, and
the patterns are RE2-compatible (no lookaround) so the same rules run
identically in other engines (the q37_pii_scrub DuckDB oracle runs them
verbatim and hash-matches the redacted text; unit coverage in
tests/test_redact.py).

This extends the reference's cleaning surface (regex column hygiene,
nws_dag.py:88-92 / SURVEY §2.9 F10-F14) from column *names* to content
scrubbing — the op every LLM-data pipeline runs before training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alaska_etl_spark.functions.localrel import local_df

#: ordered — earlier patterns must not leave fragments later ones match.
#: RE2-safe (no lookaround/backrefs): portable across Spark (Java regex)
#: and RE2 engines.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\d{0,2}[-. ]?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(
    col: Column | str,
    *,
    patterns: dict[str, str] | None = None,
    token: str = "[{kind}]",
) -> Column:
    """Replace every PII match with its kind token (``[EMAIL]`` etc.),
    applying patterns in declaration order."""
    out = _c(col)
    for kind, pat in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pat, token.format(kind=kind.upper()))
    return out


def pii_counts(col: Column | str, *, patterns: dict[str, str] | None = None) -> dict[str, Column]:
    """Per-kind match-count columns (audit metrics). NOTE: counts are
    per-pattern on the ORIGINAL text, so overlapping kinds (an SSN also
    shaped like a phone fragment) may count twice — redaction order, not
    the counts, decides what the output text shows."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(_c(col), F.lit(pat), F.lit(0)))
        for kind, pat in (patterns or PII_PATTERNS).items()
    }


def scrub_documents(
    df: DataFrame, text_col: str = "text", *, out_col: str = "text_clean"
) -> DataFrame:
    """Attach the redacted text and the per-kind counts."""
    out = df.withColumn(out_col, redact_pii(text_col))
    for name, expr in pii_counts(text_col).items():
        out = out.withColumn(name, expr)
    return out


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    *,
    salt: str,
    digest_chars: int = 16,
) -> DataFrame:
    """Keyed deterministic pseudonymization of identifier columns —
    the privacy step between raw facts and a shared warehouse: each
    listed column is replaced by the first ``digest_chars`` hex chars
    of SHA-256 over ``salt:value``, so (a) the mapping is one-way
    without the salt, (b) the SAME value maps to the SAME pseudonym in
    EVERY table processed with that salt — joins, distinct counts, and
    sessionization keep working on the pseudonymized warehouse — and
    (c) rotating the salt re-keys the entire corpus (the
    right-to-be-forgotten lever: drop the old salt and old pseudonyms
    become unlinkable).

    Pure codegen projection (sha2 is a JVM expression — no UDF, no
    shuffle, no state); engine-portable because SHA-256 is SHA-256
    everywhere (the md5-lane argument, standardized). Truncation to
    64 bits keeps pseudonyms join-cheap; collision expectation
    n²/2⁶⁵ — negligible below ~10⁹ distinct ids, widen
    ``digest_chars`` beyond.

    NULL ids stay NULL (a pseudonym for "unknown" would *create* a
    linkable cohort).
    """
    out = df
    for c in cols:
        digest = F.sha2(
            F.concat_ws(":", F.lit(salt), F.col(c).cast("string")), 256
        )
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNull(), F.lit(None).cast("string")
            ).otherwise(F.substring(digest, 1, digest_chars)),
        )
    return out


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[Column | str],
    ks: tuple[int, ...] = (2, 5, 10),
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney
    '02): a release is k-anonymous iff every QI group contains at
    least k rows — singleton groups re-identify individuals even after
    direct identifiers are pseudonymized (the audit that belongs next
    to :func:`pseudonymize`, which hides WHO but not HOW UNIQUE).

    One shuffle total: ``groupBy(QI).count`` reduces to group sizes,
    a second groupBy collapses sizes to a size histogram (at most
    |distinct sizes| rows — tiny), and the per-k report is conditional
    aggregation of the histogram against an inline k frame. Nothing
    after the first aggregate touches row-scale data.

    Returns one row per k: ``(k, n_rows, n_groups, k_anonymity,
    groups_below, rows_below, rows_below_bp)`` — k_anonymity is the
    minimum group size (the largest k the release satisfies);
    rows_below_bp is basis points of rows in violating groups
    (round-half-up, exact integers end-to-end).
    """
    from alaska_etl_spark.functions.fixedpoint import div_half_up

    cols = [F.col(c) if isinstance(c, str) else c for c in qi_cols]
    sizes = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_sz"))
    hist = sizes.groupBy("_sz").agg(F.count(F.lit(1)).cast("bigint").alias("_ng"))
    spark = df.sparkSession
    kf = local_df(spark, [(int(k),) for k in ks], "k bigint")
    return (
        hist.crossJoin(F.broadcast(kf))
        .groupBy("k")
        .agg(
            F.sum(F.col("_sz") * F.col("_ng")).cast("bigint").alias("n_rows"),
            F.sum("_ng").cast("bigint").alias("n_groups"),
            F.min("_sz").cast("bigint").alias("k_anonymity"),
            F.sum(F.when(F.col("_sz") < F.col("k"), F.col("_ng")).otherwise(0))
            .cast("bigint")
            .alias("groups_below"),
            F.sum(
                F.when(F.col("_sz") < F.col("k"), F.col("_sz") * F.col("_ng")).otherwise(0)
            )
            .cast("bigint")
            .alias("rows_below"),
        )
        .select(
            "k",
            "n_rows",
            "n_groups",
            "k_anonymity",
            "groups_below",
            "rows_below",
            div_half_up("rows_below", "n_rows", 10000).alias("rows_below_bp"),
        )
    )
