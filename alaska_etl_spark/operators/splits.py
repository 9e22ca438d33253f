"""Deterministic dataset splitting, sampling, and mixing.

The tail of a training-data pipeline: after dedup and quality filtering,
rows are assigned to train/val/test and sources are mixed by ratio. At
100 TB both must be (a) driven by a hash of a stable key — never by
position, partition, or RNG state, so any rerun, engine, or subset of
the data reproduces the same assignment — and (b) pure narrow
projections: no shuffle, no sample() with seeds that depend on
partitioning, no driver-side coin flips.

Assignment is an affine hash in the 2^31-1 Mersenne field (the same
ANSI-safe family as the MinHash parameters in ``operators.dedup``): integer
arithmetic only, so the identical expression runs in any engine — each
function has a ``*_sql`` twin emitted from the same spec (the
:mod:`~alaska_etl_spark.operators.layout` pattern) and the DuckDB oracle
replays assignments bit-for-bit.

Keys must be integral (stable row/document ids). Splitting on a GROUP
key (e.g. the ``keep_id``/component from dedup) keeps near-duplicate
families on one side of the train/test boundary — assign the split to
the group, then join it back to members.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from alaska_etl_spark.functions.fixedpoint import div_half_up

_MERSENNE = (1 << 31) - 1  # 31-bit prime: a*k+b stays < 2^63 (ANSI-safe)
_MASK31 = (1 << 31) - 1
_BUCKETS = 1_000_000


def _affine(seed: int) -> tuple[int, int]:
    """Deterministic 31-bit (a, b) for the bucket hash, derived from the
    seed by splitmix-style integer mixing (engine-independent: evaluated
    in Python at plan time; only the resulting literals reach the SQL).
    31-bit params × 31-bit reduced keys never overflow int64 — the same
    ANSI-mode contract as the MinHash family in ``operators.dedup``."""
    x = (seed * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9) & ((1 << 63) - 1)
    a = ((x >> 16) & _MASK31) or 1
    b = ((x * 0x94D049BB133111EB) >> 16) & _MASK31
    return a, b


def hash_bucket(key: Column | str, *, seed: int = 0) -> Column:
    """Uniform bucket in [0, 1e6) from a NON-NEGATIVE integral key
    (stable ids): reduce to 31 bits, one multiply, add, two mods —
    whole-stage codegen, no shuffle."""
    a, b = _affine(seed)
    k = (F.col(key) if isinstance(key, str) else key).cast("bigint") % F.lit(1 << 31)
    return ((F.lit(a) * k + F.lit(b)) % F.lit(_MERSENNE)) % F.lit(_BUCKETS)


def hash_bucket_sql(key: str, *, seed: int = 0) -> str:
    """The identical bucket arithmetic as ANSI SQL."""
    a, b = _affine(seed)
    return f"((({a} * ({key} % {1 << 31}) + {b}) % {_MERSENNE}) % {_BUCKETS})"


def hash_split(
    df: DataFrame,
    key_col: str,
    *,
    weights: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with probabilities ``weights``
    (must sum to 1). Same key + seed → same split, forever, on any
    engine and any subset of the rows."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(key_col, seed=seed)
    expr = None
    hi = 0.0
    names = list(weights)
    for name in names[:-1]:
        hi += weights[name]
        cond = bucket < int(round(hi * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def hash_split_sql(key: str, *, weights: dict[str, float], seed: int = 0) -> str:
    """The identical split CASE expression as ANSI SQL."""
    bucket = hash_bucket_sql(key, seed=seed)
    names = list(weights)
    parts = ["CASE"]
    hi = 0.0
    for name in names[:-1]:
        hi += weights[name]
        parts.append(f"WHEN {bucket} < {int(round(hi * _BUCKETS))} THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)


def hash_sample(df: DataFrame, key_col: str, rate: float, *, seed: int = 0) -> DataFrame:
    """Deterministic ``rate``-fraction sample: keep rows whose bucket
    falls under the threshold. Unlike ``DataFrame.sample`` the result is
    a pure filter — partitioning-independent, rerun-stable, pushed into
    the scan — and samples drawn with different seeds are independent;
    with the SAME seed a 10% sample is a subset of a 20% one (nested
    sampling, the property curriculum schedules rely on)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(hash_bucket(key_col, seed=seed) < int(round(rate * _BUCKETS)))


def hash_sample_sql(key: str, rate: float, *, seed: int = 0) -> str:
    """The identical sample predicate as ANSI SQL."""
    return f"({hash_bucket_sql(key, seed=seed)} < {int(round(rate * _BUCKETS))})"


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_per_stratum: int,
    *,
    seed: int = 0,
) -> DataFrame:
    """Exact per-stratum quota sample: the ``n_per_stratum`` rows with
    the smallest (hash_bucket(key), key) in every stratum — uniform
    within the stratum because the hash is uniform, EXACT in count
    (unlike rate-based sampling, which only hits quotas in
    expectation), and deterministic: same keys + seed → same sample on
    any engine (``*_sql`` twin replays it), any partitioning, any
    subset ordering. Strata smaller than the quota keep all rows.

    Plan: one shuffle on the strata columns; the quota is a per-group
    top-n (rank + filter), so map-side partial sort + AQE handle a
    skewed stratum the same way any top-n does. For quotas ≪ stratum
    size, pre-filtering with ``hash_sample`` at a safely-oversized rate
    bounds the sort input (two narrow passes; same result because both
    phases order by the same hash).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(key_col, seed=seed), F.col(key_col)
    )
    return (
        df.withColumn("_ss_rn", F.row_number().over(w))
        .filter(F.col("_ss_rn") <= n_per_stratum)
        .drop("_ss_rn")
    )


def stratified_sample_sql(
    table: str, strata_cols: list[str], key: str, n_per_stratum: int, *, seed: int = 0
) -> str:
    """The identical quota sample as ANSI SQL (QUALIFY form)."""
    strata = ", ".join(strata_cols)
    return (
        f"SELECT * FROM {table} QUALIFY row_number() OVER ("
        f"PARTITION BY {strata} ORDER BY {hash_bucket_sql(key, seed=seed)}, {key}"
        f") <= {n_per_stratum}"
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    len_col: str,
    *,
    budget: int,
    n_shards: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Sequence packing (concat-then-chunk): assign every document a
    deterministic shard, a pseudo-random order within it, and a byte/
    token OFFSET in the shard's concatenated stream; ``seq_idx =
    start_offset div budget`` is the fixed-size training sequence its first
    token lands in. Consumers lay documents end-to-end and cut every
    ``budget`` tokens — the standard way to feed variable-length docs to
    fixed-window training without per-example padding waste.

    Returns (key, shard, start_offset, seq_idx).

    Scale shape: sharding and ordering are hash projections (narrow);
    the prefix sum is ONE window per shard — the only shuffle, keyed by
    shard, each partition ~corpus/n_shards. The order inside a shard is
    the hash, not arrival: reruns, subsets, and engines all reproduce
    identical offsets (the :func:`hash_bucket` determinism contract),
    which is what makes checkpoint-resume of a data loader possible.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import Window

    shard = hash_bucket(key_col, seed=seed) % F.lit(n_shards)
    order = hash_bucket(key_col, seed=seed + 1)
    k = F.col(key_col)
    base = df.select(
        k,
        F.col(len_col).cast("bigint").alias("_len"),
        shard.alias("shard"),
        order.alias("_ord"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_ord"), k)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        key_col,
        "shard",
        (F.sum("_len").over(w) - F.col("_len")).alias("start_offset"),
        F.floor((F.sum("_len").over(w) - F.col("_len")) / F.lit(budget))
        .cast("bigint")
        .alias("seq_idx"),
    )


def pack_sequences_sql(
    key: str, len_expr: str, *, budget: int, n_shards: int = 1024, seed: int = 0, table: str = "documents"
) -> str:
    """The identical packing computation as ANSI SQL (window prefix sum
    over the same hash shard/order)."""
    shard = f"({hash_bucket_sql(key, seed=seed)} % {n_shards})"
    order = hash_bucket_sql(key, seed=seed + 1)
    return f"""
WITH base AS (
  SELECT {key}, CAST({len_expr} AS BIGINT) AS _len,
         {shard} AS shard, {order} AS _ord
  FROM {table}
), packed AS (
  SELECT {key}, shard,
         CAST(sum(_len) OVER (PARTITION BY shard ORDER BY _ord, {key}
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - _len AS BIGINT) AS start_offset
  FROM base
)
SELECT {key}, shard, start_offset, CAST(floor(start_offset / {budget}) AS BIGINT) AS seq_idx FROM packed
"""


def mix_sources(
    sources: list[tuple[DataFrame, float]],
    key_col: str,
    *,
    seed: int = 0,
    source_col: str | None = "source_idx",
) -> DataFrame:
    """Mix corpora by per-source sampling rates (the data-mixture step:
    e.g. 100% curated + 30% web). Each source is hash-sampled with a
    source-specific seed offset, tagged, and unioned by name — all
    narrow ops; the union is a plan-level concatenation, not a shuffle."""
    parts = []
    for i, (df, rate) in enumerate(sources):
        part = hash_sample(df, key_col, rate, seed=seed + i)
        if source_col is not None:
            part = part.withColumn(source_col, F.lit(i))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mix_entropy(
    df: DataFrame,
    group_col: str,
    *,
    weight_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Diversity diagnostics of a corpus mix: per-group share, Shannon
    entropy contribution, and KL(actual ‖ uniform) contribution, plus
    the totals every row carries — the number a data-mixture review
    reads before/after reweighting (q69/qc1 change the mix; this
    measures it).

    ``weight_col=None`` weights by row count; otherwise by
    ``sum(weight_col)`` (e.g. chars or tokens, the usual LLM-mix unit).

    Plan: one hash aggregate to |groups| rows, then unpartitioned
    window sums over those |groups| rows only (tens of sources — the
    raw table is never in the window), all codegen arithmetic. Natural
    log in both engines; rounded once at emit for hash-stable floats.
    """
    w = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    g = df.groupBy(F.col(group_col).alias("grp")).agg(w.cast("double").alias("wt"))
    # zero-weight groups are EXCLUDED (they carry no mass, and p=0 terms
    # diverge across engines: Spark ln(0) → NULL poisons the totals,
    # DuckDB 0*-inf → NaN); k below counts only surviving groups, in
    # both this operator and the qc9 oracle (ADVICE r4)
    g = g.filter(F.col("wt") > 0)
    from pyspark.sql import Window

    wall = Window.partitionBy()
    p = F.col("wt") / F.sum("wt").over(wall)
    k = F.count(F.lit(1)).over(wall)
    out = g.select(
        F.col("grp").alias(group_col),
        F.col("wt").cast("bigint").alias("weight"),
        p.alias("_p"),
        (-p * F.log(p)).alias("_h"),
        (p * F.log(p * k)).alias("_kl"),
    )
    wtot = Window.partitionBy()
    return out.select(
        group_col,
        "weight",
        F.round("_p", round_digits).alias("share"),
        F.round("_h", round_digits).alias("entropy_term"),
        F.round(F.sum("_h").over(wtot), round_digits).alias("entropy_total"),
        F.round(F.sum("_kl").over(wtot), round_digits).alias("kl_vs_uniform"),
    ).orderBy(group_col)


def top_p_coverage(
    df: DataFrame,
    *,
    strata_cols: list[str],
    group_col: str,
    weight_col: str,
    p: float,
) -> DataFrame:
    """Nucleus (top-p) coverage per stratum: the smallest prefix of
    groups — ranked by weight descending, name ascending on ties — whose
    cumulative share reaches ``p``, with each kept group's share and
    running total. The "which sources make up 90% of the tokens per
    language" cut that decides what a mix actually contains.

    Plan: one hash aggregate to |strata × groups| rows, then two
    frames over ONE per-stratum sort (cumulative sum + total — Spark
    plans a single Exchange+Sort for both). The keep rule is
    ``cum_share − share < p``: every group before the crossing point,
    plus the group that crosses it.
    """
    from pyspark.sql import Window

    g = df.groupBy(*strata_cols, group_col).agg(
        F.sum(weight_col).cast("double").alias("wt")
    )
    order = [F.col("wt").desc(), F.col(group_col).asc()]
    wcum = Window.partitionBy(*strata_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy(*strata_cols)
    ranked = g.select(
        *strata_cols,
        group_col,
        F.col("wt"),
        F.row_number().over(Window.partitionBy(*strata_cols).orderBy(*order)).alias("rank"),
        (F.sum("wt").over(wcum) / F.sum("wt").over(wtot)).alias("_cum"),
        (F.col("wt") / F.sum("wt").over(wtot)).alias("_share"),
    )
    return ranked.filter(F.col("_cum") - F.col("_share") < F.lit(p)).select(
        *strata_cols,
        group_col,
        F.col("wt").cast("bigint").alias("weight"),
        "rank",
        F.round("_share", 6).alias("share"),
        F.round("_cum", 6).alias("cum_share"),
    )


def _es_key(key: Column | str, weight: Column | str, *, seed: int) -> Column:
    """Efraimidis-Spirakis priority u^(1/w): u is the deterministic
    uniform (hash_bucket + 0.5)/1e6 — never an RNG, so the sample is
    rerun/engine/partitioning-stable like every assignment here."""
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (hash_bucket(key, seed=seed).cast("double") + F.lit(0.5)) / F.lit(
        float(_BUCKETS)
    )
    return F.pow(u, F.lit(1.0) / w)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    *,
    seed: int = 0,
) -> DataFrame:
    """Fixed-size weight-proportional sample WITHOUT replacement: the
    ``n`` rows with the largest Efraimidis-Spirakis priority u^(1/w)
    (Efraimidis & Spirakis 2006 — inclusion probability proportional to
    weight, exactly the A-Res scheme), with u derived from
    :func:`hash_bucket`, so the same keys + weights + seed reproduce
    the same sample on any engine, partitioning, or subset order.

    Plan shape: a narrow priority projection + ``TakeOrderedAndProject``
    (per-partition top-n heaps merged on one reducer — n rows, not a
    global sort). Rows with weight ≤ 0 or NULL are excluded, as in the
    paper. Ties (identical hash AND weight) break on the key.

    The priority is IEEE double pow: engines may differ in the last
    ulp, which can only permute rows whose priorities are within an
    ulp — keys carry ~1e6 distinct uniforms, so in practice never; the
    DuckDB twin (:func:`weighted_sample_order_sql`) replays the exact
    sample (qa8)."""
    w = F.col(weight_col)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .orderBy(_es_key(key_col, weight_col, seed=seed).desc(), F.col(key_col))
        .limit(n)
    )


def weighted_sample_order_sql(key: str, weight: str, *, seed: int = 0) -> str:
    """The identical priority expression as ANSI SQL (use in
    ``ORDER BY ... DESC, <key> LIMIT n`` with a ``WHERE {weight} > 0``
    guard)."""
    return f"pow(({hash_bucket_sql(key, seed=seed)} + 0.5) / {float(_BUCKETS)}, 1.0 / {weight})"


def temperature_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    *,
    alpha: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-LM mixing
    rule: sample source i with probability ∝ nᵢ^α, α < 1 flattening the
    head): keep each row of source i with rate

        rᵢ = (nᵢ / n_min)^(α−1)

    normalized by the SMALLEST source, which keeps 100% (n^(α−1) is
    decreasing for α ≤ 1, so larger sources are down-sampled harder
    and every rᵢ ≤ 1).

    Everything is in-plan: per-source counts (one aggregate), the max
    via a one-row broadcast join — never a window over an unpartitioned
    frame — and the keep-decision is the :func:`hash_bucket` threshold
    compare, so the sample is deterministic per (key, seed) and
    engine-replayable: rates are pow() on exact integer counts
    (bit-identical IEEE in any engine) and the threshold is
    ``floor(rate·1e6 + 0.5)`` — floor, because SQL round() ties differ
    by engine (half-up vs half-even) while floor does not (qc1).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    mn = counts.agg(F.min("_n").alias("_nmin"))
    thresholds = counts.join(F.broadcast(mn)).select(
        source_col,
        F.floor(
            F.pow(F.col("_n").cast("double") / F.col("_nmin").cast("double"), alpha - 1.0)
            * F.lit(float(_BUCKETS))
            + F.lit(0.5)
        ).alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(hash_bucket(key_col, seed=seed) < F.col("_thr"))
        .drop("_thr")
    )


def temperature_sample_sql(
    table: str, source_col: str, key_col: str, *, alpha: float = 0.5, seed: int = 0
) -> str:
    """The identical rebalancing as ANSI SQL, emitted from the same
    spec."""
    return f"""
WITH counts AS (
  SELECT {source_col}, count(*) AS n FROM {table} GROUP BY 1
), thr AS (
  SELECT {source_col},
         floor(pow(CAST(n AS DOUBLE) / (SELECT CAST(min(n) AS DOUBLE) FROM counts), {alpha - 1.0})
               * {float(_BUCKETS)} + 0.5) AS t
  FROM counts
)
SELECT d.* FROM {table} d JOIN thr USING ({source_col})
WHERE {hash_bucket_sql(key_col, seed=seed)} < thr.t
"""


def split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    weights: dict[str, float],
    seed: int = 0,
    n: int = 1,
    tau_num: int = 1,
    tau_den: int = 2,
    max_id: int | None = None,
) -> DataFrame:
    """Split-leakage audit: near-duplicate pairs that STRADDLE the
    hash-split boundary — (id_a, split_a, id_b, split_b, jaccard) for
    every pair with n-gram-set Jaccard ≥ tau_num/tau_den whose members
    landed in different splits. Exact-duplicate decontamination (q71)
    misses these: a validation example with a 60%-overlapping training
    near-twin still leaks signal, and this report is what a curation
    pipeline reviews (drop the val member, or re-seed) before trusting
    eval numbers.

    Integer-exact end-to-end (the q26 protocol): the threshold compares
    tau_den·|∩| ≥ tau_num·|∪| and jaccard emits via integer
    round-half-up scaling, so the report hash-matches in any engine.
    Bounded O(k²) verifier shape — at corpus scale feed it the LSH
    candidate pairs (minhash_near_dup_pairs) instead of the cross join,
    exactly as q26 stands to q29.
    """
    from alaska_etl_spark.operators.dedup import shingles

    base = df.select(F.col(id_col).alias("_id"), shingles(text_col, n).alias("_sh"))
    if max_id is not None:
        base = base.filter(F.col("_id") < max_id)
    # zero-token docs carry no content to leak and would hit the 0/0
    # jaccard (shingles() returns [] for them; ADVICE r4) — drop them
    # here and in the qe4 oracle alike
    base = base.filter(F.size("_sh") > 0)
    assigned = hash_split(base, "_id", weights=weights, seed=seed, split_col="_sp")
    a = assigned.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"), F.col("_sp").alias("split_a")
    )
    b = assigned.select(
        F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"), F.col("_sp").alias("split_b")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            "id_a",
            "split_a",
            "id_b",
            "split_b",
            F.size(F.array_intersect("_sh_a", "_sh_b")).cast("bigint").alias("_p"),
            F.size(F.array_union("_sh_a", "_sh_b")).cast("bigint").alias("_q"),
        )
        .filter(F.lit(tau_den) * F.col("_p") >= F.lit(tau_num) * F.col("_q"))
        .select(
            "id_a",
            "split_a",
            "id_b",
            "split_b",
            (div_half_up("_p", "_q", 10000) / F.lit(10000.0)).alias("jaccard"),
        )
    )


def target_encode_oof(
    df: DataFrame,
    id_col: str,
    cat_col: str,
    label_col: str,
    *,
    n_folds: int = 5,
    seed: int = 7,
    smoothing: int = 20,
) -> DataFrame:
    """Out-of-fold target (mean) encoding with additive smoothing — the
    leakage-safe form of the classic high-cardinality categorical
    feature (Micci-Barreca '01): each row's encoding uses only label
    mass from OTHER folds, so the feature never memorizes the row's
    own label (the same leakage discipline as :func:`split_leakage`,
    applied to feature construction instead of split audit).

    ``enc = (S_oof + m·μ_global) / (n_oof + m)`` with smoothing m —
    computed entirely in integers by multiplying through by the global
    count: ``num = S_oof·G_n + m·G_s``, ``den = (n_oof + m)·G_n``
    (cents; bound: |S_oof·G_n| needs label_sum·rows < 2^63 — holds to
    ~10^9 rows of 10^5-cent labels; beyond that pre-scale the cents).
    Categories entirely inside one fold degrade gracefully to the
    global prior (n_oof = 0 ⇒ num/den = G_s/G_n).

    Folds are the engine's deterministic 31-bit affine hash of the id
    (:func:`hash_bucket` mod n_folds) — reproducible across engines
    and runs, no stored fold table. Plan: one groupBy to (cat, fold)
    grain, a per-cat window over that REDUCED frame, one 1-row global
    aggregate broadcast in, and a broadcast join back to rows — the
    fact table is scanned twice and shuffled never (the encode join
    is map-side).

    Returns one row per input row: ``(id, cat, fold, n_oof, enc)``
    with enc = smoothed OOF mean in cents at 4dp (round-half-up).
    """
    from pyspark.sql import Window

    from alaska_etl_spark.functions.fixedpoint import div_half_up

    m = int(smoothing)
    fold = (hash_bucket(id_col, seed=seed) % F.lit(n_folds)).cast("bigint")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(cat_col).alias("cat"),
        fold.alias("fold"),
        F.round(F.col(label_col) * 100).cast("bigint").alias("_c"),
    )
    cf = base.groupBy("cat", "fold").agg(
        F.sum("_c").cast("bigint").alias("_s_cf"),
        F.count(F.lit(1)).cast("bigint").alias("_n_cf"),
    )
    w = Window.partitionBy("cat")
    ct = cf.select(
        "cat",
        "fold",
        "_s_cf",
        "_n_cf",
        F.sum("_s_cf").over(w).cast("bigint").alias("_s_c"),
        F.sum("_n_cf").over(w).cast("bigint").alias("_n_c"),
    )
    g = base.agg(
        F.sum("_c").cast("bigint").alias("_gs"),
        F.count(F.lit(1)).cast("bigint").alias("_gn"),
    )
    enc = (
        ct.crossJoin(F.broadcast(g))
        .select(
            "cat",
            "fold",
            (F.col("_n_c") - F.col("_n_cf")).alias("n_oof"),
            (
                (F.col("_s_c") - F.col("_s_cf")) * F.col("_gn")
                + F.lit(m) * F.col("_gs")
            ).alias("_num"),
            ((F.col("_n_c") - F.col("_n_cf") + F.lit(m)) * F.col("_gn")).alias(
                "_den"
            ),
        )
        .select(
            "cat",
            "fold",
            "n_oof",
            (div_half_up("_num", "_den", 10000) / 10000.0).alias("enc"),
        )
    )
    return base.select("id", "cat", "fold").join(
        F.broadcast(enc), on=["cat", "fold"], how="inner"
    ).select("id", "cat", "fold", "n_oof", "enc")


def mixture_report(
    df: DataFrame,
    source_col: str,
    text_col: str,
    *,
    bp_scale: int = 10**4,
) -> DataFrame:
    """Static source-mixture report — the dataset-card table that feeds
    :func:`mix_sources` its rates: per source, document/token mass
    AFTER exact dedup (fingerprint keep-one: duplicated content should
    not buy a source mixing weight), mean quality, and a suggested
    weight = this source's share of quality-weighted unique tokens
    (the DoReMi-lite static heuristic: reweight by how much GOOD,
    NON-REDUNDANT text a source actually contributes — the two
    corrections raw token counts get wrong).

    Everything is exact integers: the quality score is a sum of four
    indicator quarters, so per-doc ``quarters = round(4·q) ∈ {0..4}``
    is exact, quality-weighted token mass is a BIGINT product, and the
    shares are 4dp round-half-up basis points. Dedup keeps the
    smallest-fingerprint... rather, ONE row per fingerprint via a
    min-aggregate over (fingerprint): token counts are identical
    across same-fingerprint duplicates by construction, and the
    quality quarters differ only through raw-whitespace edge cases —
    min() makes the representative deterministic and SQL-replayable
    either way.

    Shape: one scan computes (source, fingerprint, tokens, quarters);
    one (source, fingerprint) min-aggregate collapses within-source
    duplicates; cross-source duplicates are attributed to the smallest
    source id holding them (deterministic) via one fingerprint-grain
    aggregate; one final per-source aggregate + a broadcast total.
    Returns (source, n_docs, n_unique_docs, unique_tokens, quality_bp,
    weight_bp) ordered by source."""
    from alaska_etl_spark.functions.fixedpoint import div_half_up
    from alaska_etl_spark.operators.text import (
        doc_fingerprint,
        quality_score,
        token_count,
    )

    base = df.select(
        F.col(source_col).alias("_src"),
        doc_fingerprint(text_col).alias("_fp"),
        token_count(text_col).cast("bigint").alias("_tok"),
        F.round(F.lit(4.0) * quality_score(text_col)).cast("long").alias("_q4"),
    )
    n_docs = base.groupBy("_src").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    # one row per fingerprint, attributed to the smallest source id:
    # content-derived columns are identical across duplicates
    owner = base.groupBy("_fp").agg(
        F.min("_src").alias("_src"),
        F.min("_tok").alias("_tok"),
        F.min("_q4").alias("_q4"),
    )
    per_src = owner.groupBy("_src").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unique_docs"),
        F.sum("_tok").cast("bigint").alias("unique_tokens"),
        F.sum("_q4").cast("bigint").alias("_quarters"),
        F.sum(F.col("_tok") * F.col("_q4")).cast("bigint").alias("_mass"),
    )
    total = per_src.agg(F.sum("_mass").cast("bigint").alias("_tmass"))
    return (
        n_docs.join(per_src, "_src", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("_src").alias(source_col),
            "n_docs",
            F.coalesce("n_unique_docs", F.lit(0)).cast("bigint").alias("n_unique_docs"),
            F.coalesce("unique_tokens", F.lit(0)).cast("bigint").alias("unique_tokens"),
            div_half_up(f"{bp_scale} * coalesce(_quarters, 0)",
                        "4 * greatest(n_unique_docs, 1)").alias("quality_bp"),
            div_half_up(f"{bp_scale} * coalesce(_mass, 0)",
                        "greatest(_tmass, 1)").alias("weight_bp"),
        )
        .orderBy(source_col)
    )


def token_waterfill(
    counts: DataFrame,
    source_col: str,
    count_col: str,
    *,
    budget_num: int,
    budget_den: int,
) -> DataFrame:
    """Exact water-filling token-budget allocation — the "cap the big
    sources, keep the small ones whole" mixing rule (the integer-exact
    core of temperature/DoReMi-style rebalancing): given per-source
    token counts and a budget = ⌊num·total/den⌋, sources below the
    water level keep everything and the rest are capped at a common
    level L (the r = remainder slots get L+1, assigned to the r
    SMALLEST capped sources in ascending (count, source) order —
    positions k+1..k+r of the ranking — so the split is deterministic
    and oracle-replayable).

    Exact by construction: with sources ascending, k = max i with
    P_i + (n−i)·c_i ≤ budget (P = prefix sum); L = (budget−P_k) div
    (n−k). Then c_k ≤ L < c_{k+1}, so capped allocations never exceed
    their counts and Σ allocations = budget exactly (when budget ≤
    total; otherwise everyone is full). All window passes run over the
    SOURCE-grain frame — dozens of rows, never the corpus; the corpus
    only pays the one count aggregate the caller provides.

    Returns (source_col, tokens_available, tokens_allocated, capped)
    ordered by source."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("_c"), F.col("_s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = counts.select(
        F.col(source_col).alias("_s"), F.col(count_col).cast("bigint").alias("_c")
    )
    ranked = base.select(
        "_s",
        "_c",
        F.row_number().over(Window.orderBy("_c", "_s")).alias("_i"),
        F.sum("_c").over(w).cast("bigint").alias("_P"),
    )
    staged = ranked.select(
        "*",
        F.count(F.lit(1)).over(wall).cast("bigint").alias("_n"),
        F.expr(f"({budget_num} * sum(_c) OVER ()) div {budget_den}")
        .cast("bigint")
        .alias("_budget"),
    ).select(
        "*",
        F.max(
            F.when(
                F.col("_P") + (F.col("_n") - F.col("_i")) * F.col("_c")
                <= F.col("_budget"),
                F.col("_i"),
            )
        )
        .over(wall)
        .alias("_k"),
    )
    staged = staged.select(
        "*",
        F.coalesce(
            F.max(F.when(F.col("_i") == F.col("_k"), F.col("_P"))).over(wall),
            F.lit(0),
        )
        .cast("bigint")
        .alias("_Pk"),
    )
    k = F.coalesce(F.col("_k"), F.lit(0))
    level = F.expr("CASE WHEN _n > coalesce(_k, 0) THEN "
                   "(_budget - _Pk) div (_n - coalesce(_k, 0)) END").cast("bigint")
    r = F.expr("CASE WHEN _n > coalesce(_k, 0) THEN "
               "(_budget - _Pk) % (_n - coalesce(_k, 0)) END").cast("bigint")
    alloc = F.when(F.col("_i") <= k, F.col("_c")).otherwise(
        F.least(
            F.col("_c"),
            level + F.when(F.col("_i") - k <= r, F.lit(1)).otherwise(F.lit(0)),
        )
    )
    return staged.select(
        F.col("_s").alias(source_col),
        F.col("_c").alias("tokens_available"),
        alloc.cast("bigint").alias("tokens_allocated"),
        (F.col("_i") > k).alias("capped"),
    ).orderBy(source_col)


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    *,
    n: int = 2,
    buckets: int = 4096,
    scale: int = 10**8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Hashed-n-gram importance weights for data selection — DSIR (Xie
    et al. '23, "Data Selection for Language Models via Importance
    Resampling"): estimate the target and raw feature distributions
    over ``buckets`` hashed word-n-gram buckets, then score every RAW
    document by its importance log-weight

        log ŵ(x) = Σ_b count_x(b) · ( ln((c_T(b)+1)/(N_T+B))
                                    − ln((c_R(b)+1)/(N_R+B)) )

    (add-1 smoothing over the B buckets on both sides). The published
    pipeline then resamples raw documents ∝ ŵ with Gumbel noise; this
    operator is the deterministic lane — it emits the exact quantized
    log-weight per raw document and leaves selection to the caller
    (rank by (weight, id) for deterministic top-K, or feed
    :func:`weighted_sample` for the hash-seeded stochastic form) —
    DECLARED BOUNDARY: Gumbel-noise resampling itself is not
    replicated; every published ablation in the paper also reports the
    top-K variant.

    Float discipline: the :func:`~alaska_etl_spark.operators.classifier.
    naive_bayes_scores` protocol exactly — each bucket's log-ratio is
    one JVM-libm double chain on integer-rational inputs, rounded
    half-away to ``1/scale`` units and stored BIGINT, so per-document
    scores are order-free integer sums and DuckDB replays them
    bit-for-bit (the ln-of-identical-rationals contract).

    Scale shape: one (bucket) aggregate whose output is ≤ ``buckets``
    rows regardless of corpus size (THE point of hashed features —
    DSIR's own reason for existing at web scale), one broadcast-sized
    terms join back onto the raw token stream, one doc-grain sum. The
    token stream is deliberately not persisted (the NB
    persist-vs-recompute finding). Zero-n-gram documents emit no row
    (no evidence). ``hash_fn='md5'`` is the engine-portable oracle
    lane; xxhash64 is the production default.

    Returns (``id_col``, weight_units BIGINT) for raw (non-target)
    documents, ordered by id."""
    from alaska_etl_spark.cache import tracked_persist
    from alaska_etl_spark.operators.dedup import md5_hash31, word_tokens

    tgt = F.col(target_col).cast("boolean")
    # occurrence-grain n-grams (NOT the dedup family's distinct
    # shingles): DSIR's feature vector is hashed n-gram COUNTS, so a
    # gram occurring twice counts twice; documents shorter than n
    # contribute their whole token string once (the shingles short-doc
    # convention), zero-token documents contribute nothing.
    toks_arr = word_tokens(text_col)
    k = F.greatest(F.size(toks_arr) - F.lit(n - 1), F.lit(1))
    seq = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks_arr, i + 1, n)),
    )
    gram = F.explode(F.when(F.size(toks_arr) > 0, seq))
    toks = df.select(F.col(id_col).alias("_id"), tgt.alias("_tgt"), gram.alias("_g"))
    if hash_fn == "md5":
        bcol = F.pmod(md5_hash31(F.col("_g")), F.lit(buckets))
    else:
        bcol = F.pmod(F.xxhash64(F.col("_g")), F.lit(buckets))
    toks = toks.select("_id", "_tgt", bcol.alias("_b"))
    counts = toks.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("bigint").alias("_ct"),
        F.sum(F.when(~F.col("_tgt"), 1).otherwise(0)).cast("bigint").alias("_cr"),
    )
    counts = tracked_persist(counts)
    tot = counts.agg(
        F.sum("_ct").alias("nt"), F.sum("_cr").alias("nr")
    ).collect()[0]
    nt, nr = int(tot["nt"] or 0), int(tot["nr"] or 0)
    term = (
        F.log(F.col("_ct") + 1)
        - F.log(F.lit(float(nt + buckets)))
        - F.log(F.col("_cr") + 1)
        + F.log(F.lit(float(nr + buckets)))
    )
    terms = counts.select(
        "_b", F.round(F.lit(scale) * term).cast("long").alias("_t")
    )
    return (
        toks.filter(~F.col("_tgt"))
        .join(terms, "_b")
        .groupBy("_id")
        .agg(F.sum("_t").cast("bigint").alias("weight_units"))
        .select(F.col("_id").alias(id_col), "weight_units")
        .orderBy(id_col)
    )
