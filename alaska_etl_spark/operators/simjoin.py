"""Exact all-pairs sparse-vector similarity join (cosine over word
n-gram counts) via a term-inverted index — the DISCO / "similarity
join" shape: never materialize |docs|² pairs; only documents that SHARE
a feature ever meet, and they meet on the feature's posting list.

Pipeline (all JVM-side, no UDFs):

1. ``ngram_tf`` — tokenize + n-gram explode (narrow) → one hash
   aggregate to (id, gram, tf). Raw counts, not distinct shingles:
   cosine weights need multiplicity (contrast ``dedup.shingles``).
2. Posting-list self-join on the gram with ``id_a < id_b`` — candidate
   pairs are Σ_g df(g)² over shared grams, not N². Discriminative
   features are what keep this sane: unigrams on a natural corpus have
   df≈N hot terms (the join degenerates); word n-grams (default n=3)
   have df in the single digits (measured on the test corpus: max df 7
   at 16k vocab).
3. One hash aggregate to per-pair dot products (exact integers), then
   two joins against the per-doc squared-norm table (corpus-grain, so
   hinted shuffle_hash unless the input scan proves it driver-safe to
   broadcast — operators/hints.py) and a single
   float op at the end:
   ``cosine = dot / sqrt(ssq_a * ssq_b)`` — one sqrt of an exact
   integer product, so engines agree bit-for-bit before rounding.

Scale levers at 100 TB:

- The candidate-pair bound Σ df(g)² is the whole cost model. ``max_df``
  drops grams with posting lists longer than the cap *before* the
  self-join — for near-duplicate thresholds this is the standard
  prefix-style pruning (a gram shared by thousands of documents
  contributes ~nothing to any pair's cosine but dominates the join);
  with it set the result is approximate-by-declaration (scores only
  lose mass, never gain — pairs can only drop below the threshold).
- Both sides of the self-join shuffle on the gram; a skewed posting
  list is exactly a skewed join key, so AQE's skew split applies.
- The final pair aggregate keys on (id_a, id_b) — uniform by
  construction (hash of two ids).

Reference parity: the reference has no similarity join; this is part
of the BASELINE.md training-data extension family (near-dup detection
beyond MinHash/SimHash: exact scores for the pairs that matter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alaska_etl_spark.cache import tracked_persist

from alaska_etl_spark.operators.dedup import word_tokens
from alaska_etl_spark.operators.hints import (
    broadcast_if_bounded,
    input_fits_driver,
    pin_corpus_agg,
)
from alaska_etl_spark.operators.parallelism import ensure_min_parallelism
from alaska_etl_spark.functions.fixedpoint import div_half_up

__all__ = [
    "ngram_tf",
    "cosine_similarity_join",
    "jaccard_similarity_join",
    "containment_join",
    "containment_spans",
    "edit_distance_join",
    "longest_shared_runs",
    "excise_spans",
]


def ngram_tf(df: DataFrame, id_col: str, text_col: str, *, n: int = 3) -> DataFrame:
    """(id, text) → (_id, _g, _tf): word n-gram term frequencies.
    Documents shorter than ``n`` tokens contribute their whole token
    string as one gram (empty text → the empty-string gram), matching
    ``dedup.shingles`` semantics but keeping counts. Narrow inputs are
    repartitioned so gram generation parallelizes
    (operators/parallelism.py; no-op at scale)."""
    df = ensure_min_parallelism(df, id_col)
    toks = word_tokens(text_col)
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(grams).alias("_g"))
        .groupBy("_id", "_g")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )


def cosine_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.2,
    round_digits: int = 4,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with n-gram-count cosine ≥ ``threshold``.

    Exact when ``max_df`` is None; with ``max_df`` set, grams whose
    document frequency exceeds it are pruned before the pair join
    (scores can only shrink — the 100 TB hot-feature lever).

    Returns (id_a, id_b, cosine) with cosine rounded for cross-engine
    reproducibility.
    """
    # conditional pin, evaluated on the RAW input (whose plan estimate
    # Catalyst gets right — file bytes), not on the aggregate (whose
    # estimate it gets wrong): operators/hints.py
    small = input_fits_driver(df)
    tf = ngram_tf(df, id_col, text_col, n=n)

    # join/aggregate on 8-byte gram hashes, not ~20-byte strings: the
    # pair join is the dominant cost (Σ df² rows) and the result only
    # needs ids — a 64-bit collision (≈|vocab|²/2⁶⁴, ~1e-8 here) would
    # merge two grams and be caught by the string-keyed SQL oracle.
    # PERSISTED: the feature table feeds norms, the optional df counts,
    # and BOTH sides of the self-join — unpersisted, the tokenize →
    # gram-explode → aggregate subtree would execute up to four times.
    feats = tracked_persist(tf.select("_id", F.xxhash64("_g").alias("_g"), "_tf"))
    # one-job barrier: norms, the optional df counts, and BOTH self-join
    # sides consume this cache from sibling stages of one job — unbuilt
    # cache partitions are recomputed per racing task (no cross-task
    # wait in BlockManager), so materialize once up front (r9).
    feats.count()
    # norms from the (pre-prune) features: hashing preserves rows, and
    # the norm must cover ALL grams even when max_df prunes join feats
    # corpus-grain: one row per document — shuffle_hash unless the
    # input proves it small (see _intersect_counts docstring)
    norms = pin_corpus_agg(
        feats.groupBy("_id").agg(F.sum(F.col("_tf") * F.col("_tf")).alias("_ssq")),
        small,
    )
    if max_df is not None:
        counts = pin_corpus_agg(  # vocab-grain
            feats.groupBy("_g").agg(F.count(F.lit(1)).alias("_df")), small
        )
        feats = feats.join(counts.filter(F.col("_df") <= max_df).select("_g"), "_g")

    # token-grain feature frame feeding the self-join: never a
    # broadcast side (AQE runtime demotion sizes by compressed shuffle
    # bytes — the q36 posting-frame OOM class, r8)
    join_feats = pin_corpus_agg(feats, small)
    a = join_feats.select(F.col("_id").alias("id_a"), "_g", F.col("_tf").alias("_tfa"))
    b = join_feats.select(F.col("_id").alias("id_b"), "_g", F.col("_tf").alias("_tfb"))
    dots = (
        a.join(b, "_g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_tfa") * F.col("_tfb")).alias("_dot"))
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("_ssq").alias("_ssq_a"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("_ssq").alias("_ssq_b"))
    cosine = F.round(
        F.col("_dot") / F.sqrt((F.col("_ssq_a") * F.col("_ssq_b")).cast("double")),
        round_digits,
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _materialize_together(frames: "list[DataFrame]") -> None:
    """Build several persisted frames' caches in ONE job: project each
    to its first column, union, count. Separate count() barriers cost
    one driver-scheduled job each (~0.15 s of plan+schedule latency at
    sf0.1); a union materializes every cache partition in parallel.
    Reading any column materializes the WHOLE cached partition, so the
    single-column projection loses nothing."""
    mats = [f.select(F.col(f.columns[0]).cast("string").alias("_m")) for f in frames]
    u = mats[0]
    for m in mats[1:]:
        u = u.unionByName(m)
    u.count()


def _intersect_counts(
    cand: DataFrame,
    tok: DataFrame,
    left: str,
    right: str,
    small: bool = False,
    materialize_with: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Exact |S_left ∩ S_right| per candidate pair, via per-document
    shingle-hash ARRAYS and one native ``array_intersect`` per pair —
    not the exploded (pair × token) join + re-aggregate it replaces:
    the verify then shuffles |cand| array-carrying rows instead of
    |cand|·|doc| skinny rows (~60× fewer rows for the same bytes at
    sf0.1 — measured 4.4 s → 3.4 s over q36's 235k candidates) and
    needs no groupBy. The arrays are doc-grain and flow straight out of
    the persisted ``tok`` table: built once, consumed once, never
    cached (SCALE.md "Persist-vs-recompute"). Shingle hashes are
    distinct per document (dedup.shingles), so the intersect size is
    the exact set overlap.

    The array frame is hinted ``shuffle_hash`` unless the CALLER proved
    the raw input small (``small``, from operators/hints.py): its rows
    are corpus-grain and FAT (one array per document), while Catalyst
    sizes an aggregate's output from row-count guesses that ignore
    array payloads — at the 100× stress tier the planner chose a
    broadcast whose real materialized size blew the 8 GB driver
    (measured; 1× and 10× masked it). A shuffled hash join keeps both
    sides partitioned — per-executor build memory is corpus/partitions
    — and skips the sort a merge join would pay on array rows. When the
    input scan provably fits the driver, the broadcast is safe and
    worth ~0.5–0.9 s per join at sf0.1 (VERDICT r7 #2)."""
    # persist + barrier: the two cand-side joins each execute the arr
    # subtree (collect_list over the cached tok table) — cache-source
    # frames defeat exchange reuse (see jaccard's pref note), so
    # without the persist the array build ran twice inside the verify
    # stage. Doc-grain array rows, but the consumer reads the arrays
    # AS arrays (array_intersect) — no re-explode, so the r6
    # array-cache deserialization trap does not apply.
    arr = tracked_persist(
        pin_corpus_agg(
            tok.groupBy("_id").agg(F.collect_list("_t").alias("_a")), small
        )
    )
    _materialize_together([arr] + (materialize_with or []))
    # set sizes ride along for free (the arrays are per-doc DISTINCT
    # shingles, so size(_a) IS |S(doc)|) — emitting them here lets the
    # callers drop a separate corpus-grain size aggregate and its two
    # post-verify joins (r9: two fewer shuffle/broadcast joins and one
    # fewer pinned aggregate per similarity join).
    # NOT mapInArrow (r13, the VERDICT-r12 #4 suggestion — implemented,
    # oracle-matched at 3 SFs, measured, REVERTED): a vectorized numpy
    # verify (flatten both list columns, batch-local dense value codes,
    # one sorted np.isin per batch) replaced array_intersect and lost
    # the same-session ABAB decisively — qb0 cold med 2.45 → 3.81 s,
    # q36 2.16 → 4.22, q07 3.04 → 5.64; warm 1.29 → 3.04 / 1.28 → 2.37
    # / 1.31 → 1.37. The candidate rows carry BOTH documents' full
    # hash arrays, so the Python boundary ships ~2×|doc| longs per pair
    # (guide §4.1's transpose+serialization cost) — more than the
    # JIT-warmed codegen hash intersect costs in place. The JVM form
    # stays; its cold-vs-warm CPU gap (25 s → 4 s on the qb0 verify
    # stage) is C2 warm-up, paid once per JVM, not per query.
    return (
        cand.join(
            arr.select(F.col("_id").alias(left), F.col("_a").alias("_al")), left
        )
        .join(
            arr.select(F.col("_id").alias(right), F.col("_a").alias("_ar")), right
        )
        .select(
            left,
            right,
            F.size(F.array_intersect("_al", "_ar")).alias("_np"),
            F.size("_al").alias("_nl"),
            F.size("_ar").alias("_nr"),
        )
    )


def jaccard_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """EXACT all-pairs shingle-set Jaccard ≥ num/den join with PREFIX
    FILTERING (Chaudhuri et al. SSJoin / Bayardo et al. AllPairs): the
    posting-list self-join runs over each document's PREFIX — its
    p = |d| − ⌈τ·|d|⌉ + 1 rarest shingles (global document-frequency
    order) — instead of all of them.

    Why that is sound: J(a,b) ≥ τ ⇒ |a∩b| ≥ τ·|a∪b| ≥ τ·max(|a|,|b|),
    and two sets overlapping in ≥ t elements must collide within their
    (|·|−t+1)-prefixes of ANY shared total order. So prefix-colliding
    pairs are a candidate SUPERSET, and the exact verify (intersection
    count + integer threshold) makes the answer exact — the same
    sketch-proposes/verify-decides contract as
    :func:`~alaska_etl_spark.operators.sketches.heavy_hitters`.

    Why it scales: the candidate bound drops from Σ_g df(g)² over every
    shingle to the same sum over prefix occurrences only — at τ=0.8
    each document contributes ~20% of its shingles, and because the
    prefix keeps the RAREST shingles first, the hot posting lists (the
    df² blow-up) are exactly what falls out. The rarity order is
    computed per document (window on the doc id), never as a global
    rank — any consistent total order is correct, so (df, shingle-hash)
    serves and no unpartitioned sort exists anywhere.

    Size filter: candidates with den·min(|a|,|b|) < num·max(|a|,|b|)
    cannot reach τ and drop before verification.

    Positional filter (PPJoin, Xiao et al. WWW'08): each collision
    carries both sides' prefix POSITIONS, and a collision at (i, j) can
    only belong to a qualifying pair if the overlap upper bound
    ``1 + min(|a| − i, |b| − j)`` reaches the required overlap
    ``t = ⌈num·(|a|+|b|) / (num+den)⌉`` (all integer arithmetic).
    Soundness: common tokens are a subsequence of both documents'
    (df, hash) orders, so the FIRST common token — which the prefix
    property places inside both prefixes for any true pair — bounds the
    total overlap by exactly that expression; keeping pairs where ANY
    collision passes is therefore a superset of PPJoin's candidate set
    and never drops a true pair. The filter runs per collision row
    inside the same codegen stage, so it cuts the distinct + verify
    volume that the df² enumeration feeds (measured at sf0.1: the
    verify join is the dominant CPU).

    All set arithmetic is integer (threshold num/den, round-half-up
    rounding in integer space) so DuckDB replays the result exactly
    (qb0) — with string shingles, which also cross-checks the 64-bit
    shingle-hash compaction used for the joins here.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    from pyspark.sql import Window

    from alaska_etl_spark.operators.dedup import shingles

    num, den = threshold_num, threshold_den
    small = input_fits_driver(df)  # conditional pin — operators/hints.py
    # three consumers read the shingle table (document frequencies and
    # both verify sides) — persist it once instead of re-running
    # tokenize+explode per branch (the minhash signature table in
    # operators/dedup.py follows the same rule). ~16 bytes/row after
    # the hash compaction.
    tok = (
        ensure_min_parallelism(df, id_col)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(shingles(text_col, n)).alias("_t"),
        )
        .select("_id", F.xxhash64("_t").alias("_t"))
    )
    tok = tracked_persist(tok)
    # document frequency and set size as WINDOW counts over the cached
    # shingle table (r9): the former dfreq-aggregate + join + sz-join
    # chain cost two extra join stages and their AQE materializations;
    # the unbounded count windows need the same two exchanges (_t,
    # then _id) the chain already paid, and the _n window shares the
    # _id exchange + sort with the ranking window (the shared-exchange
    # rule, SCALE.md).
    wdf = Window.partitionBy("_t")
    wid = Window.partitionBy("_id")
    w = Window.partitionBy("_id").orderBy("_df", "_t")
    # prefix length p = n - ceil(tau*n) + 1, in exact integers:
    # ceil(num*n/den) = (num*n + den - 1) div den
    pref = (
        tok.withColumn("_df", F.count(F.lit(1)).over(wdf))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wid))
        .filter(
            F.col("_rn")
            <= F.col("_n") - F.expr(f"({num} * _n + {den} - 1) div {den}") + 1
        )
        .select("_id", "_t", "_n", "_rn")
    )
    # token-grain posting frame: the same never-broadcast rule as the
    # aggregates — AQE's RUNTIME join demotion sizes a finished shuffle
    # by its COMPRESSED bytes, and at the 100× tier it converted this
    # self-join to a broadcast whose build blew the driver ("Not enough
    # memory to build and broadcast"), intermittently (r8, q36's
    # sibling frame). Compressed posting bytes under-signal hash-table
    # build size.
    # PERSIST the prefix frame + one-job barrier (r9): the self-join
    # executes its two children independently, so the whole prefix
    # chain ran TWICE (two identical map stages in the r9 anatomy).
    # Spark's exchange-reuse rule would dedup identical children, but
    # an InMemoryRelation SOURCE defeats plan canonicalization
    # (measured: the same self-join reuses its exchange on a raw
    # source, never on a cached one — and tok is cached by design).
    # The cache is the dedup instead: flat scalar token-grain rows
    # (the persist-friendly class, SCALE.md "Persist-vs-recompute"),
    # materialized together with the verify's array frame in ONE
    # barrier job (see _materialize_together) so the join sides cannot
    # race to build it.
    pref = tracked_persist(pin_corpus_agg(pref, small))
    pa, pb = pref.alias("a"), pref.alias("b")
    # required overlap t = ceil(num*(na+nb)/(num+den)); a collision at
    # prefix positions (ra, rb) bounds the overlap by
    # 1 + min(na-ra, nb-rb) — PPJoin positional filter (see docstring)
    required = F.expr(
        f"({num} * (a._n + b._n) + {num + den} - 1) div {num + den}"
    )
    # explicit repartition BEFORE the dedup, fused with it (the
    # aggregate reuses the user exchange, so this is not an extra
    # shuffle): the candidate frame is few MB but feeds the CPU-dense
    # array_intersect verify, and AQE's byte-based coalescing
    # serialized it onto 3 tasks (3.4 CPU-s, ~1.2 s wall measured at
    # sf0.1) — bytes under-signal CPU on array rows. A user
    # REPARTITION_BY_NUM is exempt from AQE coalescing.
    n_par = df.sparkSession.sparkContext.defaultParallelism
    cand = (
        pa.join(pb, F.col("a._t") == F.col("b._t"))
        .filter(F.col("a._id") < F.col("b._id"))
        .filter(
            F.lit(den) * F.least("a._n", "b._n")
            >= F.lit(num) * F.greatest("a._n", "b._n")
        )
        .filter(
            F.lit(1)
            + F.least(
                F.col("a._n") - F.col("a._rn"), F.col("b._n") - F.col("b._rn")
            )
            >= required
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .repartition(n_par, "id_a", "id_b")
        .dropDuplicates()
    )
    inter = _intersect_counts(
        cand, tok, "id_a", "id_b", small, materialize_with=[pref]
    )
    # set sizes come off the verify arrays (_intersect_counts) — no
    # separate size aggregate, no post-verify joins
    scored = inter.withColumn(
        "_nq", F.col("_nl") + F.col("_nr") - F.col("_np")
    ).filter(F.lit(den) * F.col("_np") >= F.lit(num) * F.col("_nq"))
    scale = 10**round_digits
    return scored.select(
        "id_a",
        "id_b",
        (
            div_half_up("_np", "_nq", scale)
            / F.lit(float(scale))
        ).alias("jaccard"),
    )


def containment_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold_num: int = 3,
    threshold_den: int = 4,
    round_digits: int = 4,
    max_dst_df: int | None = None,
    tok: DataFrame | None = None,
) -> DataFrame:
    """EXACT directed shingle-set CONTAINMENT join: every ordered pair
    (src ≠ dst) with C(src→dst) = |Sh(src) ∩ Sh(dst)| / |Sh(src)| ≥
    num/den. The asymmetric companion to :func:`jaccard_similarity_join`:
    Jaccard misses excerpts by construction (a 50-token quote inside a
    5000-token page has J ≈ 0.01 but containment 1.0), and quoted /
    excerpted / boilerplate-wrapped text is exactly what benchmark
    decontamination and provenance audits must catch.

    Prefix filtering, containment form: C(src→dst) ≥ τ ⇒
    |src ∩ dst| ≥ ⌈τ·|src|⌉, so any qualifying dst must collide with
    src's (|src| − ⌈τ·|src|⌉ + 1)-prefix under the shared
    (document-frequency, hash) shingle order. ONLY the src side prunes
    to its prefix — the dst side must stay complete (a tiny quote can
    live inside any page, so dst's posting lists are full). Candidate
    bound: Σ_g df_pref(g)·df(g) — the src prefix keeps each document's
    RAREST shingles, so hot posting lists contribute src-occurrences
    only from documents where the hot gram is among the rarest (few).
    ``max_dst_df`` optionally caps the dst side too (declared-
    approximate: containment against documents reachable only through
    hotter grams is lost — the same lever as cosine's ``max_df``).

    Size filter: den·|dst| ≥ num·|src| (the intersection cannot exceed
    |dst|), applied at COLLISION time, before the distinct. Verify is
    exact integer arithmetic; the emitted score uses the same integer
    round-half-up scaling as the Jaccard join, so DuckDB replays it
    bit-for-bit (qf0).

    Positional filter, containment form (r6, same PPJoin reasoning as
    the Jaccard join): both sides' postings are RANKED by the shared
    (df, hash) order — one window pass serves the src prefix AND the
    dst positions — and a collision at positions (i, j) survives only
    if ``1 + min(|src|−i, |dst|−j) ≥ ⌈num·|src|/den⌉``. The first
    common shingle of any qualifying pair lies inside src's prefix
    (prefix property) and trivially inside dst's full postings, and it
    bounds the overlap by exactly that expression, so any-collision-
    passes keeps a candidate superset; the dst side stays complete for
    RECALL while its positions still prune — the lever the src-only
    prefix could not reach (the r5 10× stress measured this operator
    closest to linear for exactly this reason).

    ``tok`` (advanced, intra-query reuse): a pre-built, already-
    PERSISTED distinct (``_id``, ``_t``) frame — per-document distinct
    shingle xxhash64 values, exactly what this function would build —
    lets a caller that needs the token table for ANOTHER pass too
    (:func:`containment_spans` keeps gram positions on the same frame)
    tokenize the corpus ONCE instead of twice. Semantics are unchanged;
    the caller owns the persist.

    Returns (src_id, dst_id, containment), both directions as separate
    rows when both qualify.
    """
    from pyspark.sql import Window

    from alaska_etl_spark.operators.dedup import shingles

    num, den = threshold_num, threshold_den
    small = input_fits_driver(df)  # conditional pin — operators/hints.py
    if tok is None:
        tok = tracked_persist(
            ensure_min_parallelism(df, id_col)
            .select(
                F.col(id_col).alias("_id"),
                F.explode(shingles(text_col, n)).alias("_t"),
            )
            .select("_id", F.xxhash64("_t").alias("_t"))
        )
    # document frequency / set size / rank as WINDOW counts over the
    # cached shingle table, and the ranked frame PERSISTED: the src
    # (prefix-pruned) and dst (full) sides plus the verify all read it,
    # and cache-source frames defeat exchange reuse (see jaccard's pref
    # note) — without the persist the whole rank chain executed once
    # per consumer. Flat scalar token-grain rows (the persist-friendly
    # class). Materialized in the shared one-job barrier below.
    wdf = Window.partitionBy("_t")
    wid = Window.partitionBy("_id")
    w = Window.partitionBy("_id").orderBy("_df", "_t")
    ranked = tracked_persist(
        pin_corpus_agg(
            tok.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count(F.lit(1)).over(wid)),
            small,
        )
    )
    # token-grain posting frames: never a broadcast side — AQE's
    # runtime demotion sized the finished shuffle by COMPRESSED bytes
    # and broadcast the full posting rows at 100×, OOMing the build
    # intermittently (r8; see jaccard's pref note)
    pref = ranked.filter(
        F.col("_rn")
        <= F.col("_n") - F.expr(f"({num} * _n + {den} - 1) div {den}") + 1
    )
    full = ranked
    if max_dst_df is not None:
        full = full.filter(F.col("_df") <= max_dst_df)
    src = pref.select(
        F.col("_id").alias("src_id"), "_t", F.col("_n").alias("_ns"), F.col("_rn").alias("_rs")
    )
    dst = full.select(
        F.col("_id").alias("dst_id"), "_t", F.col("_n").alias("_nd"), F.col("_rn").alias("_rd")
    )
    # required overlap t_c = ceil(num*ns/den), reused by both pre-filters
    required = F.expr(f"({num} * _ns + {den} - 1) div {den}")
    cand = (
        src.join(dst, "_t")
        .filter(F.col("src_id") != F.col("dst_id"))
        .filter(F.lit(den) * F.col("_nd") >= F.lit(num) * F.col("_ns"))
        .filter(
            F.lit(1)
            + F.least(F.col("_ns") - F.col("_rs"), F.col("_nd") - F.col("_rd"))
            >= required
        )
        .select("src_id", "dst_id")
        # fused repartition+dedup: AQE-proof parallelism for the
        # CPU-dense verify (see jaccard_similarity_join's cand note)
        .repartition(df.sparkSession.sparkContext.defaultParallelism,
                     "src_id", "dst_id")
        .dropDuplicates()
    )
    inter = _intersect_counts(
        cand, tok, "src_id", "dst_id", small, materialize_with=[ranked]
    )
    # set sizes come off the verify arrays (_intersect_counts) — no
    # separate size aggregate, no post-verify joins
    scored = inter.filter(
        F.lit(den) * F.col("_nr") >= F.lit(num) * F.col("_nl")
    ).filter(F.lit(den) * F.col("_np") >= F.lit(num) * F.col("_nl"))
    scale = 10**round_digits
    return scored.select(
        "src_id",
        "dst_id",
        (
            div_half_up("_np", "_nl", scale)
            / F.lit(float(scale))
        ).alias("containment"),
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    q: int = 2,
    max_dist: int = 1,
) -> DataFrame:
    """EXACT all-pairs string EDIT-DISTANCE join: every pair
    (id_a < id_b) with levenshtein(a, b) ≤ ``max_dist``, via positional
    q-gram prefix filtering (Ed-Join, Xiao et al. VLDB'08; count/
    position filtering after Gravano et al. VLDB'01) — the typo/OCR/
    variant-spelling sibling of the set-similarity joins: Jaccard over
    shingles cannot see that two strings differ by ONE character, and
    canonical-name reconciliation (product titles, author names, URL
    slugs) is thresholded on edits, not token overlap.

    Candidate generation, never all-pairs: one edit operation destroys
    at most ``q`` positional q-grams, so ed(a,b) ≤ d leaves a
    gram-matching of size ≥ max(|G_a|,|G_b|) − d·q where matched grams
    are equal AND |pos_a − pos_b| ≤ d. Ordering every string's grams by
    the global (document-frequency, hash) rarity order, any qualifying
    pair must therefore collide within both strings' first
    ``L = d·q + 1`` grams (the prefix-filter argument on the shared
    total order), at positions within d — the same
    propose-superset/verify-exact contract as
    :func:`jaccard_similarity_join`, with TWO extra per-collision
    prunes in the same codegen stage: the position filter
    |pos_a − pos_b| ≤ d and the length filter ||a| − |b|| ≤ d.

    Short strings: the matching bound is VACUOUS when a string has
    ≤ d·q grams (max(|G_a|,|G_b|) − d·q ≤ 0 — 'aa' vs 'ab' at d=1,
    q=2 share zero grams yet qualify; caught by the hypothesis test),
    so only strings with at least q·(d+1) characters (> d·q grams)
    ride the gram path. Every true pair with a shorter member has its
    partner within d of that length, so the short subset joins
    all-pairs against strings up to q·(d+1) − 1 + d chars — bounded by
    the length filter, disjoint from the gram path.

    Verify is Spark's native banded ``levenshtein(a, b, threshold)``
    (O(len·d) per pair, -1 when exceeded) on the deduped candidates —
    exact, so the prefix filter only costs recall if the lemma is
    wrong; a hypothesis test replays tiny hot-alphabet corpora against
    brute force. The emitted distance is an exact integer; a DuckDB
    brute-force twin (full-DP levenshtein over length-filtered pairs)
    must produce the identical frame, so the driver's oracle compare
    itself re-proves candidate completeness per run.

    Scale: posting frames ride the rarity prefix (hot grams survive
    only where they are a string's rarest), every corpus-grain frame
    follows the never-broadcast pin (operators/hints.py), and the
    candidate dedup repartitions by pair before the verify (AQE-proof
    parallelism, the r8 simjoin lesson). Returns (id_a, id_b, dist).
    """
    from pyspark.sql import Window

    d = int(max_dist)
    small = input_fits_driver(df)
    s = ensure_min_parallelism(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.col(text_col).cast("string").alias("_s"),
    ).filter(F.col("_s").isNotNull())
    s = tracked_persist(
        s.withColumn("_len", F.length("_s").cast("bigint"))
    )

    # --- gram path: both sides have > d*q grams (_len >= q*(d+1)) ---
    min_gram_len = q * (d + 1)
    grams_expr = F.expr(
        f"CASE WHEN length(_s) >= {min_gram_len} THEN "
        f"transform(sequence(1, length(_s) - {q} + 1), "
        f"i -> struct(CAST(i AS BIGINT) AS pos, xxhash64(substring(_s, i, {q})) AS g)) "
        "ELSE array() END"
    )
    tok = s.select("_id", "_len", F.explode(grams_expr).alias("_e")).select(
        "_id", "_len", F.col("_e.pos").alias("_pos"), F.col("_e.g").alias("_g")
    )
    wdf = Window.partitionBy("_g")
    wid = Window.partitionBy("_id").orderBy("_df", "_g", "_pos")
    pref = (
        tok.withColumn("_df", F.count(F.lit(1)).over(wdf))
        .withColumn("_rn", F.row_number().over(wid))
        .filter(F.col("_rn") <= d * q + 1)
        .select("_id", "_len", "_pos", "_g")
    )
    pref = tracked_persist(pin_corpus_agg(pref, small))
    pa, pb = pref.alias("a"), pref.alias("b")
    n_par = df.sparkSession.sparkContext.defaultParallelism
    cand_grams = (
        pa.join(pb, F.col("a._g") == F.col("b._g"))
        .filter(F.col("a._id") < F.col("b._id"))
        .filter(F.abs(F.col("a._pos") - F.col("b._pos")) <= d)
        .filter(F.abs(F.col("a._len") - F.col("b._len")) <= d)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    )

    # --- short path: pairs where either side has too few grams ---
    shorts = s.filter(F.col("_len") < min_gram_len)
    partners = s.filter(F.col("_len") <= min_gram_len - 1 + d)
    cand_short = (
        shorts.alias("a")
        .join(
            partners.alias("b"),
            F.abs(F.col("a._len") - F.col("b._len")) <= d,
        )
        .filter(F.col("a._id") != F.col("b._id"))
        .select(
            F.least(F.col("a._id"), F.col("b._id")).alias("id_a"),
            F.greatest(F.col("a._id"), F.col("b._id")).alias("id_b"),
        )
    )

    cand = (
        cand_grams.unionByName(cand_short)
        .repartition(n_par, "id_a", "id_b")
        .dropDuplicates()
    )
    sa = s.select(F.col("_id").alias("id_a"), F.col("_s").alias("_sa"))
    sb = s.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"))
    _materialize_together([s, pref])
    dist = F.expr(f"levenshtein(_sa, _sb, {d})")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", dist.cast("bigint").alias("dist"))
        .filter(F.col("dist") >= 0)
    )


def containment_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold_num: int = 3,
    threshold_den: int = 4,
    round_digits: int = 4,
    max_dst_df: "int | None" = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """WHERE the excerpt sits: for every directed containment pair
    (:func:`containment_join` — the quote/excerpt detector), localize
    the match as first/last shared-shingle POSITIONS on both sides.
    Detection says "src is quoted inside dst"; provenance review,
    attribution, and surgical decontamination (cut the span, keep the
    document) all need the offsets — this is the explanation operator
    the boolean pair list lacks.

    Positions are 1-based first-occurrence indices in each document's
    shingle SEQUENCE (pre-dedup): a gram's position is where it first
    appears in reading order, so ``dst_first..dst_last`` brackets the
    quoted region of dst and ``src_first..src_last`` the matched part
    of src (for a true excerpt, src_first ≈ 1 and src_last ≈ its
    shingle count). Both engines compute min-position per (doc, gram)
    from the same generate+zip construction, so the SQL twin replays
    offsets exactly.

    Scale shape: the pair frame is OUTPUT-grain (the containment
    join's result, already verified); the two position joins key on
    (id) then (id, gram) against the token-grain position table —
    posting-list-sized joins, never all-pairs, and the per-pair
    aggregate reduces |src| gram rows to one span row.

    One tokenize, not two (r10): detection and localization both need
    the per-document distinct gram-hash table — the only thing the
    span pass adds is each gram's first POSITION. So this builds ONE
    position-keeping token table (min-position groupBy replaces
    ``shingles``'s in-row array_distinct — same distinct row set), and
    hands its (id, gram) projection to :func:`containment_join` via
    ``tok``: the detector's whole tokenize→explode subtree and the
    span pass's re-tokenize both collapse into the shared persisted
    frame (was the repo's worst bench constant: the corpus was
    tokenized twice per call, VERDICT r9 #1).

    ``pairs`` (advanced): a precomputed containment pair frame
    (src_id, dst_id[, ...]) — e.g. a persisted :func:`containment_join`
    result the caller already paid for. The detector is then skipped
    entirely and only the span pass runs, with the position table
    pruned to the paired documents before the explode.

    Returns (src_id, dst_id, n_shared, src_first, src_last, dst_first,
    dst_last) ordered by (src_id, dst_id)."""
    from alaska_etl_spark.operators.dedup import word_tokens

    toks = F.filter(word_tokens(text_col), lambda t: t != "")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    seq = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )

    def pos_table(base: DataFrame) -> DataFrame:
        # token-grain position table on 8-byte GRAM HASHES (the simjoin
        # compaction stance — positions only need gram identity, and
        # the oracle replays positions on the string form). First
        # occurrence per gram is computed IN-ROW — (hash, 1-based pos)
        # structs, array_sort (hash asc, pos asc), keep each hash's
        # first entry via an indexed filter — O(k log k) per document
        # and NO shuffle: the explode emits already-distinct rows, so
        # the corpus-grain min-position groupBy exchange disappears
        # (the dedup.shingles array_distinct stance, kept positional).
        ent = F.array_sort(
            F.transform(
                seq,
                lambda g, i: F.struct(
                    F.xxhash64(g).alias("h"),
                    (i + 1).cast("bigint").alias("p"),
                ),
            )
        )
        firsts = F.filter(
            F.col("_e"),
            # when/otherwise, not boolean OR: element_at is 1-based and
            # ANSI mode faults on index 0, so the i == 0 arm must never
            # evaluate the lookup (CASE WHEN is lazy per-row; OR isn't
            # guaranteed to short-circuit under codegen)
            lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
                F.element_at(F.col("_e"), i)["h"] != x["h"]
            ),
        )
        return (
            base
            # zero-token exclusion via the CHEAP equivalent predicate: a
            # size(seq) > 0 filter gets pushed below the parallelizing
            # exchange and re-evaluates the whole tokenize+gram transform
            # inside the single scan task (measured: a 3.3 s one-task stage
            # tokenizing the full corpus twice); "has any non-whitespace"
            # is the same row set and pushes down for free. posexplode_OUTER
            # because InferFiltersFromGenerate re-creates that exact
            # size()>0 filter from a plain posexplode and pushes it below
            # the exchange again — outer generators infer nothing, and with
            # the rlike in place the sequence is never empty (kept docs
            # have >=1 token), so outer is row-identical to inner.
            .filter(F.col(text_col).rlike(r"\S"))
            .select(F.col(id_col).alias("_id"), ent.alias("_e"))
            .select("_id", F.posexplode_outer(firsts).alias("_p0", "_f"))
            .select(
                "_id",
                F.col("_f.h").alias("_g"),
                F.col("_f.p").alias("_pos"),
            )
        )

    if pairs is None:
        # shared corpus-grain table: positions for the span pass, and
        # (projected to (_id, _t)) the detector's distinct gram table
        pos = tracked_persist(pos_table(ensure_min_parallelism(df, id_col)))
        pairs = containment_join(
            df,
            id_col,
            text_col,
            n=n,
            threshold_num=threshold_num,
            threshold_den=threshold_den,
            round_digits=round_digits,
            max_dst_df=max_dst_df,
            tok=pos.select("_id", F.col("_g").alias("_t")),
        ).select("src_id", "dst_id")
        pairs = tracked_persist(pairs)
        # one-job barrier: unmaterialized, each span-side consumer
        # recomputes the whole containment join (no cross-task wait in
        # BlockManager; measured 18-74 s vs 3 s with the barrier)
        pairs.count()
    else:
        pairs = tracked_persist(pairs.select("src_id", "dst_id"))
        n_pairs = pairs.count()  # the ids broadcast AND the span join read it
        # prune BEFORE the explode: span localization only touches
        # matched documents, and the pair frame is output-grain — one
        # broadcast semi-join cuts the position pass from corpus-grain
        # to match-grain (at sf0.1: ~3% of docs; the same factor at any
        # scale where pairs are rare, which is the operating point of a
        # τ=3/4 detector). Broadcast only under the measured 2×pairs
        # bound — a huge caller pair frame falls back to AQE's choice.
        ids = (
            pairs.select(F.col("src_id").alias("_id"))
            .unionByName(pairs.select(F.col("dst_id").alias("_id")))
            .distinct()
        )
        pos = tracked_persist(
            pos_table(
                ensure_min_parallelism(df, id_col).join(
                    broadcast_if_bounded(ids, 2 * n_pairs),
                    F.col(id_col) == F.col("_id"),
                    "left_semi",
                )
            )
        )
    j = (
        pairs.join(
            pos.select(
                F.col("_id").alias("src_id"), "_g", F.col("_pos").alias("_ps")
            ),
            "src_id",
        )
        .join(
            pos.select(
                F.col("_id").alias("dst_id"), "_g", F.col("_pos").alias("_pd")
            ),
            ["dst_id", "_g"],
        )
    )
    return (
        j.groupBy("src_id", "dst_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.min("_ps").cast("bigint").alias("src_first"),
            F.max("_ps").cast("bigint").alias("src_last"),
            F.min("_pd").cast("bigint").alias("dst_first"),
            F.max("_pd").cast("bigint").alias("dst_last"),
        )
        .orderBy("src_id", "dst_id")
    )


def longest_shared_runs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_run_tokens: int | None = None,
    pairs: DataFrame | None = None,
    max_pair_df: int = 3,
) -> DataFrame:
    """EXACT longest shared VERBATIM token run per document pair, at
    ARBITRARY length — the exact-substring-dedup question the
    suffix-array tool of Lee et al. '22 ("Deduplicating Training Data
    Makes Language Models Better") answers globally, re-expressed in
    the repo's candidates + exact-verify discipline (VERDICT r9
    Missing #1). The fixed-n gram operators (X6 duplicated spans, X154
    span localization) flag that gram-grain overlap EXISTS; this one
    measures the true maximal verbatim extent: a 50-token quote and 17
    scattered trigram coincidences have the same "shares grams"
    signal but entirely different longest runs.

    Exactness argument: a shared verbatim run of L ≥ n tokens is
    EXACTLY a maximal chain of L−n+1 consecutive positional n-gram
    matches on one DIAGONAL (dst_pos − src_pos constant), and
    conversely every maximal diagonal chain of c consecutive matches
    is a shared verbatim run of c+n−1 tokens. So: explode BOTH sides
    to (position, gram-hash), equi-join per candidate pair on the
    gram, group by (pair, diagonal), and run gaps-and-islands
    (src_pos − row_number is constant exactly on consecutive
    positions) — max island ⇒ longest run, exact at any length, no
    suffix array and no quadratic DP anywhere.

    ``pairs`` scopes the measurement (any recall lane: containment
    join, MinHash-LSH components, a provenance list) — a frame with
    ``id_a``/``id_b`` columns; rows are measured as given (runs are
    symmetric, so orientation only names the sides). With
    ``pairs=None`` a built-in generator proposes every unordered pair
    sharing at least one RARE gram (document frequency ≤
    ``max_pair_df``) — the blocked-candidate stance: at web scale
    nobody measures all pairs, and the lattice composition bound
    (SCALE.md "Exact-substring dedup") says which runs a rare-gram
    block can miss: a run of length L contains L−n+1 grams, so it is
    missed only if EVERY one of those grams is corpus-hot — exactly
    the boilerplate case the X152 stop-gram audit exists to surface.

    Work per pair is Σ positional gram collisions: run structure plus
    hot-gram noise (a gram at p positions in A and q in B costs p·q
    rows); the rare-gram generator bounds the pair set and the
    repartition-by-pair before the island windows keeps the verify
    AQE-proof (the r8 simjoin lesson). Returns one row per pair with
    a run of ≥ ``min_run_tokens`` (default n): (id_a, id_b,
    longest_run_tokens, n_runs, src_start, dst_start) — starts are
    1-based token positions of THE longest run (ties: smallest
    src_start, then dst_start), n_runs counts maximal runs ≥ the
    threshold — ordered by (id_a, id_b)."""
    from pyspark.sql import Window

    min_run = n if min_run_tokens is None else int(min_run_tokens)
    if min_run < n:
        raise ValueError(f"min_run_tokens={min_run} below gram width n={n}")
    small = input_fits_driver(df)
    toks = F.filter(word_tokens(text_col), lambda t: t != "")
    k = F.size(toks) - F.lit(n - 1)
    seq = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # documents with < n tokens carry NO gram here — the dedup.shingles
    # whole-text-gram convention would make a t-token doc's single gram
    # count as an n-token run (island + n − 1 assumes every gram spans
    # exactly n tokens; the hypothesis test caught two 1-token docs
    # reporting a 2-token "run"). Sound because min_run_tokens ≥ n: a
    # doc with t < n tokens can share at most t < min_run tokens, so no
    # reportable run is lost. NULL seq (not empty array) keeps the
    # posexplode_OUTER trap-dodge valid; the one NULL row it emits per
    # short doc is dropped right after the generator (a filter on
    # generator OUTPUT cannot be pushed below it).
    seqn = F.when(F.size(toks) >= n, seq)
    n_par = df.sparkSession.sparkContext.defaultParallelism
    base = ensure_min_parallelism(df, id_col)
    if pairs is not None:
        # prune BEFORE the explode (the containment_spans pairs= stance):
        # a caller-supplied pair frame is match-grain, so the positional
        # gram table only needs the paired documents — one broadcast
        # semi-join cuts the token explode from corpus-grain to
        # match-grain (ADVICE r10: the advertised scoping was lost here).
        pairs = tracked_persist(
            pairs.select("id_a", "id_b").repartition(n_par, "id_a", "id_b").dropDuplicates()
        )
        n_pairs = pairs.count()  # the ids broadcast AND the diagonal join read it
        ids = (
            pairs.select(F.col("id_a").alias("_w"))
            .unionByName(pairs.select(F.col("id_b").alias("_w")))
            .distinct()
        )
        # broadcast only under a measured bound (ids ≤ 2×pairs): a large
        # caller-supplied pair frame must not force a driver-OOM
        # broadcast — above the bound AQE picks from runtime sizes
        base = base.join(
            broadcast_if_bounded(ids, 2 * n_pairs),
            F.col(id_col) == F.col("_w"),
            "left_semi",
        )
    # ALL positions (multi-occurrence grams keep every diagonal), the
    # pre-filter + posexplode_outer trap-dodge as containment_spans
    tokpos = (
        base.filter(F.col(text_col).rlike(r"\S"))
        .select(F.col(id_col).alias("_id"), seqn.alias("_s"))
        .select("_id", F.posexplode_outer("_s").alias("_p0", "_g"))
        .filter(F.col("_g").isNotNull())
        .select("_id", F.xxhash64("_g").alias("_g"), (F.col("_p0") + 1).alias("_p"))
    )
    tokpos = tracked_persist(pin_corpus_agg(tokpos, small))
    if pairs is None:
        dist = tokpos.select("_id", "_g").distinct()
        rare = dist.groupBy("_g").agg(F.count(F.lit(1)).alias("_df")).filter(
            (F.col("_df") >= 2) & (F.col("_df") <= max_pair_df)
        )
        posting = dist.join(rare.select("_g"), "_g")
        pa, pb = posting.alias("a"), posting.alias("b")
        gen = (
            pa.join(pb, F.col("a._g") == F.col("b._g"))
            .filter(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        )
        pairs = tracked_persist(
            gen.repartition(n_par, "id_a", "id_b").dropDuplicates()
        )
        _materialize_together([tokpos, pairs])
    else:
        _materialize_together([tokpos])
    j = (
        pairs.join(
            tokpos.select(F.col("_id").alias("id_a"), "_g", F.col("_p").alias("_ps")),
            "id_a",
        )
        .join(
            tokpos.select(F.col("_id").alias("id_b"), "_g", F.col("_p").alias("_pd")),
            ["id_b", "_g"],
        )
        .select("id_a", "id_b", "_ps", (F.col("_pd") - F.col("_ps")).alias("_dg"), "_pd")
    )
    wrun = Window.partitionBy("id_a", "id_b", "_dg").orderBy("_ps")
    islands = (
        j.withColumn("_k", F.col("_ps") - F.row_number().over(wrun))
        .groupBy("id_a", "id_b", "_dg", "_k")
        .agg(
            (F.count(F.lit(1)) + F.lit(n - 1)).cast("bigint").alias("_run"),
            F.min("_ps").cast("bigint").alias("_s0"),
            F.min("_pd").cast("bigint").alias("_d0"),
        )
        .filter(F.col("_run") >= min_run)
    )
    wbest = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("_run").desc(), F.col("_s0").asc(), F.col("_d0").asc()
    )
    return (
        islands.withColumn("_rk", F.row_number().over(wbest))
        .groupBy("id_a", "id_b")
        .agg(
            F.max("_run").cast("bigint").alias("longest_run_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.max(F.when(F.col("_rk") == 1, F.col("_s0"))).cast("bigint").alias("src_start"),
            F.max(F.when(F.col("_rk") == 1, F.col("_d0"))).cast("bigint").alias("dst_start"),
        )
        .orderBy("id_a", "id_b")
    )


def longest_repeat_runs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_run_tokens: int | None = None,
    hot_gram_cap: int | None = None,
) -> DataFrame:
    """EXACT longest INTRA-document repeated verbatim token run at
    ARBITRARY length — the within-example half of the Lee et al. '22
    exact-substring story (X169/:func:`longest_shared_runs` measures
    CROSS-document runs; the published suffix-array tool also removes
    repeats WITHIN a document: periodic boilerplate, table dumps,
    degenerate generation loops). Same positional-gram diagonal
    gaps-and-islands frame, SELF-paired with diagonal > 0: a token
    range repeated at offset d is exactly a maximal chain of
    consecutive positional n-gram matches on diagonal d (the X169
    exactness argument with a == b), and overlapping occurrences
    (period < run length, ``x x x x``) fall out of the same
    arithmetic — each period is its own diagonal.

    No pair generator and no recall boundary: every document pairs
    with itself, so unlike the cross-document form there is no
    rare-gram block to miss anything — the measurement is EXACT over
    the whole corpus by construction. Work per document is Σ per-gram
    multiplicity² (hot-gram documents are exactly the degenerate-repeat
    documents the operator exists to flag); the island windows key on
    (id, diagonal), so one document's rows spread across its diagonals
    rather than concentrating on a single reducer — only a giant
    single-period repeat keeps one hot diagonal, and the document's own
    length bounds that partition.

    Returns one row per document with a repeat of ≥ ``min_run_tokens``
    (default n): (``id_col``, longest_run_tokens, n_runs, src_start,
    dst_start) — 1-based token positions of THE longest run's two
    occurrences (ties: smallest src_start, then dst_start); n_runs
    counts maximal runs ≥ the threshold across all diagonals.

    ``hot_gram_cap`` — the degenerate-document guard (VERDICT r11 #3).
    The pair-enumerating self-join puts a document's per-gram
    multiplicity² pairs on ONE (id, gram) key, so a single pathological
    document (10⁵ repetitions of one token) concentrates ~10¹⁰ pairs on
    one task — the docs the operator exists to flag are its own worst
    input. With the cap set, any document owning a gram whose
    within-document multiplicity exceeds the cap is routed to an
    ADJACENT-OCCURRENCE lane: each gram position pairs only with its
    NEXT occurrence (one ``lead`` window, O(tokens) rows — linear in
    the document, never multiplicity²), and the same islands
    arithmetic runs over those pairs. Every adjacent-chain repeat is a
    REAL repeat, so ``longest_run_tokens`` is a certified LOWER bound
    (the longest run may use a non-adjacent diagonal the lane cannot
    see), and it is EXACT on the pure-degenerate documents that
    trigger the cap (a single repeated token's longest run lives on
    diagonal 1 = the adjacent pairs). ``n_runs`` in the capped lane
    counts maximal ADJACENT-chain repeats — each is a real repeat, but
    a run the exact lane reports once can split into several
    adjacent-chain islands, so it is a different (per-lane-documented)
    count, not a bound of the exact one.
    Hot-lane rows are flagged ``capped = true``; cold documents keep
    the exact lane — with the guarantee that no (id, gram) join key
    carries more than cap² pairs — and report ``capped = false``. The
    extra ``capped`` column appears ONLY when the cap is set, keeping
    the default schema (and the qs2 oracle) unchanged; default None =
    exact everywhere, the pre-r12 behavior."""
    from pyspark.sql import Window

    min_run = n if min_run_tokens is None else int(min_run_tokens)
    if min_run < n:
        raise ValueError(f"min_run_tokens={min_run} below gram width n={n}")
    small = input_fits_driver(df)
    toks = F.filter(word_tokens(text_col), lambda t: t != "")
    k = F.size(toks) - F.lit(n - 1)
    seq = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # the short-document guard of longest_shared_runs (< n tokens ⇒ no
    # gram; sound because min_run ≥ n)
    seqn = F.when(F.size(toks) >= n, seq)
    tokpos = (
        ensure_min_parallelism(df, id_col)
        .filter(F.col(text_col).rlike(r"\S"))
        .select(F.col(id_col).alias("_id"), seqn.alias("_s"))
        .select("_id", F.posexplode_outer("_s").alias("_p0", "_g"))
        .filter(F.col("_g").isNotNull())
        .select("_id", F.xxhash64("_g").alias("_g"), (F.col("_p0") + 1).alias("_p"))
    )
    tokpos = tracked_persist(pin_corpus_agg(tokpos, small))
    _materialize_together([tokpos])
    exact_pos, hot_ids = tokpos, None
    if hot_gram_cap is not None:
        if hot_gram_cap < 1:
            raise ValueError(f"hot_gram_cap={hot_gram_cap} must be >= 1")
        # documents owning ANY over-cap gram route whole to the hot lane
        hot_ids = (
            tokpos.groupBy("_id", "_g")
            .agg(F.count(F.lit(1)).alias("_m"))
            .filter(F.col("_m") > F.lit(int(hot_gram_cap)))
            .select("_id")
            .distinct()
        )
        hot_ids = tracked_persist(hot_ids)
        n_hot = hot_ids.count()  # barrier: both lanes read it
        exact_pos = tokpos.join(hot_ids, "_id", "left_anti")
    j = (
        exact_pos.select("_id", "_g", F.col("_p").alias("_ps"))
        .join(
            exact_pos.select("_id", "_g", F.col("_p").alias("_pd")),
            ["_id", "_g"],
        )
        .filter(F.col("_pd") > F.col("_ps"))
        .select("_id", "_ps", (F.col("_pd") - F.col("_ps")).alias("_dg"), "_pd")
    )
    if hot_ids is not None and n_hot > 0:
        # adjacent-occurrence pairs: linear in document length, one
        # window sort per (id, gram) — the document's own size bounds
        # the partition, the exact bound tokenization itself already has
        wadj = Window.partitionBy("_id", "_g").orderBy("_p")
        hot_pairs = (
            tokpos.join(broadcast_if_bounded(hot_ids, n_hot), "_id", "left_semi")
            .withColumn("_pd", F.lead("_p").over(wadj))
            .filter(F.col("_pd").isNotNull())
            .select(
                "_id",
                F.col("_p").alias("_ps"),
                (F.col("_pd") - F.col("_p")).alias("_dg"),
                "_pd",
            )
        )
        j = j.unionByName(hot_pairs)
    wrun = Window.partitionBy("_id", "_dg").orderBy("_ps")
    islands = (
        j.withColumn("_k", F.col("_ps") - F.row_number().over(wrun))
        .groupBy("_id", "_dg", "_k")
        .agg(
            (F.count(F.lit(1)) + F.lit(n - 1)).cast("bigint").alias("_run"),
            F.min("_ps").cast("bigint").alias("_s0"),
            F.min("_pd").cast("bigint").alias("_d0"),
        )
        .filter(F.col("_run") >= min_run)
    )
    wbest = Window.partitionBy("_id").orderBy(
        F.col("_run").desc(), F.col("_s0").asc(), F.col("_d0").asc()
    )
    out = (
        islands.withColumn("_rk", F.row_number().over(wbest))
        .groupBy("_id")
        .agg(
            F.max("_run").cast("bigint").alias("longest_run_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.max(F.when(F.col("_rk") == 1, F.col("_s0"))).cast("bigint").alias("src_start"),
            F.max(F.when(F.col("_rk") == 1, F.col("_d0"))).cast("bigint").alias("dst_start"),
        )
    )
    if hot_ids is not None:
        flag = hot_ids.select("_id", F.lit(True).alias("capped"))
        out = out.join(broadcast_if_bounded(flag, n_hot), "_id", "left").withColumn(
            "capped", F.coalesce(F.col("capped"), F.lit(False))
        )
    cols = [
        F.col("_id").alias(id_col),
        "longest_run_tokens",
        "n_runs",
        "src_start",
        "dst_start",
    ]
    if hot_ids is not None:
        cols.append("capped")
    return out.select(*cols).orderBy(id_col)


def excise_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    spans: DataFrame,
    *,
    n: int = 3,
) -> DataFrame:
    """Surgical span EXCISION — the cut that :func:`containment_spans`
    localizes (its docstring promises "cut the span, keep the
    document"; this delivers it): given a spans frame with (dst_id,
    dst_first, dst_last) rows in shingle-sequence coordinates, remove
    the matched token range from each affected document and emit the
    cleaned text. Several spans per document compose as their UNION
    (a token goes if ANY span covers it — no interval-merge pass
    needed: the removed set is one range-predicate join + distinct).

    Coordinates: ``dst_first..dst_last`` are 1-based FIRST-OCCURRENCE
    positions of n-gram shingles, so the covered TOKEN range is
    ``dst_first .. dst_last + n − 1``. The cut operates on the
    NORMALIZED token stream (lowercase, whitespace-collapsed —
    ``dedup.word_tokens``, the domain the offsets are defined in);
    mapping back to raw bytes would need offset-preserving
    tokenization, a declared boundary documented here rather than
    approximated.

    Scale shape: the spans frame is output-grain; documents prune to
    AFFECTED ids via one broadcast semi-join before the token explode
    (match-grain, the containment_spans stance); the removed-position
    set is a hash join on the doc id with a range residual (never a
    theta join); reassembly is one per-doc aggregate whose order comes
    from sorting the (position, token) structs IN-ROW — deterministic
    on any partitioning. Returns (id, n_tokens, n_removed, text_clean)
    for affected documents, ordered by id; n_removed counts tokens,
    text_clean is '' when the spans cover the whole document."""
    sp = spans.select(
        F.col("dst_id").alias("_sid"),
        F.col("dst_first").cast("bigint").alias("_f"),
        (F.col("dst_last").cast("bigint") + F.lit(n - 1)).alias("_l"),
    )
    sp = tracked_persist(sp)
    n_spans = sp.count()  # ids broadcast + range join both read it (barrier stance)
    ids = sp.select(F.col("_sid").alias("_id")).distinct()
    toks = (
        ensure_min_parallelism(df, id_col)
        # broadcast only under the measured span-count bound (ids ≤
        # spans); a huge caller span frame falls back to AQE's choice
        .join(
            broadcast_if_bounded(ids, n_spans),
            F.col(id_col) == F.col("_id"),
            "left_semi",
        )
        # pre-filter + posexplode_outer: the InferFiltersFromGenerate
        # dodge (operators/simjoin.py:766)
        .filter(F.col(text_col).rlike(r"\S"))
        .select(F.col(id_col).alias("_id"), word_tokens(text_col).alias("_tk"))
        .select("_id", F.posexplode_outer("_tk").alias("_p0", "_w"))
        .select("_id", (F.col("_p0") + 1).alias("_i"), "_w")
    )
    toks = tracked_persist(toks)  # the removed join AND the rebuild read it
    removed = (
        toks.join(
            sp,
            (F.col("_id") == F.col("_sid"))
            & (F.col("_i") >= F.col("_f"))
            & (F.col("_i") <= F.col("_l")),
        )
        .select("_id", "_i")
        .distinct()
    )
    kept = toks.join(removed, ["_id", "_i"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_w"))),
                lambda e: e["_w"],
            ),
            " ",
        ).alias("_kept_text"),
        F.count(F.lit(1)).cast("bigint").alias("_n_kept"),
    )
    totals = toks.groupBy("_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce(F.col("_kept_text"), F.lit("")).alias("text_clean"),
        )
        .orderBy(id_col)
    )
