"""BPE (byte-pair encoding) vocabulary training — the tokenizer-training
operator of an LLM data pipeline, Spark-first.

The scale structure (the trick that makes distributed BPE cheap): the
corpus is reduced ONCE to the distinct-word frequency table — one
corpus-sized shuffle, |vocab| rows out — and every merge iteration runs
on that table, never the corpus (Sennrich'16 trains on exactly this
word-frequency dict). At 100 TB the word table is MBs; iterations are
vocabulary-sized jobs whose only driver traffic is the argmax pair
(a single row per round).

Determinism: pair counts are exact integers (sum of word frequencies);
the merge chosen each round is max by (count DESC, left ASC, right ASC)
— a total order, so the learned merge list is byte-identical on any
engine, partitioning, or cluster size. No oracle SQL exists for the
query form (an iterative re-segmentation has no fixed-depth relational
replay — same boundary as q29's xxhash64); instead the merge list is
pinned against a pure-Python BPE replica in tests/test_bpe.py, on both
synthetic corpora and the real documents fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alaska_etl_spark.functions.localrel import local_df


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — the ONE corpus-sized reduction."""
    return (
        df.select(
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_expr(left: str, right: str):
    """Fold a symbol array, replacing every adjacent (left, right) with
    the concatenation — the leftmost-first, non-overlapping semantics of
    reference BPE (a merged token cannot re-pair with the following
    symbol in the same round). HOF lambdas run interpreted, which is
    fine HERE: the fold touches |vocab| rows, not the corpus."""
    merged = left + right
    return F.aggregate(
        F.col("syms"),
        F.struct(
            F.lit([]).cast("array<string>").alias("out"),
            F.lit(False).alias("carry"),
        ),
        lambda acc, s: F.struct(
            F.when(
                acc["carry"] & (s == F.lit(right)),
                F.concat(F.slice(acc["out"], 1, F.size(acc["out"]) - 1),
                         F.array(F.lit(merged))),
            )
            .otherwise(F.concat(acc["out"], F.array(s)))
            .alias("out"),
            # a fresh `left` opens a merge window UNLESS we just merged
            # into `merged` == `left` (no overlapping re-merge this round)
            F.when(
                acc["carry"] & (s == F.lit(right)), F.lit(merged == left)
            )
            .otherwise(s == F.lit(left))
            .alias("carry"),
        ),
        lambda acc: acc["out"],
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int = 50,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge table (step, left, right, merged, pair_count).

    Each round: posexplode the word table's symbol arrays, window-lead
    to adjacent pairs, sum word frequencies per pair (all
    vocabulary-sized), TakeOrdered the single best pair to the driver
    (count DESC, left ASC, right ASC), then fold-merge it into the
    symbol arrays. The word table is localCheckpoint'ed every
    ``checkpoint_every`` rounds to pin plan depth (the
    connected-components pattern; use reliable checkpoint() on a real
    cluster for executor-loss recovery).
    """
    spark = df.sparkSession
    words = _word_freqs(df, text_col).select(
        F.split(F.col("word"), "").alias("syms"), "freq"
    )
    words = words.localCheckpoint()

    merges = []
    for step in range(1, num_merges + 1):
        pairs = (
            words.select(
                F.posexplode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("_i", "p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()).take(1)
        if not top or top[0].cnt < 2:
            break
        left, right, cnt = top[0].l, top[0].r, top[0].cnt
        merges.append((step, left, right, left + right, cnt))
        words = words.select(_merge_pair_expr(left, right).alias("syms"), "freq")
        if step % checkpoint_every == 0:
            words = words.localCheckpoint()

    return local_df(
        spark, merges, "step int, left string, right string, merged string, pair_count bigint"
    )


def bpe_segment(df: DataFrame, id_col: str, text_col: str, merges: list) -> DataFrame:
    """Apply a learned merge list to a corpus: (id, tokens array, n_tokens).
    Merges replay in training order — the defining BPE property — as a
    chain of vocabulary-bounded folds per word. Corpus-sized but narrow:
    no shuffle at all; each row segments independently."""
    out = df.select(
        F.col(id_col),
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "").alias(
            "_words"
        ),
    ).select(
        F.col(id_col),
        F.transform(F.col("_words"), lambda w: F.split(w, "")).alias("_seqs"),
    )
    # explode to words so each fold's HOF depth stays per-word
    out = out.select(F.col(id_col), F.posexplode("_seqs").alias("_pos", "syms"))
    for left, right, _merged in [(m[1], m[2], m[3]) for m in merges]:
        out = out.select(
            F.col(id_col), "_pos", _merge_pair_expr(left, right).alias("syms")
        )
    seg = out.groupBy(id_col).agg(
        F.flatten(F.array_sort(F.collect_list(F.struct("_pos", "syms")))["syms"]).alias(
            "tokens"
        )
    )
    # left-join back to the full id set: posexplode over a zero-token
    # doc emits no rows, which silently dropped the doc from the output
    # (ADVICE r4) — re-attach with tokens=[] / n_tokens=0, same contract
    # as the LM scorer's base join
    return (
        df.select(F.col(id_col))
        .join(seg, id_col, "left")
        .select(
            id_col,
            F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
            F.coalesce(F.size("tokens"), F.lit(0)).alias("n_tokens"),
        )
    )
