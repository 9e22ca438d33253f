"""Bloom-filter join pruning: drop fact rows that cannot join BEFORE
the shuffle.

The 100 TB problem: ``fact ⋈ dim`` where dim is too large to broadcast
(so the join must shuffle both sides) but the join is selective — most
fact rows match nothing. Shuffling the non-matching rows is pure waste.
A Bloom filter of the dim keys is kilobytes-to-megabytes regardless of
dim's row width, ships to every task, and filters the fact *in the scan
stage*, so the exchange only carries rows that might match. No false
negatives (pruning never changes the join result); false positives only
cost shuffle bytes, tuned by sizing ``m_bits``.

Spark has this as an optimizer rule (`spark.sql.optimizer.runtime.
bloomFilter.enabled`, injecting `BloomFilterAggregate`/`might_contain`
around shuffle joins); this operator is the explicit, composable form —
usable where the rule doesn't fire (e.g. the build side behind a
mapInPandas, a pre-filter persisted across many queries, or a stream).

Layout: positions are computed JVM-side with ``xxhash64(i, key)`` (one
whole-stage-codegen projection, engine-native 64-bit xxHash); only the
membership test against the bit array runs in an Arrow-batched
pandas_udf (numpy gather over a shared ndarray — no per-row Python).
The bit array itself is built from the collected position set: bounded
by design at ``n_hashes · |dim keys|`` ints, the same driver envelope
as broadcasting the dim's keys would need, but the ARRAY shipped to
executors is m_bits/8 bytes however many keys went in.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

__all__ = ["bloom_params", "build_bloom", "bloom_prune", "bloom_pruned_semi_join"]


def bloom_params(n_keys: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, n_hashes) for ``n_keys`` at false-positive rate
    ``fpp``: m = -n·ln p / ln²2, k = (m/n)·ln 2 — the standard sizing."""
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round((m / max(1, n_keys)) * math.log(2)))
    return m, k


def _positions(col: Column, *, m_bits: int, n_hashes: int) -> Column:
    """The ``n_hashes`` bit positions of a key, as an array column —
    xxhash64 seeded by the hash index, codegen throughout."""
    return F.array(
        *[F.pmod(F.xxhash64(F.lit(i), col), F.lit(m_bits)) for i in range(n_hashes)]
    )


def build_bloom(
    keys: DataFrame, col: str, *, m_bits: int, n_hashes: int
) -> np.ndarray:
    """Build the bit array from the build side's keys: one distributed
    projection to positions, one distinct, one bounded collect (at most
    min(m_bits, n_hashes·|keys|) ints). Returns a packed uint8 array of
    m_bits/8 bytes."""
    pos_rows = (
        keys.select(
            F.explode(_positions(F.col(col), m_bits=m_bits, n_hashes=n_hashes)).alias(
                "p"
            )
        )
        .distinct()
        .collect()
    )
    bits = np.zeros(m_bits, dtype=bool)
    bits[[r.p for r in pos_rows]] = True
    return np.packbits(bits)


def bloom_prune(
    fact: DataFrame,
    packed_bits: np.ndarray,
    col: str,
    *,
    m_bits: int,
    n_hashes: int,
) -> DataFrame:
    """Rows of ``fact`` whose key MIGHT be in the filter — a superset of
    the true matches (no false negatives: every inserted key sets
    exactly the bits the probe checks). The packed array rides the
    pandas_udf closure (one copy per executor, m_bits/8 bytes)."""
    bits = np.unpackbits(packed_bits).astype(bool)

    @pandas_udf(BooleanType())
    def _might_contain(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype="bool")
        arr = np.stack(pos.to_numpy())  # batch × n_hashes
        return pd.Series(bits[arr].all(axis=1))

    return fact.withColumn(
        "_bf_pos", _positions(F.col(col), m_bits=m_bits, n_hashes=n_hashes)
    ).filter(_might_contain(F.col("_bf_pos"))).drop("_bf_pos")


def bloom_pruned_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    col: str,
    *,
    fpp: float = 0.01,
    n_keys_hint: int | None = None,
) -> DataFrame:
    """LEFT SEMI join with a Bloom pre-filter on the fact side: the
    result is IDENTICAL to ``fact ⋈semi dim`` (false positives are
    removed by the exact join; false negatives don't exist), but the
    exchange under the join only carries rows that passed the filter.
    ``n_keys_hint`` sizes the filter without a counting job; when
    omitted, one count runs on the (small) build side."""
    n = n_keys_hint if n_keys_hint is not None else dim_keys.count()
    m_bits, n_hashes = bloom_params(n, fpp)
    packed = build_bloom(dim_keys, col, m_bits=m_bits, n_hashes=n_hashes)
    pruned = bloom_prune(fact, packed, col, m_bits=m_bits, n_hashes=n_hashes)
    return pruned.join(dim_keys.select(col), [col], "left_semi")
