"""Embedding-column preprocessing: normalization, int8 quantization,
matryoshka truncation.

The storage side of similarity search at 100 TB: a float32 embedding
column is usually the widest thing in a training-data table, and the
standard levers are (a) L2-normalize once at ingest so every cosine
downstream is a plain dot product, (b) quantize to int8 (4× smaller, and
the shuffle/scan volume of every dedup & ANN stage shrinks with it),
(c) truncate matryoshka-trained embeddings to a prefix (MRL, Kusupati
et al. '22) for the coarse stages of a cascade.

All three are Arrow-batched or pure-expression — no row-at-a-time
Python. Quantization uses the explicit ``floor(x*scale + 0.5)``
convention rather than a library ``round`` so the DuckDB oracle (q66)
reproduces every code point exactly (banker's rounding differs between
numpy and SQL engines; floor(+0.5) is identical everywhere).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DoubleType,
    StructField,
    StructType,
)


@pandas_udf(ArrayType(DoubleType()))
def _l2_normalize_batch(v: pd.Series) -> pd.Series:
    if len(v) == 0:
        return pd.Series([], dtype=object)
    out = []
    vals = v.to_numpy()
    for x in vals:
        if x is None:
            out.append(None)
            continue
        a = np.asarray(x, dtype=np.float64)
        n = np.sqrt((a * a).sum())
        out.append((a / n).tolist() if n > 0 else a.tolist())
    return pd.Series(out)


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize an array column (zero vectors pass through,
    NULL stays NULL). Normalize once at ingest; cosine becomes dot."""
    return _l2_normalize_batch(vec.cast("array<double>"))


_QUANT_SCHEMA = StructType(
    [
        StructField("q", ArrayType(ByteType())),
        StructField("scale", DoubleType()),
    ]
)


@pandas_udf(_QUANT_SCHEMA)
def _quantize_batch(v: pd.Series) -> pd.DataFrame:
    qs: list = []
    scales: list = []
    for x in v.to_numpy():
        if x is None:
            qs.append(None)
            scales.append(None)
            continue
        a = np.asarray(x, dtype=np.float64)
        amax = np.abs(a).max() if a.size else 0.0
        scale = 127.0 / amax if amax > 0 else 0.0
        q = np.clip(np.floor(a * scale + 0.5), -127, 127).astype(np.int8)
        qs.append(q.tolist())
        scales.append(scale)
    return pd.DataFrame({"q": qs, "scale": scales})


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: returns a struct
    ``(q: array<tinyint>, scale: double)`` with
    ``q[i] = clip(floor(v[i]*scale + 0.5), -127, 127)``,
    ``scale = 127/max|v|``. Dequantize as ``q[i]/scale``. 4× smaller
    than float32 (8× vs the float64 working form), which every
    downstream shuffle and scan inherits."""
    return _quantize_batch(vec.cast("array<double>"))


def truncate_dims(vec: Column, dims: int, *, renormalize: bool = True) -> Column:
    """Matryoshka truncation: keep the first ``dims`` components,
    optionally re-unit-normalizing the prefix (MRL embeddings are
    trained so prefixes remain usable). Pure expressions — ``slice`` +
    an aggregate for the norm; preprocessing is not a hot loop."""
    prefix = F.slice(vec.cast("array<double>"), 1, dims)
    if not renormalize:
        return prefix
    norm = F.sqrt(
        F.aggregate(F.transform(prefix, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return F.when(norm > 0, F.transform(prefix, lambda x: x / norm)).otherwise(prefix)
