"""Engine operators beyond vanilla DataFrame verbs.

- dedup: exact + deterministic keep-first + MinHash-LSH / SimHash /
  n-gram-Jaccard / embedding-cosine near-duplicate detection
- asof: as-of join (latest snapshot ≤ event time) via window functions
- similarity: cosine top-k search (brute force + LSH-bucketed ANN)
- text: language ID, quality scoring, token counts, fingerprints
- multimodal: binary-column plumbing for image/audio payloads
"""

from alaska_etl_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    dedup_keep_first,
    duplicate_report,
    minhash_near_dup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
    embedding_near_dup_pairs,
)
from alaska_etl_spark.operators.asof import asof_join  # noqa: F401
