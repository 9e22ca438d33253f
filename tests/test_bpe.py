"""BPE training/segmentation vs a pure-Python reference replica.

The replica implements textbook Sennrich'16 BPE over a word-frequency
dict: count adjacent symbol pairs weighted by word freq, merge the max
pair (count desc, pair lexicographic), leftmost-first non-overlapping.
"""
from collections import Counter

def _py_bpe(texts, num_merges):
    freqs = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                freqs[w] += 1
    words = {w: list(w) for w in freqs}
    merges = []
    for step in range(1, num_merges + 1):
        counts = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freqs[w]
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((step, l, r, l + r, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


CORPUS = [
    "low lower lowest low low",
    "newer newest new new newer",
    "wider wide widest wider",
    "low new wide lower",
]


def test_train_bpe_matches_python_replica(spark):
    from alaska_etl_spark.operators.bpe import train_bpe

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in train_bpe(df, "text", num_merges=12).orderBy("step").collect()
    ]
    want, _ = _py_bpe(CORPUS, 12)
    assert got == want
    assert len(got) >= 5  # the corpus supports a non-trivial merge chain


def test_train_bpe_on_documents_fixture(spark):
    """Real testdata: the learned merge list equals the replica's on the
    sf0.001 documents table (full determinism end-to-end)."""
    from alaska_etl_spark.operators.bpe import train_bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in train_bpe(docs, "text", num_merges=8).orderBy("step").collect()
    ]
    want, _ = _py_bpe(texts, 8)
    assert got == want


def test_bpe_segment_matches_replica_segmentation(spark):
    from alaska_etl_spark.operators.bpe import bpe_segment, train_bpe

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )
    merges = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in train_bpe(df, "text", num_merges=10).orderBy("step").collect()
    ]
    seg = {
        r.doc_id: (list(r.tokens), r.n_tokens)
        for r in bpe_segment(df, "doc_id", "text", merges).collect()
    }
    _, words = _py_bpe(CORPUS, 10)
    for i, t in enumerate(CORPUS):
        want = [tok for w in t.lower().split() for tok in words[w]]
        assert seg[i] == (want, len(want)), i
