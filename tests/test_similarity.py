"""Similarity search: exact brute-force cosine top-k and the IVF
approximate path (recall vs the exact oracle on a separable corpus)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from alaska_etl_spark.operators.similarity import cosine_topk, ivf_topk


def _corpus(spark):
    """Two well-separated clusters around e1 and e2 plus the query ids."""
    rows = []
    for i in range(20):
        eps = (i % 5) * 0.01
        rows.append((i, [1.0, eps, 0.0]))          # cluster A
        rows.append((100 + i, [eps, 1.0, 0.0]))    # cluster B
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_cosine_topk_exact(spark):
    c = _corpus(spark)
    q = c.filter("vec_id = 0")
    out = cosine_topk(c, q, k=3, round_digits=6).collect()
    assert len(out) == 3
    assert [r.rank for r in out] == [1, 2, 3]
    # all neighbors come from cluster A
    assert all(r.neighbor_id < 100 for r in out)
    # rank 1 is the most-aligned other member with smallest id on ties
    assert out[0].cosine <= 1.0 and out[0].cosine > 0.999


def test_cosine_value(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    out = cosine_topk(df, df.filter("vec_id = 0"), k=1, round_digits=6).collect()[0]
    assert abs(out.cosine - round(1 / math.sqrt(2), 6)) < 1e-9


def test_ivf_recall_on_separable_clusters(spark):
    """With clusters this separated, IVF with nprobe=2 of 4 cells must
    recover the exact top-3 for every query."""
    c = _corpus(spark)
    q = c.filter("vec_id in (0, 100)")
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(c, q, k=3, round_digits=6).collect()
    }
    approx = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(c, q, k=3, ncells=4, nprobe=2, round_digits=6).collect()
    }
    hits = sum(1 for k, v in exact.items() if approx.get(k) == v)
    assert hits / len(exact) >= 2 / 3  # recall floor; exact on most seeds


def test_ivf_never_returns_self(spark):
    c = _corpus(spark)
    out = ivf_topk(c, c.filter("vec_id = 0"), k=5, ncells=4, nprobe=4).collect()
    assert all(r.neighbor_id != 0 for r in out)


def test_persisted_ivf_index_prunes_partitions(spark, tmp_path):
    """The serving path: build once, persist partitioned by cell, and a
    search's scan carries a centroid_id partition filter — only probed
    cell directories are read."""
    from alaska_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_search,
        write_ivf_index,
    )

    c = _corpus(spark)
    cents, assigned = build_ivf_index(c, ncells=4)
    path = str(tmp_path / "ivf")
    write_ivf_index(assigned, path)
    assert len(list((tmp_path / "ivf").glob("centroid_id=*"))) == 4

    q = c.filter("vec_id = 0")
    out = ivf_search(spark, cents, path, q, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan.split("PartitionFilters")[1][:200]  # pruned scan
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.neighbor_id < 100 for r in rows)  # cluster-A neighbors

    # parity with the inline ivf_topk at same params
    inline = {(r.rank, r.neighbor_id) for r in ivf_topk(c, q, k=3, ncells=4, nprobe=2).collect()}
    persisted = {(r.rank, r.neighbor_id) for r in rows}
    assert persisted == inline


def test_ivf_build_is_shuffle_free(spark):
    """Scale pin (VERDICT r2 #3): the IVF build must not shuffle.
    Centroid picking plans as TakeOrderedAndProject (per-partition
    heaps, no global sort) and bucket assignment is scan → project →
    ArrowEvalPython argmax — no Exchange in either stage."""
    from alaska_etl_spark.operators.similarity import _centroids, assign_buckets

    c = _corpus(spark)
    cents = _centroids(c, "vec_id", "embedding", 4)
    cents_plan = cents._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in cents_plan
    assert "Exchange" not in cents_plan

    assigned = assign_buckets(c, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan and "Window" not in plan


def test_assign_buckets_nearest_and_tiebreak(spark):
    """Every vector lands in its max-cosine cell; NULL and zero-norm
    vectors deterministically land in the smallest centroid_id."""
    from alaska_etl_spark.operators.similarity import assign_buckets

    cents = spark.createDataFrame(
        [(10, [1.0, 0.0]), (2, [0.0, 1.0])],
        "centroid_id bigint, centroid array<double>",
    )
    vecs = spark.createDataFrame(
        [(0, [0.9, 0.1]), (1, [0.1, 0.9]), (2, [0.0, 0.0]), (3, None)],
        "vec_id bigint, embedding array<double>",
    )
    got = {r.vec_id: r.centroid_id for r in assign_buckets(vecs, cents).collect()}
    assert got == {0: 10, 1: 2, 2: 2, 3: 2}  # 2 is the smallest centroid_id


def test_lsh_topk_recall_vs_exact(spark):
    """Sign-LSH ANN recall floor against brute-force cosine (q27's
    operator) on the clustered corpus: rank-1 neighbors live in the same
    LSH bucket for most queries at 6 planes."""
    from alaska_etl_spark.operators.similarity import lsh_topk

    c = _corpus(spark)
    q = c.filter("vec_id < 5")
    exact = {r.query_id: r.neighbor_id for r in cosine_topk(c, q, k=1).collect()}
    approx = {
        r.query_id: r.neighbor_id
        for r in lsh_topk(c, q, k=1, n_planes=6, dim=3).collect()
    }
    hits = sum(1 for k, v in exact.items() if approx.get(k) == v)
    assert hits / len(exact) >= 3 / 5


def test_lsh_topk_requires_dim(spark):
    import pytest as _pytest

    from alaska_etl_spark.operators.similarity import lsh_topk

    c = _corpus(spark)
    with _pytest.raises(ValueError, match="dim"):
        lsh_topk(c, c, k=1)


def test_cosine_sim_null_for_zero_norm(spark):
    """Vectorized cosine keeps the expression contract: zero-norm and
    NULL vectors yield NULL (not NaN — NaN sorts FIRST descending)."""
    from alaska_etl_spark.operators.similarity import cosine_sim

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], [1.0, 0.0]),
            (1, [0.0, 0.0], [1.0, 0.0]),
            (2, None, [1.0, 0.0]),
        ],
        "i int, a array<double>, b array<double>",
    )
    rows = {r.i: r.c for r in df.select("i", cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()}
    assert rows[0] == 1.0
    assert rows[1] is None and rows[2] is None


def test_kmeans_refine_moves_centroids_to_cluster_means(spark):
    """Two tight planted clusters, seed centroids off-center: one Lloyd
    round lands each centroid on its cluster mean and assignment recall
    becomes perfect."""
    import numpy as np

    from alaska_etl_spark.operators.similarity import assign_buckets, kmeans_refine

    a = [[10.0 + dx, 0.0] for dx in range(5)]          # cluster around (12, 0)
    b = [[0.0, 20.0 + dy] for dy in range(5)]          # cluster around (0, 22)
    rows = [(i, v) for i, v in enumerate(a + b)]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.1]), (1, [0.1, 1.0])], "centroid_id bigint, centroid array<double>"
    )
    refined = kmeans_refine(corpus, seeds, iters=2)
    got = {r.centroid_id: r.centroid for r in refined.collect()}
    assert np.allclose(got[0], [12.0, 0.0])
    assert np.allclose(got[1], [0.0, 22.0])
    assigned = assign_buckets(corpus, refined)
    labels = {r.vec_id: r.centroid_id for r in assigned.collect()}
    assert all(labels[i] == 0 for i in range(5))
    assert all(labels[i] == 1 for i in range(5, 10))


def test_kmeans_refine_keeps_empty_cells(spark):
    from alaska_etl_spark.operators.similarity import kmeans_refine

    corpus = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(6)], "vec_id bigint, embedding array<double>"
    )
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0]), (7, [-5.0, -5.0])], "centroid_id bigint, centroid array<double>"
    )
    refined = {r.centroid_id: r.centroid for r in kmeans_refine(corpus, seeds, iters=1).collect()}
    assert refined[0] == [1.0, 0.0]
    assert refined[7] == [-5.0, -5.0]  # empty cell unchanged


# ---------------------------------------------------------------------------
# Product quantization (ADC search over the compressed corpus)
# ---------------------------------------------------------------------------


def _pq_corpus(spark):
    """Two well-separated 4-dim clusters (around e1 and e3) sized so
    every subspace has structure for the m=2 codebooks to learn."""
    rows = []
    for i in range(20):
        eps = (i % 5) * 0.01
        rows.append((i, [1.0, eps, 0.0, 0.0]))          # cluster A
        rows.append((100 + i, [0.0, 0.0, 1.0, eps]))    # cluster B
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_pq_train_requires_dim(spark):
    import pytest as _pytest

    from alaska_etl_spark.operators.similarity import pq_train

    c = _pq_corpus(spark)
    with _pytest.raises(ValueError, match="dim"):
        pq_train(c, m=2, k=4)


def test_pq_train_codebook_shape_and_determinism(spark):
    import numpy as np

    from alaska_etl_spark.operators.similarity import pq_train

    c = _pq_corpus(spark)
    b1 = pq_train(c, m=2, k=4, dim=4, iters=2)
    b2 = pq_train(c, m=2, k=4, dim=4, iters=2)
    assert b1.shape == (2, 4, 2)
    assert np.array_equal(b1, b2)  # seeded from smallest ids → reproducible


def test_pq_train_lloyd_reduces_quantization_error(spark):
    """Trained codebooks must reconstruct the corpus at least as well as
    the raw id-ordered seeds (Lloyd never increases total distortion)."""
    import numpy as np

    from alaska_etl_spark.operators.similarity import pq_train

    c = _pq_corpus(spark)
    vecs = np.stack(
        [np.asarray(r.embedding) for r in c.orderBy("vec_id").collect()]
    )

    def distortion(books):
        m, k, dsub = books.shape
        xs = vecs.reshape(len(vecs), m, dsub)
        total = 0.0
        for j in range(m):
            d2 = ((xs[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            total += d2.min(axis=1).sum()
        return total

    seed_books = pq_train(c, m=2, k=4, dim=4, iters=0)
    trained = pq_train(c, m=2, k=4, dim=4, iters=2)
    assert distortion(trained) <= distortion(seed_books) + 1e-12


def test_pq_encode_codes_and_narrow_plan(spark):
    """Codes are m ints in [0, k); encoding is a zero-shuffle narrow
    projection (scan → ArrowEvalPython, no Exchange/Join/Window) — the
    same scale pin as the IVF build."""
    from alaska_etl_spark.operators.similarity import pq_encode, pq_train

    c = _pq_corpus(spark)
    books = pq_train(c, m=2, k=4, dim=4, iters=1)
    coded = pq_encode(c, books)
    plan = coded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan and "Window" not in plan
    rows = coded.collect()
    assert len(rows) == 40
    assert all(len(r.pq_code) == 2 for r in rows)
    assert all(0 <= code < 4 for r in rows for code in r.pq_code)
    # identical vectors quantize to identical code words
    by_vec = {}
    for r in c.collect():
        by_vec.setdefault(tuple(r.embedding), set())
    coded_by_id = {r.vec_id: tuple(r.pq_code) for r in rows}
    for r in c.collect():
        by_vec[tuple(r.embedding)].add(coded_by_id[r.vec_id])
    assert all(len(codes) == 1 for codes in by_vec.values())


def test_pq_topk_cluster_recall_and_shape(spark):
    """ADC search from the compressed corpus keeps cluster structure:
    every top-3 neighbor of a cluster-A query is a cluster-A member,
    self is excluded, ranks are 1..k ascending by adist."""
    from alaska_etl_spark.operators.similarity import pq_encode, pq_topk, pq_train

    c = _pq_corpus(spark)
    books = pq_train(c, m=2, k=4, dim=4, iters=2)
    codes = pq_encode(c, books)
    q = c.filter("vec_id in (0, 100)")
    out = pq_topk(codes, q, books, k=3).collect()
    assert len(out) == 6
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3]
        assert all(r.neighbor_id != qid for r in rows)
        adists = [r.adist for r in rows]
        assert adists == sorted(adists)
        if qid == 0:
            assert all(r.neighbor_id < 100 for r in rows)
        else:
            assert all(r.neighbor_id >= 100 for r in rows)


def test_ivf_topk_single_pass_plan(spark):
    """Scale pin for the ad-hoc IVF path: ONE narrow MapInPandas over
    the corpus and ONE Exchange (the candidate top-k window) — no join,
    no assignment shuffle, no chained Python stages."""
    c = _corpus(spark)
    q = c.filter("vec_id in (0, 100)")
    out = ivf_topk(c, q, k=3, ncells=4, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert plan.count("ArrowEvalPython") == 0
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert "WindowGroupLimit" in plan  # partial top-k stays map-side


def test_ivfpq_cluster_recall_shape_and_plan(spark):
    """IVF-PQ composition: probed-cell candidates only, ADC order kept
    within clusters (same purity contract as pq_topk — positional
    parity with the exact path is not promised under residual
    quantization), one Exchange for the top-k window."""
    from alaska_etl_spark.operators.similarity import ivfpq_topk

    c = _pq_corpus(spark)
    q = c.filter("vec_id in (0, 100)")
    out_df = ivfpq_topk(c, q, ncells=4, nprobe=2, m=2, kcode=4, dim=4, iters=1, k=3)
    out = out_df.collect()
    assert len(out) == 6
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3]
        assert all(r.neighbor_id != qid for r in rows)
        adists = [r.adist for r in rows]
        assert adists == sorted(adists)
        if qid == 0:
            assert all(r.neighbor_id < 100 for r in rows)
        else:
            assert all(r.neighbor_id >= 100 for r in rows)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan  # partial top-k stays map-side


def test_hard_negative_topk_excludes_same_label(spark):
    """Nearest different-label vectors win; same-label candidates never
    appear no matter how close."""
    from alaska_etl_spark.operators.similarity import hard_negative_topk

    rows = [
        # label 0 cluster near (1, 0); label 1 cluster near (0, 1)
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.14], 0),     # same label as query 0 — must be excluded
        (2, [0.8, 0.6], 1),       # closest different-label
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")
    out = hard_negative_topk(
        df, df.filter("vec_id = 0"), k=3, round_digits=4
    ).collect()
    assert [r.neighbor_id for r in out] == [2, 3, 4]
    assert all(r.query_label == 0 and r.neighbor_label == 1 for r in out)
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].cosine > out[1].cosine > out[2].cosine


def test_margin_bitext_pairs(spark):
    """Margin mining (LASER/CCMatrix): a planted aligned pair (near-
    identical vectors across the two sides) survives the margin filter;
    a vector sitting inside a dense clique of equally-similar neighbors
    has margin ~1 and is cut by a higher threshold."""
    from alaska_etl_spark.operators.similarity import margin_bitext_pairs

    def v(*xs):
        return [float(x) for x in xs] + [0.0] * (8 - len(xs))

    x_rows = [
        (0, v(1, 0, 0)),          # aligned with y=1
        (2, v(0, 1, 1)),          # hub: equally close to y=3, y=5
    ]
    y_rows = [
        (1, v(0.99, 0.1, 0)),     # x=0's partner
        (3, v(0, 1, 0.9)),
        (5, v(0, 0.9, 1)),
    ]
    x = spark.createDataFrame(x_rows, "vec_id bigint, embedding array<double>")
    y = spark.createDataFrame(y_rows, "vec_id bigint, embedding array<double>")
    got = {
        r.x_id: (r.y_id, r.margin)
        for r in margin_bitext_pairs(x, y, k=2, margin_threshold=1.0).collect()
    }
    assert got[0][0] == 1          # aligned pair found
    assert got[0][1] > got[2][1]   # aligned margin beats hub margin
    strict = {
        r.x_id
        for r in margin_bitext_pairs(x, y, k=2, margin_threshold=float(got[2][1]) + 0.01).collect()
    }
    assert 0 in strict and 2 not in strict


def test_cosine_topk_arrow_matches_window_form(spark):
    """cosine_topk_arrow (per-batch matmul + candidate window) is
    bit-identical to cosine_topk (broadcast join + full window) — the
    per-batch top-k prune is exact under the shared total order."""
    import random

    from alaska_etl_spark.operators.similarity import cosine_topk, cosine_topk_arrow

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(16)]) for i in range(200)
    ]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    queries = corpus.filter("vec_id % 10 = 0")
    for include_self in (False, True):
        a = {
            (r.query_id, r.rank): (r.neighbor_id, r.cosine)
            for r in cosine_topk_arrow(
                corpus, queries, k=5, include_self=include_self
            ).collect()
        }
        b = {
            (r.query_id, r.rank): (r.neighbor_id, r.cosine)
            for r in cosine_topk(
                corpus, queries, k=5, include_self=include_self
            ).collect()
        }
        assert a == b, include_self


# --- cosine_topk_arrow edge contracts (ADVICE r5) ---------------------------


def test_cosine_topk_arrow_query_side_guards(spark):
    import pytest

    from alaska_etl_spark.operators.similarity import cosine_topk_arrow

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    # empty query side: typed empty result, no jobs
    empty_q = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = cosine_topk_arrow(corpus, empty_q)
    assert out.count() == 0
    assert out.schema.simpleString() == (
        "struct<query_id:bigint,neighbor_id:bigint,cosine:double,rank:int>"
    )
    # mixed null query: zero-vector substitution -> cosine 0.0 everywhere
    q = spark.createDataFrame(
        [(8, [1.0, 0.0]), (9, None)], "vec_id bigint, embedding array<double>"
    )
    rows = {
        (r.query_id, r.rank): r for r in cosine_topk_arrow(corpus, q, k=2).collect()
    }
    assert rows[(9, 1)].cosine == 0.0 and rows[(9, 2)].cosine == 0.0
    assert rows[(8, 1)].neighbor_id == 1 and rows[(8, 1)].cosine == 1.0
    # int32 ids preserved in the output schema
    c32 = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id int, embedding array<double>")
    q32 = spark.createDataFrame([(2, [1.0, 0.0])], "vec_id int, embedding array<double>")
    out32 = cosine_topk_arrow(c32, q32, k=1)
    assert "query_id:int,neighbor_id:int" in out32.schema.simpleString()
    # ragged query dims / non-integral ids raise
    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        cosine_topk_arrow(corpus, ragged)
    sid = spark.createDataFrame([("a", [1.0, 0.0])], "vec_id string, embedding array<double>")
    with pytest.raises(ValueError, match="integral"):
        cosine_topk_arrow(corpus, sid)


def test_arrow_paths_enforce_driver_collect_cap(spark):
    """The driver-collect contract is enforced (VERDICT r6 #2): a
    query/x side past max_query_rows raises pointing at ivf_topk
    instead of silently materializing a corpus on the driver; at or
    under the cap results are unchanged."""
    import pytest

    from alaska_etl_spark.operators.similarity import (
        bitext_topk_pair,
        cosine_topk_arrow,
        margin_bitext_pairs,
    )

    rows = [(i, [1.0 * (i % 3), 1.0]) for i in range(12)]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="ivf_topk"):
        cosine_topk_arrow(corpus, corpus, max_query_rows=5)
    with pytest.raises(ValueError, match="ivf_topk"):
        bitext_topk_pair(corpus, corpus, max_query_rows=5)
    with pytest.raises(ValueError, match="ivf_topk"):
        margin_bitext_pairs(corpus, corpus, max_query_rows=5).collect()
    # at-the-cap passes and is identical to the unguarded default
    q = corpus.limit(5)
    base = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk_arrow(corpus, q, k=3).collect()
    }
    capped = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk_arrow(corpus, q, k=3, max_query_rows=5).collect()
    }
    assert base == capped and len(base) > 0


def test_cosine_topk_arrow_matches_cosine_topk_exactly(spark):
    """The Arrow-matmul form and the broadcast-join form share one
    rounding protocol (half-away-from-zero at 4dp, ADVICE r5): on a
    deterministic varied fixture the two return IDENTICAL
    (query, rank) -> (neighbor, cosine) maps."""
    from alaska_etl_spark.operators.similarity import cosine_topk, cosine_topk_arrow

    rows = []
    state = 7
    for i in range(40):
        vec = []
        for _ in range(8):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            vec.append(((state >> 20) % 2001) / 1000.0 - 1.0)
        rows.append((i, vec))
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    queries = corpus.limit(6)
    a = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    b = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in cosine_topk_arrow(corpus, queries, k=5).collect()
    }
    assert a == b


def test_kmeans_replicable_empty_cell_keeps_previous_centroid(spark):
    from alaska_etl_spark.operators.similarity import kmeans_replicable

    # v1 duplicates v0: assigning v1 ties between c0 (=v0) and c1 (=v1)
    # at rounded cosine 1.0 and breaks to the SMALLEST centroid_id, so
    # cell 1 goes empty and must keep its init centroid verbatim
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    cents = {
        r.centroid_id: list(r.centroid)
        for r in kmeans_replicable(corpus, k=2, iters=2).collect()
    }
    # iteration 1: ALL vectors tie-break into cell 0 (v2's cosine is 0
    # to both centroids), so cell 1 goes EMPTY and must keep its init
    # centroid [1,0] — which is exactly what lets iteration 2 win v0/v1
    # back (cos 1.0 vs 0.894 against the drifted c0) and leaves v2 as
    # cell 0's sole member
    assert cents[1] == [1.0, 0.0]
    assert cents[0] == [0.0, 1.0]


def test_kmeans_summary_matches_numpy_replica(spark):
    import numpy as np

    from alaska_etl_spark.operators.similarity import kmeans_summary

    rows = []
    state = 11
    for i in range(60):
        vec = []
        for _ in range(8):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            vec.append(((state >> 20) % 2001) / 1000.0 - 1.0)
        rows.append((i, vec))
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        r.centroid_id: (r.n_members, r.avg_cosine)
        for r in kmeans_summary(corpus, k=4, iters=2).collect()
    }

    # pure-numpy replica of the replicable protocol
    X = np.array([v for _, v in rows], dtype=np.float64)
    cents = {c: X[c].copy() for c in range(4)}

    def assign(C_ids):
        C = np.stack([cents[c] for c in C_ids])
        sims = (X @ C.T) / np.outer(
            np.sqrt((X * X).sum(1)), np.sqrt((C * C).sum(1))
        )
        sims = np.round(sims, 6)
        return np.array([C_ids[j] for j in np.argmax(sims, axis=1)])

    ids = sorted(cents)
    for _ in range(2):
        a = assign(ids)
        for c in ids:
            members = X[a == c]
            if len(members):
                micros = np.round(members * 1e6).astype(np.int64)
                cents[c] = micros.sum(0) / (len(members) * 1e6)
    a = assign(ids)
    want = {}
    for c in ids:
        members = X[a == c]
        if not len(members):
            continue
        C = cents[c]
        cos = (members @ C) / (
            np.sqrt((members * members).sum(1)) * np.sqrt(C @ C)
        )
        micros = np.round(cos * 1e6).astype(np.int64)
        want[c] = (len(members), micros.sum() / (len(members) * 1e6))
    assert set(got) == set(want)
    for c in want:
        assert got[c][0] == want[c][0]
        assert abs(got[c][1] - want[c][1]) < 2e-6


def test_cluster_separation_reconciles_with_summary(spark):
    """Membership counts match kmeans_summary, avg_best matches its
    avg_cosine (same protocol), and margins are non-negative (best is
    best by construction)."""
    from alaska_etl_spark.operators.similarity import (
        cluster_separation,
        kmeans_summary,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(0.1, 1.0) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    sep = {r.centroid_id: r for r in cluster_separation(df, k=4, iters=2).collect()}
    summ = {r.centroid_id: r for r in kmeans_summary(df, k=4, iters=2).collect()}
    assert set(sep) == set(summ)
    assert sum(r.n_members for r in sep.values()) == 60
    for cid, r in sep.items():
        assert r.n_members == summ[cid].n_members
        assert abs(r.avg_best - summ[cid].avg_cosine) < 1e-9
        assert r.avg_margin >= 0.0
