"""All-pairs sparse cosine similarity join (operators/simjoin.py):
hand-computed scores, max_df pruning monotonicity, and the
inverted-index plan shape (no cross join)."""

from __future__ import annotations

import math

from alaska_etl_spark.operators.simjoin import cosine_similarity_join, ngram_tf


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_hand_computed_cosine(spark):
    # unigrams (n=1) for hand math: a={x:2, y:1}, b={x:1, y:1}
    df = _docs(spark, [("a", "x x y"), ("b", "x y")])
    out = cosine_similarity_join(df, "doc_id", "text", n=1, threshold=0.0)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    want = round(3 / math.sqrt(5 * 2), 4)  # (2*1 + 1*1) / (sqrt(5)*sqrt(2))
    assert (r.id_a, r.id_b) == ("a", "b")
    assert r.cosine == want


def test_identical_docs_score_one_and_disjoint_never_pair(spark):
    df = _docs(
        spark,
        [
            ("a", "the quick brown fox jumps"),
            ("b", "the quick brown fox jumps"),
            ("c", "entirely different words here now"),
        ],
    )
    out = cosine_similarity_join(df, "doc_id", "text", n=3, threshold=0.0)
    got = {(r.id_a, r.id_b): r.cosine for r in out.collect()}
    # disjoint docs never meet in the inverted index — no (a,c)/(b,c) row
    assert set(got) == {("a", "b")}
    assert got[("a", "b")] == 1.0


def test_short_doc_whole_text_gram(spark):
    # both docs shorter than n: each contributes one whole-text gram
    df = _docs(spark, [("a", "hi there"), ("b", "hi there"), ("c", "bye")])
    out = cosine_similarity_join(df, "doc_id", "text", n=3, threshold=0.0)
    got = {(r.id_a, r.id_b): r.cosine for r in out.collect()}
    assert got == {("a", "b"): 1.0}


def test_max_df_prunes_hot_grams_scores_only_shrink(spark):
    # 'x' appears in all 4 docs (df=4); 'y z w' only in a and b.
    rows = [
        ("a", "x y z w"),
        ("b", "x y z w"),
        ("c", "x p q r"),
        ("d", "x s t u"),
    ]
    df = _docs(spark, rows)
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_similarity_join(df, "doc_id", "text", n=1, threshold=0.0).collect()
    }
    pruned = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_similarity_join(
            df, "doc_id", "text", n=1, threshold=0.0, max_df=3
        ).collect()
    }
    # hot gram dropped: every surviving pair's score <= exact score
    assert set(pruned) <= set(exact)
    for pair, score in pruned.items():
        assert score <= exact[pair]
    # (a,b) still found — their similarity mass is in rare grams
    assert ("a", "b") in pruned


def test_ngram_tf_counts_multiplicity(spark):
    df = _docs(spark, [("a", "x x x")])
    rows = {(r._g, r._tf) for r in ngram_tf(df, "doc_id", "text", n=1).collect()}
    assert rows == {("x", 3)}


def test_no_cartesian_in_plan(spark):
    df = _docs(spark, [("a", "x y"), ("b", "y z"), ("c", "p q")])
    out = cosine_similarity_join(df, "doc_id", "text", n=1, threshold=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- prefix-filtered exact Jaccard join -------------------------------------


def _brute_jaccard(rows, n=1, tau=0.5):
    def sh(text):
        toks = [t for t in text.lower().split() if t]
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    out = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            a, b = sh(ta), sh(tb)
            np_, nq = len(a & b), len(a | b)
            if nq and np_ / nq >= tau:
                lo, hi = sorted([ia, ib])
                out[(lo, hi)] = (20000 * np_ + nq) // (2 * nq) / 10000.0
    return out


def test_jaccard_join_matches_brute_force(spark):
    from alaska_etl_spark.operators.simjoin import jaccard_similarity_join

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy cat"),
        ("c", "a completely different sentence entirely here now"),
        ("d", "the quick brown fox jumps over the lazy dog"),  # exact dup of a
        ("e", "quick brown fox"),
        ("f", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_similarity_join(
            df, "doc_id", "text", n=1, threshold_num=1, threshold_den=2
        ).collect()
    }
    assert got == _brute_jaccard(rows, n=1, tau=0.5)
    assert got[("a", "d")] == 1.0  # exact duplicates score exactly 1


def test_jaccard_join_high_threshold_and_trigram(spark):
    from alaska_etl_spark.operators.simjoin import jaccard_similarity_join

    # tau=0.7 (num=7, den=10): a/b differ in the LAST token only, so of
    # the 8 distinct 3-grams they share 7 (J = 7/9 ≈ 0.778); c is disjoint
    rows = [
        ("a", "one two three four five six seven eight nine ten"),
        ("b", "one two three four five six seven eight nine zen"),
        ("c", "eleven twelve thirteen fourteen fifteen sixteen seventeen"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_similarity_join(
            df, "doc_id", "text", n=3, threshold_num=7, threshold_den=10
        ).collect()
    }
    want = set(_brute_jaccard(rows, n=3, tau=0.7))
    assert got == want and got == {("a", "b")}


def test_jaccard_join_no_unpartitioned_window_no_cartesian(spark):
    from alaska_etl_spark.operators.simjoin import jaccard_similarity_join

    rows = [("a", "x y z"), ("b", "x y w"), ("c", "p q r")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = jaccard_similarity_join(df, "doc_id", "text", n=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every Window in the plan is partitioned (per-doc rarity rank)
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # partition spec present: per-doc (_id) for the rank/size
            # windows, per-shingle (_t) for the document-frequency
            # count — never a global window
            assert "_id#" in line or "_t#" in line


def test_jaccard_join_randomized_corpus_matches_brute_force(spark):
    # 60 docs from a small vocabulary with planted near-dup clusters:
    # deterministic pseudo-random construction, checked against brute
    # force at two thresholds (including one where the size filter and
    # prefix pruning both bite).
    from alaska_etl_spark.operators.simjoin import jaccard_similarity_join

    vocab = [f"w{k}" for k in range(30)]
    rows = []
    for i in range(60):
        base = [(i * 7 + j * 11) % 30 for j in range(8 + i % 5)]
        if i % 3 == 0 and i > 0:  # near-dup of doc i-1 with one swap
            prev = rows[i - 1][1].split()
            toks = prev[:-1] + [vocab[(i * 13) % 30]]
        else:
            toks = [vocab[k] for k in base]
        rows.append((str(i), " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for num, den in [(1, 2), (4, 5)]:
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_similarity_join(
                df, "doc_id", "text", n=1, threshold_num=num, threshold_den=den
            ).collect()
        }
        want = _brute_jaccard(rows, n=1, tau=num / den)
        assert got == want, (num, den)
    assert want  # the harder threshold still finds the planted dups


def test_containment_join_finds_excerpts(spark):
    """The directed containment join catches an excerpt (short doc fully
    inside a long doc: containment 1.0 despite tiny Jaccard) and agrees
    with a brute-force reference on every directed pair."""
    from alaska_etl_spark.operators.simjoin import containment_join

    long_doc = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20, 28))  # 8 tokens inside
    other = " ".join(f"z{i}" for i in range(30))
    rows = [(1, long_doc), (2, quote), (3, other)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_join(
            df, "doc_id", "text", n=3, threshold_num=3, threshold_den=4
        ).collect()
    }
    assert got[(2, 1)] == 1.0            # quote ⊂ page
    assert (1, 2) not in got             # page ⊄ quote
    assert not any(3 in p for p in got)  # disjoint doc never pairs

    # brute-force parity on every directed pair
    def sh(text, n=3):
        t = text.lower().split()
        if not t:
            return set()
        if len(t) < n:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    want = {}
    for sid, stext in rows:
        for did, dtext in rows:
            if sid == did:
                continue
            a, b = sh(stext), sh(dtext)
            if not a:
                continue
            np_, ns = len(a & b), len(a)
            if 4 * np_ >= 3 * ns:
                want[(sid, did)] = ((2 * 10000 * np_ + ns) // (2 * ns)) / 10000.0
    assert got == want


def test_containment_max_dst_df_only_drops(spark):
    """max_dst_df is declared-approximate: results are a subset of the
    exact answer (containment can only be lost, never invented)."""
    from alaska_etl_spark.operators.simjoin import containment_join

    rows = [(i, " ".join(f"w{(i * 3 + j) % 40}" for j in range(12))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    exact = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_join(df, "doc_id", "text", n=1, threshold_num=1, threshold_den=2).collect()
    }
    pruned = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_join(
            df, "doc_id", "text", n=1, threshold_num=1, threshold_den=2, max_dst_df=5
        ).collect()
    }
    assert set(pruned) <= set(exact)
    for k, v in pruned.items():
        assert v == exact[k]


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_join_exact_vs_brute(spark):
    """Ed-Join prefix filter + banded verify == brute-force Levenshtein
    on a hot-alphabet corpus (tiny vocab = the pruning-heavy regime
    where a recall bug in the prefix lemma would surface)."""
    from alaska_etl_spark.operators.simjoin import edit_distance_join

    rows = [
        (1, "banana"), (2, "banane"), (3, "bananas"), (4, "bandana"),
        (5, "cabana"), (6, "abanan"), (7, "banan"), (8, "nabana"),
        (9, "banana"), (10, "xyzzy"),
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    for d in (1, 2):
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_join(df, "id", "s", q=2, max_dist=d).collect()
        }
        want = {
            (i, j, _lev(a, b))
            for i, a in rows
            for j, b in rows
            if i < j and _lev(a, b) <= d
        }
        assert got == want, f"d={d}"


def test_edit_distance_join_short_strings(spark):
    """Strings shorter than q have no q-gram; the short path must still
    pair them (the gram path alone would silently drop them)."""
    from alaska_etl_spark.operators.simjoin import edit_distance_join

    rows = [(1, "a"), (2, "b"), (3, ""), (4, "ab"), (5, "abc"), (6, "a")]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "s", q=2, max_dist=1).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= 1
    }
    assert got == want
    assert (1, 6, 0) in got  # identical 1-char strings


def test_edit_distance_join_hypothesis_recall(spark):
    """Property: on random hot-alphabet corpora the join equals brute
    force — pins the prefix lemma (L = d*q + 1 rarest grams, position
    and length filters) and the short-string routing."""
    import random

    from alaska_etl_spark.operators.simjoin import edit_distance_join

    rng = random.Random(17)
    for trial in range(3):
        rows = [
            (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 6))))
            for i in range(1, 26)
        ]
        df = spark.createDataFrame(rows, "id bigint, s string")
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_join(df, "id", "s", q=2, max_dist=1).collect()
        }
        want = {
            (i, j, _lev(a, b))
            for i, a in rows
            for j, b in rows
            if i < j and _lev(a, b) <= 1
        }
        assert got == want, f"trial {trial}"


def test_longest_shared_runs_hand_computed(spark):
    # r10 (VERDICT r9 Missing #1): exact arbitrary-length verbatim runs
    # via diagonal gaps-and-islands over positional trigram matches.
    from alaska_etl_spark.operators.simjoin import longest_shared_runs

    df = _docs(
        spark,
        [
            ("1", "a b c d e f g h i j"),
            ("2", "x y a b c d e f z w q r s t u v"),  # shares a..f (6)
            ("3", "p q r"),
            ("4", "a b c d e f g h i j"),              # exact dup of 1
            ("5", "h i j k l a b c"),                  # two runs of 3 vs 1
        ],
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in longest_shared_runs(
            df, "doc_id", "text", n=3, min_run_tokens=3, max_pair_df=5
        ).collect()
    }
    r12 = out[("1", "2")]
    assert r12["longest_run_tokens"] == 6 and r12["n_runs"] == 1
    assert (r12["src_start"], r12["dst_start"]) == (1, 3)
    r14 = out[("1", "4")]
    assert r14["longest_run_tokens"] == 10  # full doc, arbitrary length
    assert (r14["src_start"], r14["dst_start"]) == (1, 1)
    r15 = out[("1", "5")]
    # two maximal runs of 3 ("a b c", "h i j"); tie -> smallest src_start
    assert r15["longest_run_tokens"] == 3 and r15["n_runs"] == 2
    assert (r15["src_start"], r15["dst_start"]) == (1, 6)
    # doc 3 shares no trigram run with anyone
    assert not any("3" in k for k in out)
    # min_run_tokens raises the report floor, never changes the max
    hi = {
        (r["id_a"], r["id_b"]): r["longest_run_tokens"]
        for r in longest_shared_runs(
            df, "doc_id", "text", n=3, min_run_tokens=6, max_pair_df=5
        ).collect()
    }
    assert hi == {("1", "2"): 6, ("1", "4"): 10, ("2", "4"): 6}


def test_longest_shared_runs_accepts_pairs_and_guards_min_run(spark):
    from alaska_etl_spark.operators.simjoin import longest_shared_runs

    df = _docs(spark, [("1", "a b c d e"), ("2", "z a b c d q"), ("3", "a b c d e")])
    pairs = spark.createDataFrame([("1", "2")], "id_a string, id_b string")
    out = longest_shared_runs(
        df, "doc_id", "text", n=2, min_run_tokens=2, pairs=pairs
    ).collect()
    # only the provided pair is measured — (1,3) exists but is not asked for
    assert [(r["id_a"], r["id_b"], r["longest_run_tokens"]) for r in out] == [
        ("1", "2", 4)
    ]
    import pytest

    with pytest.raises(ValueError):
        longest_shared_runs(df, "doc_id", "text", n=3, min_run_tokens=2)


def test_longest_repeat_runs_hand_computed(spark):
    # r11 X178: intra-document exact repeats — straight self-quote,
    # overlapping periodic repeat (each period its own diagonal), and
    # a repeat-free doc emitting nothing.
    from alaska_etl_spark.operators.simjoin import longest_repeat_runs

    df = spark.createDataFrame(
        [
            (1, "a b c d a b c"),   # "a b c" at 1 and 5
            (2, "x x x x"),          # periodic: "x x x" at (1,2); "x x" at (1,3)
            (3, "a b c"),            # no repeat
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r
        for r in longest_repeat_runs(
            df, "doc_id", "text", n=2, min_run_tokens=2
        ).collect()
    }
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1["longest_run_tokens"], r1["src_start"], r1["dst_start"]) == (3, 1, 5)
    assert r1["n_runs"] == 1
    r2 = got[2]
    assert (r2["longest_run_tokens"], r2["src_start"], r2["dst_start"]) == (3, 1, 2)
    assert r2["n_runs"] == 2  # the dg=2 "x x" island is its own maximal run


def test_longest_repeat_runs_hot_gram_cap(spark):
    # r12 VERDICT #5: the degenerate-document guard. A doc whose gram
    # multiplicity exceeds the cap routes to the adjacent-occurrence
    # lane (linear, flagged capped=true); cold docs keep the exact lane
    # bit-for-bit and read capped=false.
    from alaska_etl_spark.operators.simjoin import longest_repeat_runs

    degen = "x " * 50  # one token 50×: multiplicity 49 at n=2
    df = spark.createDataFrame(
        [(1, "a b c d a b c"), (2, degen.strip()), (3, "a b c")],
        "doc_id bigint, text string",
    )
    capped = {
        r["doc_id"]: r
        for r in longest_repeat_runs(
            df, "doc_id", "text", n=2, min_run_tokens=2, hot_gram_cap=8
        ).collect()
    }
    exact = {
        r["doc_id"]: r
        for r in longest_repeat_runs(
            df, "doc_id", "text", n=2, min_run_tokens=2
        ).collect()
    }
    # cold doc: identical to the exact lane, flagged false
    assert capped[1]["capped"] is False
    for c in ("longest_run_tokens", "n_runs", "src_start", "dst_start"):
        assert capped[1][c] == exact[1][c]
    # hot doc: flagged, and EXACT on the pure-degenerate shape
    # (longest run = diagonal 1 = the adjacent pairs: 49 tokens)
    assert capped[2]["capped"] is True
    assert capped[2]["longest_run_tokens"] == 49
    assert exact[2]["longest_run_tokens"] == 49
    assert (capped[2]["src_start"], capped[2]["dst_start"]) == (1, 2)
    # lower-bound invariant holds on every reported doc
    for d, r in capped.items():
        assert r["longest_run_tokens"] <= exact[d]["longest_run_tokens"]
    # default (cap=None) keeps the pre-r12 schema: no capped column
    base = longest_repeat_runs(df, "doc_id", "text", n=2, min_run_tokens=2)
    assert "capped" not in base.columns
    import pytest

    with pytest.raises(ValueError):
        longest_repeat_runs(df, "doc_id", "text", n=2, hot_gram_cap=0)


def test_longest_repeat_runs_guards_min_run(spark):
    import pytest

    from alaska_etl_spark.operators.simjoin import longest_repeat_runs

    df = spark.createDataFrame([(1, "a b a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        longest_repeat_runs(df, "doc_id", "text", n=3, min_run_tokens=2)
    # docs shorter than n carry no gram and report nothing
    short = spark.createDataFrame([(1, "a"), (2, "a a a a")], "doc_id bigint, text string")
    got = longest_repeat_runs(short, "doc_id", "text", n=3, min_run_tokens=3).collect()
    assert [r["doc_id"] for r in got] == [2]
