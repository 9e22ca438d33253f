"""URL canonicalization + domain family (operators/urls.py): the
canonical form's exact rule set on hand-built URLs, the registrable-
domain heuristic and its PSL escape hatch, the suffix chain, and the
rollup/blocklist operators on a hand-computed corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from alaska_etl_spark.operators.urls import (
    blocklist_audit,
    blocklist_filter,
    canonical_url,
    domain_rollup,
    host_suffix_chain,
    registrable_domain,
    url_host,
)


def _urls(spark, rows):
    return spark.createDataFrame(rows, "id bigint, url string")


def _canon(spark, url):
    df = _urls(spark, [(1, url)])
    return df.select(canonical_url("url").alias("c")).collect()[0]["c"]


def test_canonical_collapses_case_port_tracking_order_fragment(spark):
    variants = [
        "HTTPS://User:pw@WWW.Site3.COM:443/p/1?b=2&utm_source=x&a=1#frag",
        "https://www.site3.com/p/1?a=1&b=2",
        "https://www.site3.com:443/p/1?b=2&a=1&fbclid=abc123",
        "https://www.site3.com/p/1?a=1&utm_campaign=y&b=2#other",
    ]
    got = {_canon(spark, u) for u in variants}
    assert got == {"https://www.site3.com/p/1?a=1&b=2"}


def test_canonical_keeps_what_matters(spark):
    # non-default port, path, non-tracking params all survive
    assert _canon(spark, "http://cdn.a.com:8080") == "http://cdn.a.com:8080/"
    assert _canon(spark, "http://a.com:80/x?gclid=1") == "http://a.com/x"
    # http:443 is NOT a default port pair — kept
    assert _canon(spark, "http://a.com:443/") == "http://a.com:443/"
    # all params tracking -> no query part at all
    assert _canon(spark, "https://a.com/p?utm_a=1&utm_b=2") == "https://a.com/p"
    # duplicate keys are preserved (sorted), not merged
    assert _canon(spark, "https://a.com/q?z=1&z=0") == "https://a.com/q?z=0&z=1"


def test_canonical_percent_encoding_normalization(spark):
    # RFC 3986 §6.2.2: unreserved octets decode, hex uppercases,
    # reserved stays encoded, malformed % round-trips verbatim
    assert _canon(spark, "https://a.com/%7efoo") == "https://a.com/~foo"
    assert _canon(spark, "https://a.com/%7Efoo") == "https://a.com/~foo"
    assert _canon(spark, "https://a.com/a%2fb") == "https://a.com/a%2Fb"
    assert _canon(spark, "https://a.com/x%") == "https://a.com/x%"
    assert _canon(spark, "https://a.com/x%zz") == "https://a.com/x%zz"
    # query side too — %61=1 IS a=1 (sorted and merged with the rest)
    assert _canon(spark, "https://a.com/p?%61=1&b=2") == "https://a.com/p?a=1&b=2"
    # a percent-spelled tracking key is still a tracking key
    assert _canon(spark, "https://a.com/p?%75tm_x=1&a=1") == "https://a.com/p?a=1"


def test_canonical_host_normalization(spark):
    # r12 (VERDICT r11 Missing #3): host percent-normalization, case
    # collapse AFTER the decode, trailing root-label dot stripped
    assert _canon(spark, "https://%73ite.com/p") == "https://site.com/p"
    assert _canon(spark, "https://%53ITE.com/p") == "https://site.com/p"
    assert _canon(spark, "https://example.com./p") == "https://example.com/p"
    assert _canon(spark, "https://EXAMPLE.COM.:443/p") == "https://example.com/p"
    # non-unreserved host octets stay encoded, lowercase-hex spelling
    # (the documented deviation where IDNA is the declared boundary)
    assert _canon(spark, "https://caf%C3%A9.fr/p") == "https://caf%c3%a9.fr/p"
    assert _canon(spark, "https://caf%c3%a9.fr/p") == "https://caf%c3%a9.fr/p"
    # punycode passes through verbatim (declared boundary: no IDNA)
    assert _canon(spark, "https://xn--caf-dma.fr/p") == "https://xn--caf-dma.fr/p"
    # url_host agrees with the canonical host rule
    df = _urls(spark, [(1, "https://%53ITE.com./p")])
    assert [r["h"] for r in df.select(url_host("url").alias("h")).collect()] == [
        "site.com"
    ]


def test_canonical_dot_segments_and_duplicate_slashes(spark):
    assert _canon(spark, "https://a.com//x//y") == "https://a.com/x/y"
    assert _canon(spark, "https://a.com/x/./y") == "https://a.com/x/y"
    assert _canon(spark, "https://a.com/x/../y") == "https://a.com/y"
    assert _canon(spark, "https://a.com/../y") == "https://a.com/y"
    assert _canon(spark, "https://a.com/x/..") == "https://a.com/"
    # directory form keeps its trailing slash; decode feeds the fold
    assert _canon(spark, "https://a.com/x/y/..") == "https://a.com/x/"
    assert _canon(spark, "https://a.com/x/") == "https://a.com/x/"
    assert _canon(spark, "https://a.com/%2E%2E/p/9") == "https://a.com/p/9"


def test_canonical_ipv6_routes_to_bad_rows(spark):
    # the colon port rule cannot parse bracket authorities: NULL, never
    # a corrupt key (ADVICE r10)
    df = _urls(
        spark,
        [(1, "https://[::1]:8080/p"), (2, "https://[2001:db8::1]/p")],
    )
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [None, None]


def test_blocklist_total_first_for_any_rule_name(spark):
    # '_' sorts AFTER digits/uppercase in binary collation — the total
    # row must lead by construction, not by naming luck (ADVICE r10)
    df = _urls(spark, [(1, "https://x.com/a"), (2, "https://y.org/b")])
    rules = spark.createDataFrame(
        [("0-ads", "x.com"), ("Ads", "y.org")], "rule string, domain string"
    )
    rows = blocklist_audit(df, "id", "url", rules).collect()
    assert rows[0]["rule"] == "_total"
    assert [r["rule"] for r in rows[1:]] == ["0-ads", "Ads"]


def test_canonical_rejects_non_urls(spark):
    df = _urls(spark, [(1, "not a url"), (2, None), (3, "www.a.com/x")])
    got = df.select(canonical_url("url").alias("c")).collect()
    assert [r["c"] for r in got] == [None, None, None]


def test_registrable_domain_and_suffix_chain(spark):
    df = spark.createDataFrame(
        [("www.site3.com",), ("a.b.co.uk",), ("localhost",)], "h string"
    )
    rows = df.select(
        registrable_domain("h").alias("d"),
        registrable_domain("h", extra_suffixes=("co.uk",)).alias("d2"),
        host_suffix_chain("h").alias("ch"),
    ).collect()
    assert (rows[0]["d"], rows[0]["d2"]) == ("site3.com", "site3.com")
    assert rows[0]["ch"] == ["www.site3.com", "site3.com", "com"]
    # without PSL data co.uk collapses (the documented boundary);
    # with it the registrable domain is b.co.uk
    assert (rows[1]["d"], rows[1]["d2"]) == ("co.uk", "b.co.uk")
    assert rows[1]["ch"] == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]
    # single-label hosts pass through
    assert (rows[2]["d"], rows[2]["d2"]) == ("localhost", "localhost")
    assert rows[2]["ch"] == ["localhost"]


def test_url_host(spark):
    df = _urls(spark, [(1, "HTTPS://U@WWW.A.COM:8443/p"), (2, "junk")])
    got = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert got == ["www.a.com", ""]


def test_domain_rollup_hand_computed(spark):
    df = _urls(
        spark,
        [
            (1, "https://WWW.a.com/p?utm_x=1"),   # canon https://www.a.com/p
            (2, "https://www.a.com:443/p"),       # same canonical
            (3, "https://cdn.a.com/q"),           # a.com, second host
            (4, "http://b.org/"),
            (5, "garbage"),                        # excluded (no domain)
        ],
    )
    got = {r["domain"]: r for r in domain_rollup(df, "url").collect()}
    assert set(got) == {"a.com", "b.org"}
    a = got["a.com"]
    assert (a["n_pages"], a["n_urls"], a["n_hosts"]) == (3, 2, 2)
    assert a["dup_bp"] == 3333  # half-up 10^4 * 1/3
    b = got["b.org"]
    assert (b["n_pages"], b["n_urls"], b["n_hosts"], b["dup_bp"]) == (1, 1, 1, 0)


def test_blocklist_audit_and_filter(spark):
    df = _urls(
        spark,
        [
            (1, "https://www.site3.com/p"),
            (2, "https://CDN.site3.com/q"),    # case-folds into site3.com
            (3, "https://cdn.site4.com/r"),
            (4, "https://www.site4.com/s"),    # NOT under cdn.site4.com
            (5, "https://other.net/t"),
            (6, "junk"),                        # kept by filter, invisible to audit
        ],
    )
    rules = spark.createDataFrame(
        [("r1", "site3.com"), ("r2", "cdn.site4.com"), ("r3", "example.net")],
        "rule string, domain string",
    )
    audit = {r["rule"]: r for r in blocklist_audit(df, "id", "url", rules).collect()}
    assert audit["r1"]["n_pages"] == 2 and audit["r1"]["n_hosts"] == 2
    assert audit["r2"]["n_pages"] == 1
    assert audit["r3"]["n_pages"] == 0 and audit["r3"]["share_bp"] == 0
    assert audit["_total"]["n_pages"] == 3
    assert audit["_total"]["share_bp"] == 6000  # 3 of 5 canonicalizable
    # ordered output: _total leads (underscore sorts first)
    first = blocklist_audit(df, "id", "url", rules).collect()[0]
    assert first["rule"] == "_total"
    kept = sorted(r["id"] for r in blocklist_filter(df, "id", "url", rules).collect())
    assert kept == [4, 5, 6]


def _write_url_file(path, rows):
    import json

    with open(path, "w") as f:
        for doc_id, url in rows:
            f.write(json.dumps({"doc_id": doc_id, "url": url}) + "\n")


def test_stream_url_frontier_dedups_blocks_and_routes(spark, tmp_path):
    # r10: crawl-frontier gate — canonical dedup across batches with
    # zero streaming state, blocklist filter, malformed-URL routing.
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.streaming.incremental import stream_url_frontier

    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    rules = spark.createDataFrame([("r1", "blocked.com")], "rule string, domain string")
    schema = "doc_id bigint, url string"

    _write_url_file(
        src / "b1.json",
        [
            (5, "https://A.com/p?utm_x=1"),       # canon https://a.com/p
            (2, "https://a.com:443/p"),           # same canonical, smaller id
            (3, "http://sub.blocked.com/x"),      # blocklisted
            (4, "not a url"),                     # -> rejects
        ],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_url_frontier(
        stream, wh, "frontier", ckpt, rules=rules, rejects_table="bad_urls"
    )
    landed = {r.doc_id for r in wh.read("frontier").collect()}
    assert landed == {2}  # within-batch keep-first on canonical
    assert {r.doc_id for r in wh.read("bad_urls").collect()} == {4}

    # batch 2: a re-crawl variant of the same resource + one new URL
    _write_url_file(
        src / "b2.json",
        [(9, "HTTPS://a.com/p#frag"), (10, "https://b.org/q")],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_url_frontier(
        stream, wh, "frontier", ckpt, rules=rules, rejects_table="bad_urls"
    )
    landed = {r.doc_id for r in wh.read("frontier").collect()}
    assert landed == {2, 10}  # doc 9 deduped against doc 2 CROSS-batch


def test_path_prefix_chain_and_mixed_kind_audit(spark):
    # r10 X174: path_prefix rules anchor at the exact host and match at
    # / boundaries only; domain rules still match subdomains.
    from alaska_etl_spark.operators.urls import path_prefix_chain

    df = spark.createDataFrame(
        [("a.com", "/x/y"), ("a.com", "/")], "h string, p string"
    )
    got = [r["c"] for r in df.select(path_prefix_chain("h", "p").alias("c")).collect()]
    assert got[0] == ["a.com", "a.com/x", "a.com/x/y"]
    assert got[1] == ["a.com"]

    docs = _urls(
        spark,
        [
            (1, "https://a.com/private/doc"),
            (2, "https://a.com/public/doc"),
            (3, "https://sub.a.com/private/doc"),   # different host: no path match
            (4, "https://a.com/privateer"),          # NOT under /private (boundary)
            (5, "https://b.org/x"),
        ],
    )
    rules = spark.createDataFrame(
        [("p1", "path_prefix", "a.com/private"), ("d1", "domain", "b.org")],
        "rule string, kind string, pattern string",
    )
    audit = {r["rule"]: r for r in blocklist_audit(docs, "id", "url", rules).collect()}
    assert audit["p1"]["n_pages"] == 1          # only doc 1
    assert audit["d1"]["n_pages"] == 1          # doc 5
    assert audit["_total"]["n_pages"] == 2
    kept = sorted(r["id"] for r in blocklist_filter(docs, "id", "url", rules).collect())
    assert kept == [2, 3, 4]


def test_stream_domain_quota_caps_across_batches(spark, tmp_path):
    # r10 X175: per-domain lifetime cap with the warehouse as the only
    # ledger — deterministic fill order (smallest id), canonical dedup
    # still applies, quota survives across batches.
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.streaming.incremental import stream_domain_quota

    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, url string"

    _write_url_file(
        src / "b1.json",
        [
            (7, "https://a.com/p1"),
            (3, "https://www.a.com/p2"),   # same registrable domain
            (5, "https://A.com/p1#x"),     # canonical dup of doc 7
            (9, "https://a.com/p3"),
            (1, "https://b.org/q1"),
        ],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_domain_quota(stream, wh, "quota", ckpt, max_per_domain=2)
    landed = {r.doc_id for r in wh.read("quota").collect()}
    # a.com candidates after canonical dedup: ids {3, 5, 9} (7 collapses
    # into 5 — keep-first takes the smaller id); cap 2 fills
    # smallest-first -> {3, 5}; b.org admits 1
    assert landed == {1, 3, 5}

    # batch 2: a.com is full; b.org has headroom for one more
    _write_url_file(
        src / "b2.json",
        [(2, "https://cdn.a.com/p9"), (4, "https://b.org/q2"), (6, "https://b.org/q3")],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_domain_quota(stream, wh, "quota", ckpt, max_per_domain=2)
    landed = {r.doc_id for r in wh.read("quota").collect()}
    assert landed == {1, 3, 5, 4}  # a.com rejected, b.org admits id 4 only


def test_stream_domain_quota_incremental_ledger(spark, tmp_path):
    # r11 X176: ledger_table mode — headroom comes from the
    # incrementally-maintained (domain, _batch_id, n_admitted) ledger,
    # never a row-grain main-table aggregate; admitted sets must be
    # IDENTICAL to the zero-state form, and the ledger must reconcile
    # exactly with the landed table.
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.streaming.incremental import stream_domain_quota

    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, url string"

    _write_url_file(
        src / "b1.json",
        [
            (7, "https://a.com/p1"),
            (3, "https://www.a.com/p2"),
            (5, "https://A.com/p1#x"),   # canonical dup of doc 7
            (9, "https://a.com/p3"),
            (1, "https://b.org/q1"),
        ],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_domain_quota(
        stream, wh, "quota", ckpt, max_per_domain=2, ledger_table="quota_ledger"
    )
    assert {r.doc_id for r in wh.read("quota").collect()} == {1, 3, 5}

    # batch 2: a.com full per the LEDGER; a re-crawl of a landed URL
    # (id 8 = id 5's resource) must not eat b.org-style headroom either
    _write_url_file(
        src / "b2.json",
        [
            (2, "https://cdn.a.com/p9"),
            (8, "https://a.com/p1"),        # landed canonical: anti-joined away
            (4, "https://b.org/q2"),
            (6, "https://b.org/q3"),
        ],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_domain_quota(
        stream, wh, "quota", ckpt, max_per_domain=2, ledger_table="quota_ledger"
    )
    assert {r.doc_id for r in wh.read("quota").collect()} == {1, 3, 5, 4}

    # ledger reconciles with the landed table exactly
    led = {
        (r.domain, r._batch_id): r.n_admitted
        for r in wh.read("quota_ledger").collect()
    }
    assert led[("a.com", 0)] == 2 and led[("b.org", 0)] == 1
    assert led[("b.org", 1)] == 1 and ("a.com", 1) not in led
    landed_counts = {
        r.domain: r.n
        for r in wh.read("quota")
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ledger_counts = {}
    for (d, _b), n in led.items():
        ledger_counts[d] = ledger_counts.get(d, 0) + n
    assert ledger_counts == landed_counts


def test_parse_robots_groups_and_agent_resolution(spark):
    # r11 X181: RFC 9309 group semantics — consecutive UA lines share a
    # group; a UA line after a rule line starts a new one; exact-name
    # groups beat star groups and same-UA groups merge; comments strip;
    # wildcard paths surface flagged.
    from alaska_etl_spark.operators.urls import parse_robots

    txt = "\n".join(
        [
            "# site robots",
            "User-agent: *",
            "Disallow: /private",
            "",
            "User-agent: trainbot",
            "User-agent: otherbot",
            "Disallow: /p/1   # tail comment",
            "Allow: /p/15",
            "User-agent: trainbot",
            "Disallow: /dup",
            "Disallow: /img/*.gif",
            "Sitemap: https://a.com/sitemap.xml",
        ]
    )
    df = spark.createDataFrame([("A.com", txt)], "host string, body string")
    got = {
        (r["rule_kind"], r["path"], r["is_wildcard"])
        for r in parse_robots(df, "host", "body", agent="TrainBot").collect()
    }
    # star group excluded (a named group exists); both trainbot groups merge
    assert got == {
        ("disallow", "/p/1", False),
        ("allow", "/p/15", False),
        ("disallow", "/dup", False),
        ("disallow", "/img/*.gif", True),
    }
    # unknown agent: falls back to the star group
    star = {
        (r["rule_kind"], r["path"])
        for r in parse_robots(df, "host", "body", agent="nobody").collect()
    }
    assert star == {("disallow", "/private")}


def test_robots_check_precedence_and_defaults(spark):
    # RFC 9309 §2.2.2/§2.2.3: most-octets pattern decides, allow wins
    # ties, plain string prefix (no /-boundary), no match => allowed,
    # empty Disallow matches nothing, wildcard rules MATCH via
    # anchored-regex translation (r12), rule paths percent-normalize
    # and dot-fold before matching (r12).
    from alaska_etl_spark.operators.urls import parse_robots, robots_check

    txt = "\n".join(
        [
            "User-agent: *",
            "Disallow: /p",
            "Allow: /p/ok",
            "Disallow: /p/okx",   # longer than the allow: wins on /p/okx*
            "Allow: /q",
            "Disallow: /q",       # exact tie: allow wins
            "Disallow:",          # empty: matches nothing
            "Disallow: /w*z",     # wildcard: matches /w…z…
            "Allow: /wyz$",       # anchored + longer: exactly /wyz wins back
            "Disallow: /%74ok",   # percent-normalized: /tok
            "Disallow: /u/../v",  # dot-segment folded: /v
        ]
    )
    robots = spark.createDataFrame([("a.com", txt)], "host string, body string")
    rules = parse_robots(robots, "host", "body", agent="anybot")
    urls = spark.createDataFrame(
        [
            (1, "https://a.com/page"),       # '/p' prefix-matches '/page' (RFC!)
            (2, "https://a.com/p/ok/deep"),
            (3, "https://a.com/p/okxfile"),
            (4, "https://a.com/q/x"),
            (5, "https://a.com/other"),
            (6, "https://a.com/wyz"),        # wildcard hits; anchored allow wins
            (7, "junk"),                      # bad row: no verdict emitted
            (8, "https://a.com/wyzx"),       # anchor fails: wildcard disallow
            (9, "https://a.com/tokens"),     # percent-normalized rule hits
            (10, "https://a.com/v/w"),       # dot-folded rule hits
        ],
        "id bigint, url string",
    )
    got = {r["id"]: r["allowed"] for r in robots_check(urls, "id", "url", rules).collect()}
    assert got == {
        1: False,
        2: True,
        3: False,
        4: True,
        5: True,
        6: True,
        8: False,
        9: False,
        10: False,
    }


def test_sitemap_urls_extraction(spark):
    # r11 X182: urlset vs sitemapindex kinds, whitespace trim,
    # canonicalization of entries, malformed loc -> NULL canonical.
    from alaska_etl_spark.operators.urls import sitemap_urls

    urlset = (
        "<?xml version='1.0'?><urlset><url><loc>https://A.com/p/1?utm_x=1</loc>"
        "</url><url><loc>  https://a.com/p/2  </loc></url>"
        "<url><loc>junk</loc></url></urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://b.org/maps/2.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    # r12: kind comes from the ROOT element — a urlset whose comment
    # mentions <sitemapindex stays a urlset; &amp; in loc values (the
    # protocol-required escaping) unescapes before canonicalization
    tricky = (
        "<!-- not a <sitemapindex> --><urlset><url>"
        "<loc>https://c.net/p?a=1&amp;b=2</loc></url></urlset>"
    )
    df = spark.createDataFrame(
        [("a.com", urlset), ("b.org", index), ("c.net", tricky)],
        "host string, body string",
    )
    got = [
        (r["host"], r["kind"], r["loc"], r["canonical_url"])
        for r in sitemap_urls(df, "host", "body").collect()
    ]
    assert got == [
        ("a.com", "url", "https://A.com/p/1?utm_x=1", "https://a.com/p/1"),
        ("a.com", "url", "https://a.com/p/2", "https://a.com/p/2"),
        ("a.com", "url", "junk", None),
        ("b.org", "sitemap", "https://b.org/maps/2.xml", "https://b.org/maps/2.xml"),
        ("c.net", "url", "https://c.net/p?a=1&b=2", "https://c.net/p?a=1&b=2"),
    ]


def test_robots_directives_sitemap_and_crawl_delay(spark):
    # r12: Sitemap records are host-global (they surface for ANY
    # agent); Crawl-delay resolves through the same exact-beats-star
    # group resolution as rules; duplicates collapse.
    from alaska_etl_spark.operators.urls import robots_directives

    txt = "\n".join(
        [
            "Sitemap: https://a.com/sm1.xml",
            "User-agent: trainbot",
            "Crawl-delay: 2",
            "User-agent: *",
            "Crawl-delay: 10",
            "Sitemap: https://a.com/sm2.xml",
        ]
    )
    df = spark.createDataFrame([("A.com", txt)], "host string, body string")

    def run(agent):
        return {
            (r["host"], r["directive"], r["value"])
            for r in robots_directives(df, "host", "body", agent=agent).collect()
        }

    sitemaps = {
        ("a.com", "sitemap", "https://a.com/sm1.xml"),
        ("a.com", "sitemap", "https://a.com/sm2.xml"),
    }
    assert run("TrainBot") == sitemaps | {("a.com", "crawl-delay", "2")}
    assert run("nobody") == sitemaps | {("a.com", "crawl-delay", "10")}
    assert run("*") == sitemaps | {("a.com", "crawl-delay", "10")}


def test_stream_url_frontier_robots_gated(spark, tmp_path):
    # r11 X181 streaming composition: robots_rules drops DISALLOWED
    # URLs at admission (they are fetchable-later, not bad rows — the
    # rejects table stays malformed-only); allow-overrides, canonical
    # dedup and blocklist still compose.
    from alaska_etl_spark.operators.urls import parse_robots
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.streaming.incremental import stream_url_frontier

    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, url string"
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private\nAllow: /private/ok")],
        "host string, body string",
    )
    rr = parse_robots(robots, "host", "body", agent="trainbot")

    _write_url_file(
        src / "b1.json",
        [
            (1, "https://a.com/public/x"),
            (2, "https://a.com/private/x"),      # robots-denied: dropped
            (3, "https://a.com/private/ok/y"),   # allow overrides
            (4, "not a url"),                     # malformed: rejected
            (5, "https://A.com/public/x#f"),     # canonical dup of 1
        ],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_url_frontier(
        stream, wh, "frontier", ckpt, robots_rules=rr, rejects_table="bad"
    )
    assert {r.doc_id for r in wh.read("frontier").collect()} == {1, 3}
    assert {r.doc_id for r in wh.read("bad").collect()} == {4}


def test_stream_domain_quota_ledger_replay_idempotent(spark, tmp_path):
    # r11 X176: a FULL REPLAY (checkpoint wiped, same source files, so
    # every batch re-runs with recycled batch ids) must leave the
    # landed table AND the ledger bit-identical — the keyed appends
    # dedup the rows, the (domain, _batch_id) key dedups the counts,
    # and headroom arithmetic sees nothing new.
    import shutil

    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.streaming.incremental import stream_domain_quota

    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, url string"
    _write_url_file(
        src / "b1.json",
        [(7, "https://a.com/p1"), (3, "https://a.com/p2"), (1, "https://b.org/q1")],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_domain_quota(
        stream, wh, "quota", ckpt, max_per_domain=2, ledger_table="led"
    )
    _write_url_file(src / "b2.json", [(9, "https://a.com/p3"), (4, "https://b.org/q2")])
    stream = spark.readStream.schema(schema).json(str(src))
    stream_domain_quota(
        stream, wh, "quota", ckpt, max_per_domain=2, ledger_table="led"
    )
    before_rows = sorted(
        (r.doc_id, r.domain, r.canonical_url) for r in wh.read("quota").collect()
    )
    before_led = sorted(
        (r.domain, r._batch_id, r.n_admitted) for r in wh.read("led").collect()
    )
    # full replay: wipe the checkpoint, stream the SAME files again
    shutil.rmtree(ckpt)
    stream = spark.readStream.schema(schema).json(str(src))
    stream_domain_quota(
        stream, wh, "quota", ckpt, max_per_domain=2, ledger_table="led"
    )
    after_rows = sorted(
        (r.doc_id, r.domain, r.canonical_url) for r in wh.read("quota").collect()
    )
    after_led = sorted(
        (r.domain, r._batch_id, r.n_admitted) for r in wh.read("led").collect()
    )
    assert after_rows == before_rows
    assert after_led == before_led


def test_stream_domain_quota_bloom_matches_zero_state(spark, tmp_path):
    # r12 (VERDICT r11 Missing #2): the Bloom seen-set lane must admit
    # EXACTLY the zero-state form's rows — across batches, with
    # canonical dups, cross-batch re-crawls, and the ledger carrying
    # headroom (the zero-landed-reads configuration).
    from alaska_etl_spark.operators.pruning import bloom_sidecar_load
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.streaming.incremental import stream_domain_quota

    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    bloom = str(tmp_path / "bloom")
    schema = "doc_id bigint, url string"

    _write_url_file(
        src / "b1.json",
        [
            (7, "https://a.com/p1"),
            (3, "https://www.a.com/p2"),
            (5, "https://A.com/p1#x"),   # canonical dup of doc 7
            (9, "https://a.com/p3"),
            (1, "https://b.org/q1"),
        ],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_domain_quota(
        stream, wh, "quota", ckpt, max_per_domain=2,
        ledger_table="quota_ledger", bloom_path=bloom,
    )
    assert {r.doc_id for r in wh.read("quota").collect()} == {1, 3, 5}
    assert bloom_sidecar_load(spark, bloom) is not None  # sidecar landed

    # batch 2: re-crawl of a landed canonical (maybe lane must catch
    # it), a full domain, and fresh b.org headroom
    _write_url_file(
        src / "b2.json",
        [
            (2, "https://cdn.a.com/p9"),
            (8, "https://a.com/p1"),     # landed canonical: blocked
            (4, "https://b.org/q2"),
            (6, "https://b.org/q3"),
        ],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_domain_quota(
        stream, wh, "quota", ckpt, max_per_domain=2,
        ledger_table="quota_ledger", bloom_path=bloom,
    )
    assert {r.doc_id for r in wh.read("quota").collect()} == {1, 3, 5, 4}


def test_stream_url_frontier_bloom_superset_and_recovery(spark, tmp_path):
    # The sidecar's two safety properties: (a) SUPERSET keys that never
    # landed (crash between sidecar and rows) still admit via the
    # maybe-lane exact check; (b) a deleted sidecar rebuilds from the
    # landed keys and re-crawls stay blocked.
    import shutil

    from alaska_etl_spark.operators.pruning import (
        bloom_add,
        bloom_sidecar_load,
        bloom_sidecar_write,
    )
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.streaming.incremental import stream_url_frontier

    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    bloom = str(tmp_path / "bloom")
    schema = "doc_id bigint, url string"

    _write_url_file(
        src / "b1.json",
        [(1, "https://a.com/p1"), (2, "https://b.org/q1")],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_url_frontier(
        stream, wh, "frontier", str(tmp_path / "c1"), bloom_path=bloom
    )
    assert {r.doc_id for r in wh.read("frontier").collect()} == {1, 2}

    # (a) crash-sim: put a NOT-landed key into the filter (the state a
    # crash between sidecar write and row land leaves behind)
    packed, m_bits, n_hashes, _nd = bloom_sidecar_load(spark, bloom)
    ghost = spark.createDataFrame(
        [("https://c.net/ghost",)], "canonical_url string"
    )
    packed = bloom_add(ghost, "canonical_url", packed, m_bits=m_bits, n_hashes=n_hashes)
    bloom_sidecar_write(spark, f"{bloom}/base", packed, m_bits, n_hashes)
    _write_url_file(
        src / "b2.json",
        [
            (3, "https://c.net/ghost"),   # bloom-positive, NOT landed
            (4, "https://a.com/p1"),      # true re-crawl: blocked
            (5, "https://d.io/new"),      # definitely new
        ],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_url_frontier(
        stream, wh, "frontier", str(tmp_path / "c2"), bloom_path=bloom
    )
    assert {r.doc_id for r in wh.read("frontier").collect()} == {1, 2, 3, 5}

    # (b) recovery: sidecar gone -> rebuilt from landed keys; the
    # re-crawl of every landed URL must still be blocked
    shutil.rmtree(bloom)
    _write_url_file(
        src / "b3.json",
        [(6, "https://d.io/new"), (7, "https://e.edu/fresh")],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_url_frontier(
        stream, wh, "frontier", str(tmp_path / "c3"), bloom_path=bloom
    )
    assert {r.doc_id for r in wh.read("frontier").collect()} == {1, 2, 3, 5, 7}
    assert bloom_sidecar_load(spark, bloom) is not None  # rebuilt


def test_psl_registrable_domain(spark):
    # r12: full PSL semantics — plain/wildcard/exception rules, the
    # default * fallback, and the host-IS-a-public-suffix NULL.
    from alaska_etl_spark.operators.urls import psl_registrable_domain

    rules = spark.createDataFrame(
        [("com",), ("co.uk",), ("uk",), ("*.ck",), ("!www.ck",),
         ("github.io",), ("io",)],
        "pattern string",
    )
    hosts = [
        ("example.com", "com", "example.com"),
        ("a.example.com", "com", "example.com"),
        ("b.co.uk", "co.uk", "b.co.uk"),       # longest match beats uk
        ("sub.b.co.uk", "co.uk", "b.co.uk"),
        ("co.uk", "co.uk", None),              # host IS a public suffix
        ("foo.ck", "foo.ck", None),            # wildcard: foo.ck IS one
        ("bar.foo.ck", "foo.ck", "bar.foo.ck"),
        ("www.ck", "ck", "www.ck"),            # exception beats wildcard
        ("sub.www.ck", "ck", "www.ck"),
        ("user.github.io", "github.io", "user.github.io"),
        ("nomatch.xyz", "xyz", "nomatch.xyz"), # default * rule
        ("localhost", "localhost", None),
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in hosts], "h string")
    got = {
        r["h"]: (r["public_suffix"], r["registrable_domain"])
        for r in psl_registrable_domain(df, "h", rules).collect()
    }
    for h, pub, reg in hosts:
        assert got[h] == (pub, reg), (h, got[h], (pub, reg))
    # empty/NULL hosts pass through with NULLs, row preserved
    df2 = spark.createDataFrame([("",), (None,)], "h string")
    out = psl_registrable_domain(df2, "h", rules).collect()
    assert len(out) == 2
    assert all(
        r["public_suffix"] is None and r["registrable_domain"] is None for r in out
    )


def test_bloom_delta_compaction(spark, tmp_path, monkeypatch):
    # r12: the delta log folds into the base at the compaction
    # threshold (base-then-delete — OR-idempotent at any crash point),
    # and the filter keeps blocking re-crawls across the fold.
    import alaska_etl_spark.operators.pruning as pruning
    from alaska_etl_spark.operators.pruning import bloom_sidecar_load
    from alaska_etl_spark.plans.warehouse import Warehouse
    from alaska_etl_spark.streaming.incremental import stream_url_frontier

    monkeypatch.setattr(pruning, "BLOOM_COMPACT_POSITIONS", 10)  # force it
    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    bloom = str(tmp_path / "bloom")
    schema = "doc_id bigint, url string"

    _write_url_file(
        src / "b1.json", [(1, "https://a.com/p1"), (2, "https://b.org/q1")]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_url_frontier(
        stream, wh, "frontier", str(tmp_path / "c1"), bloom_path=bloom
    )
    # 2 urls x 20 hashes > 10 positions -> compacted: delta gone
    import os

    assert not os.path.exists(f"{bloom}/delta")
    _packed, _m, _k, n_delta = bloom_sidecar_load(spark, bloom)
    assert n_delta == 0
    # post-compaction the filter still blocks the re-crawl
    _write_url_file(
        src / "b2.json", [(3, "https://a.com/p1"), (4, "https://c.net/r1")]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    stream_url_frontier(
        stream, wh, "frontier", str(tmp_path / "c2"), bloom_path=bloom
    )
    assert {r.doc_id for r in wh.read("frontier").collect()} == {1, 2, 4}
