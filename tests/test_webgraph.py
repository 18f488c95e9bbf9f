"""Web-graph operators (datapipe/webgraph.py): URL canonicalization
edge cases, link harvesting alignment/resolution, and PageRank vs a
driver-side pure-Python replay of the identical integer algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

from textract_demo_spark.datapipe.webgraph import (canonical_url,
                                                   harvest_links,
                                                   pagerank, url_domain,
                                                   url_host)


def _canon1(spark, url: str):
    return (spark.createDataFrame([(url,)], "u string")
            .select(canonical_url(F.col("u")).alias("c"))
            .collect()[0]["c"])


def test_canonical_url_cases(spark):
    cases = {
        # scheme+host lowercase, default port strip, fragment drop
        "HTTP://WWW.Ex.COM:80/a#frag": "http://www.ex.com/a",
        "https://Ex.COM:443/": "https://ex.com/",
        # non-default port kept; userinfo lowercased but kept
        "https://U:P@Ex.com:8443/a": "https://u:p@ex.com:8443/a",
        # duplicate + trailing slashes; empty path -> /
        "http://ex.com//a///b//": "http://ex.com/a/b",
        "http://ex.com": "http://ex.com/",
        # tracking params dropped, survivors sorted, ? dropped if none
        "http://ex.com/p?utm_source=x&b=2&a=1": "http://ex.com/p?a=1&b=2",
        "http://ex.com/p?utm_source=x&gclid=1": "http://ex.com/p",
        "http://ex.com/p?": "http://ex.com/p",
        # relative / garbage -> NULL
        "/just/a/path": None,
        "not a url": None,
        "mailto:a@b.c": None,  # no ://
    }
    for raw, want in cases.items():
        assert _canon1(spark, raw) == want, raw


def test_host_and_domain(spark):
    row = (spark.createDataFrame(
        [("HTTPS://User:pw@Sub.Shop.Example.CO:8443/x?q=1",)],
        "u string")
        .select(url_host(F.col("u")).alias("h"),
                url_domain(F.col("u")).alias("d"))
        .collect()[0])
    assert row["h"] == "sub.shop.example.co"
    assert row["d"] == "example.co"


def test_harvest_links_alignment_and_resolution(spark):
    html = ('<html><body>'
            '<a href="HTTP://A.COM:80/x?utm_source=t&k=1">first</a>'
            '<a class="z" href="/rel/p">second</a>'
            '<a href="//cdn.b.net/l.js">third</a>'
            '<a href="mailto:x@y.z">mail</a>'
            '<a href="#top">frag</a>'
            '</body></html>')
    pages = spark.createDataFrame(
        [(1, "https://Base.ORG:443/page", html)],
        "doc_id long, url string, html string")
    rows = {r["dst_url"]: r["anchor"]
            for r in harvest_links(pages).collect()}
    assert rows == {
        "http://a.com/x?k=1": "first",
        "https://base.org/rel/p": "second",
        "https://cdn.b.net/l.js": "third",
    }
    src = harvest_links(pages).select("src_url").first()["src_url"]
    assert src == "https://base.org/page"


def _py_pagerank(edges, rounds=6, damping_milli=850):
    """Driver-side replay of the exact integer algebra."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    base = 1_000_000 - damping_milli * 1000
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(rounds):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            s[b] += rank[a] // outdeg[a]
        rank = {n: base + (damping_milli * s[n]) // 1000
                for n in nodes}
    return rank


def test_pagerank_matches_python_replay(spark):
    import random
    rng = random.Random(11)
    edges = list({(rng.randrange(50), rng.randrange(50))
                  for _ in range(120)})
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micro"]
           for r in pagerank(df, rounds=6).collect()}
    assert got == _py_pagerank(edges, rounds=6)


def test_pagerank_sink_and_source(spark):
    # 1 -> 0, 2 -> 0: node 0 is a pure sink (dangling: its mass is
    # dropped per the documented variant), 1 and 2 settle at base
    df = spark.createDataFrame([(1, 0), (2, 0)], "src long, dst long")
    got = {r["node"]: r["rank_micro"]
           for r in pagerank(df, rounds=3).collect()}
    assert got[1] == 150_000 and got[2] == 150_000
    # round 1: 0 gets 150000 + 850*2_000_000//1000 = 1_850_000
    # round 2: contribs now 150_000 each -> 150000+850*300000//1000
    # round 3: same (1 and 2 are fixed at base)
    assert got[0] == 150_000 + (850 * 300_000) // 1000


def test_canonical_url_idempotent_and_total(spark):
    """The canonicalization contract: applying canonical_url to its
    own output is a fixpoint (idempotency — what makes the canonical
    column a valid dedup key), and the expression is total (never
    throws) on adversarial inputs. Batched: one Spark pass over ~900
    generated URLs, comparing canon(u) with canon(canon(u))."""
    import itertools
    import random
    rng = random.Random(3)
    schemes = ["http", "HTTP", "https", "HtTpS", "ftp", ""]
    auths = ["Ex.COM", "ex.com:80", "Ex.com:443", "a.b.c:8080",
             "U:p@Host.NET:80", "ex.com:", "xn--bcher-kva.de", ""]
    paths = ["", "/", "//a//b//", "/a/b/", "/a%20b/c", "/." , "///"]
    queries = ["", "?", "?b=2&a=1", "?utm_source=x", "?a=1&&b=2",
               "?a=1&utm_a=2&A=3", "?=v&k="]
    frags = ["", "#f", "#a?b=1"]
    urls = ["", "not a url", "http:/one-slash.com", "//proto.rel/x",
            "/rel/only", "mailto:a@b.c", "https://"]
    pool = list(itertools.product(schemes, auths, paths, queries, frags))
    for s, a, p, q, f in rng.sample(pool, 880):
        urls.append(f"{s}://{a}{p}{q}{f}")
    from textract_demo_spark.datapipe.webgraph import canonical_url
    df = (spark.createDataFrame([(u,) for u in urls], "u string")
          .select("u", canonical_url(F.col("u")).alias("c1"))
          .select("u", "c1", canonical_url(F.col("c1")).alias("c2")))
    rows = df.collect()  # totality: no expression error on any input
    bad = [(r["u"], r["c1"], r["c2"]) for r in rows
           if r["c1"] is not None and r["c1"] != r["c2"]]
    assert not bad, bad[:5]
    # and NULL inputs stay NULL through a second application
    assert all(r["c2"] is None for r in rows if r["c1"] is None)


def _hits_replay(edges, rounds):
    """Pure-Python mirror of the integer HITS algebra."""
    nodes = sorted({u for e in edges for u in e})
    hub = {v: 1_000_000 for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(rounds):
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[d] += hub[s]
        m = max(max(raw.values(), default=0), 1)
        auth = {v: (raw[v] * 1_000_000) // m for v in nodes}
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[s] += auth[d]
        m = max(max(raw.values(), default=0), 1)
        hub = {v: (raw[v] * 1_000_000) // m for v in nodes}
    return auth, hub


def test_hits_closed_form_two_hubs(spark):
    from textract_demo_spark.datapipe.webgraph import hits
    e = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    got = {r["node"]: (r["auth_micro"], r["hub_micro"])
           for r in hits(e, rounds=3).collect()}
    # 3 is the only authority (max-normalized to 1e6); 1 and 2 are
    # equal hubs; nothing else carries score
    assert got == {1: (0, 1_000_000), 2: (0, 1_000_000),
                   3: (1_000_000, 0)}


def test_hits_matches_python_replay(spark):
    import random
    from textract_demo_spark.datapipe.webgraph import hits
    rng = random.Random(7)
    edges = sorted({(rng.randrange(30), rng.randrange(30))
                    for _ in range(120)})
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["auth_micro"], r["hub_micro"])
           for r in hits(df, rounds=5).collect()}
    auth, hub = _hits_replay(edges, 5)
    assert got == {v: (auth[v], hub[v]) for v in auth}


def test_hits_multi_edges_count_multiply(spark):
    from textract_demo_spark.datapipe.webgraph import hits
    # 1->3 twice vs 2->4 once: 3 outranks 4 as authority
    e = spark.createDataFrame([(1, 3), (1, 3), (2, 4)],
                              "src long, dst long")
    got = {r["node"]: r["auth_micro"] for r in hits(e, rounds=1).collect()}
    assert got[3] == 1_000_000 and got[4] == 500_000


def test_robots_filter_precedence_arms(spark):
    from textract_demo_spark.datapipe.webgraph import robots_filter
    rules = spark.createDataFrame(
        [("ex.com", "/a", False), ("ex.com", "/a/b", True),
         ("ex.com", "/c", False), ("ex.com", "/c", True),
         ("deny.com", "/", False)],
        "host string, prefix string, allow boolean")
    urls = spark.createDataFrame(
        [(1, "https://ex.com/a/x"),        # /a deny
         (2, "https://ex.com/a/b/x"),      # longer /a/b allow wins
         (3, "https://ex.com/c/x"),        # equal-length tie -> allow
         (4, "https://ex.com/free"),       # no match -> default allow
         (5, "https://deny.com"),          # empty path -> '/' -> deny
         (6, "https://norules.com/x"),     # host without rules
         (7, "https://EX.com/a/x")],       # host casefold
        "id long, url string")
    got = {r["id"]: r["robots_allowed"]
           for r in robots_filter(urls, rules).collect()}
    assert got == {1: False, 2: True, 3: True, 4: True,
                   5: False, 6: True, 7: False}
