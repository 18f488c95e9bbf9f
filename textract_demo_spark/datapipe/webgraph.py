"""Web-graph operators for crawl-scale corpora: URL canonicalization,
hyperlink harvesting from HTML payloads, and integer fixed-point
PageRank over the resulting link graph.

These are beyond-reference training-pipeline operators (like the rest
of ``datapipe``): a 100 TB web crawl needs URL-level dedup BEFORE
content-level dedup (the same page arrives under ``http://`` /
``https://`` / tracking-parameter / fragment variants), and link-graph
centrality is the classic quality prior for crawl corpora (page rank
as a curation feature, per Common Crawl / C4 practice).

Scale notes (the design constraints at 10^12 pages):
- ``canonical_url`` / ``url_host`` / ``url_domain`` are narrow per-row
  JVM expressions (regexp + higher-order array functions) — zero
  shuffles, whole-stage codegen, no Python. Canonical form is a pure
  function of the input string, so URL dedup is an exact hash-groupBy
  downstream (``dedup.exact_duplicates`` on the canonical column).
- ``harvest_links`` is one generate (explode) over per-row regex
  matches — link extraction never leaves the row, and resolution
  (protocol-relative, root-relative) is CASE algebra on the base
  URL's parsed parts. No join against the page table is needed
  because the base parts ride the row.
- ``pagerank`` iterates rank = base + d * sum(rank/outdeg) with ALL
  arithmetic in integer micro-units (rank_micro BIGINT, damping in
  milli): bit-identical across engines, partitions and retries —
  the property that lets a DuckDB oracle replay the exact values
  (float PageRank can only ever be compared approximately). Each
  round is ONE shuffle (groupBy dst) plus a join against the
  edge+outdeg frame, which is checkpointed once and reused every
  round; per-round eager ``localCheckpoint`` bounds plan lineage the
  same way ``dedup.star_clusters`` does (iterative self-referential
  plans OOM the driver's plan string long before the data hurts).
  Dangling-node mass is dropped (documented variant; the oracle
  replays the same variant so parity is exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One regex, shared verbatim with the DuckDB oracle (RE2-safe: no
# backrefs, no lookaround). Groups: 1 scheme, 2 authority, 3 path,
# 4 query (with leading '?').
URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?"

# Tracking parameters stripped during canonicalization (name-prefix
# match, applied to the key side of key=value).
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref_src)="

# Anchor-tag regex shared verbatim with the oracle. Two capture
# groups — href and anchor text; calling regexp_extract_all twice
# with idx=1 / idx=2 yields index-aligned arrays because the match
# sequence is identical. (?i) case-insensitivity and [^<>"]-style
# classes are RE2-safe. Contract (documented fast path): double-
# quoted href, no '<' inside the anchor text; nested markup inside
# <a> is out of scope for the harvester (the extraction core owns
# full tokenization).
ANCHOR_RE = r'(?i)<a\s[^>]*href="([^"#][^"]*)"[^>]*>([^<]*)</a>'


def _parts(url: Column) -> tuple[Column, Column, Column, Column]:
    u = F.trim(url)
    return (F.lower(F.regexp_extract(u, URL_RE, 1)),
            F.lower(F.regexp_extract(u, URL_RE, 2)),
            F.regexp_extract(u, URL_RE, 3),
            F.regexp_extract(u, URL_RE, 4))


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL, as a pure
    narrow expression:

    - scheme and authority lowercased;
    - default port stripped (``:80`` for http, ``:443`` for https);
    - fragment dropped (never part of the resource);
    - path: duplicate slashes collapsed, trailing slashes stripped,
      empty path becomes ``/``;
    - query: split on ``&``, empty and tracking params
      (``utm_*``/``fbclid``/``gclid``/``msclkid``/``ref_src``)
      removed, remaining params sorted (param order is not
      semantic), ``?`` dropped when nothing survives.

    Returns NULL for strings that do not parse as scheme://authority
    (relative references must be resolved first — see
    ``harvest_links``).
    """
    scheme, auth, path, query = _parts(url)
    auth = (F.when(scheme == "http",
                   F.regexp_replace(auth, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(auth, ":443$", ""))
            .otherwise(auth))
    path = F.regexp_replace(F.regexp_replace(path, "/{2,}", "/"),
                            "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE)))
    qcanon = F.when(F.size(params) > 0,
                    F.concat(F.lit("?"), F.array_join(params, "&"))
                    ).otherwise(F.lit(""))
    return (F.when((scheme != "") & (auth != ""),
                   F.concat(scheme, F.lit("://"), auth, path, qcanon))
            .otherwise(F.lit(None)))


def url_host(url: Column) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    _, auth, _, _ = _parts(url)
    return F.regexp_replace(F.regexp_replace(auth, "^[^@]*@", ""),
                            ":[0-9]*$", "")


def url_domain(url: Column) -> Column:
    """Naive registered domain: the last two dot-labels of the host.
    (A public-suffix list is deployment CONFIG, not code — at scale
    it arrives as a broadcast dim joined on the suffix; the two-label
    fallback here is the suffix-list-absent behavior.)"""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def harvest_links(pages: DataFrame, id_col: str = "doc_id",
                  url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """Harvest anchor links from HTML payloads: one per-row regex
    pass (no Python, no join), resolution against the page's own URL,
    canonicalization of the result.

    Resolution contract: absolute ``http(s)://`` kept as-is;
    protocol-relative ``//host/...`` takes the base scheme;
    root-relative ``/path`` takes the base scheme+authority; other
    forms (mailto:, javascript:, fragment-only, dotted-relative) are
    dropped — the documented crawl-frontier subset. Output one row
    per kept link: (id, src_url, dst_url, anchor), with both URLs
    canonical.
    """
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 1)
    texts = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 2)
    base_scheme, base_auth, _, _ = _parts(F.col(url_col))
    link = F.col("lnk.href")
    resolved = (
        F.when(link.rlike("^(?i)https?://"), link)
        .when(link.startswith("//"),
              F.concat(F.col("_bsch"), F.lit(":"), link))
        .when(link.startswith("/"),
              F.concat(F.col("_bsch"), F.lit("://"), F.col("_bauth"),
                       link))
        .otherwise(F.lit(None)))
    return (pages
            .select(F.col(id_col),
                    canonical_url(F.col(url_col)).alias("src_url"),
                    base_scheme.alias("_bsch"),
                    base_auth.alias("_bauth"),
                    F.explode(F.arrays_zip(hrefs.alias("href"),
                                           texts.alias("anchor")))
                     .alias("lnk"))
            .select(id_col, "src_url",
                    canonical_url(resolved).alias("dst_url"),
                    F.trim(F.col("lnk.anchor")).alias("anchor"))
            .filter(F.col("dst_url").isNotNull()))


def pagerank(edges: DataFrame, rounds: int = 8,
             damping_milli: int = 850,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Integer fixed-point PageRank over (src, dst) edges.

    rank_micro starts at 1_000_000 per node; each round
    ``rank' = base + (damping_milli * sum(rank div outdeg)) div 1000``
    with ``base = 1_000_000 - damping_milli * 1000`` (i.e. 150_000 at
    d=0.85) — every operation is BIGINT, so the trajectory is
    bit-identical on any engine/partitioning and a SQL oracle can
    replay it exactly. Fixed round count (power iteration converges
    geometrically; rounds is a parameter, not a fixpoint test,
    because downstream consumers want deterministic cost).

    Per round: one groupBy(dst) exchange (map-side partial sum) and
    one equi join of the rank frame against the once-checkpointed
    edge+outdeg frame. Nodes with no in-links settle at base; mass
    from dangling nodes is dropped (documented variant, replayed
    by the oracle).

    Output: (node, rank_micro) for every node appearing as src or
    dst.
    """
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint())  # referenced every round: without the
    # cut, each round's plan re-runs the edge-wide distinct exchange
    ew = (e.join(e.groupBy("src").agg(F.count("*").alias("outdeg")),
                 "src")
          .localCheckpoint())  # reused every round: cut once
    ranks = nodes.select(
        "node", F.lit(1_000_000).cast("long").alias("rank_micro"))
    for _ in range(rounds):
        ranks = (_pr_round(ew, nodes, ranks, damping_milli)
                 .localCheckpoint())  # bound the iterative lineage
    return ranks


def _pr_round(ew: DataFrame, nodes: DataFrame, ranks: DataFrame,
              damping_milli: int) -> DataFrame:
    """One power-iteration round (not yet checkpointed) — split out
    so the plan gate can assert its physical shape: one partial-
    aggregated groupBy(dst) exchange, key-equi joins only."""
    base = 1_000_000 - damping_milli * 1000
    contrib = (ew.join(ranks, ew.src == ranks.node)
               .select("dst",
                       F.expr("rank_micro div outdeg").alias("c"))
               .groupBy("dst").agg(F.sum("c").alias("s")))
    return (nodes
            .join(contrib, nodes.node == contrib.dst, "left")
            .select("node",
                    (F.lit(base) +
                     F.expr(f"({damping_milli} * coalesce(s, 0))"
                            f" div 1000"))
                    .cast("long").alias("rank_micro")))


def hits(edges: DataFrame, rounds: int = 6,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Integer fixed-point HITS (Kleinberg 1999) hubs/authorities over
    (src, dst) edges — PageRank's companion centrality: authorities
    are what hub pages point AT, hubs are pages that point at good
    authorities (for a crawl corpus: directory/index pages vs content
    pages — a useful curation split PageRank alone cannot make).

    Mutual recursion per round: ``auth'(v) = sum of hub(u) over edges
    u->v`` then ``hub'(u) = sum of auth'(v) over edges u->v``, each
    rescaled so max = 1_000_000 (max-normalization replaces the
    classic L2 norm: same fixpoint DIRECTION, but integer-exact —
    ``(s * 1_000_000) div max(s)`` is pure BIGINT, so the trajectory
    is bit-identical across engines/partitionings and the DuckDB
    oracle replays exact values; float L2 could only compare
    approximately). Multi-edges count multiply (documented; the
    oracle replays the same). Overflow bound: raw sums reach
    n_neighbors * 10^6 and the rescale multiplies by 10^6, so BIGINT
    holds through ~9 * 10^6 in-neighbors per node; beyond that,
    pre-divide the raw sums (deployment note, not needed at any
    realistic in-degree).

    Per round: TWO partial-aggregated exchanges (groupBy dst, groupBy
    src) against the once-checkpointed edge frame, plus two one-row
    max aggregates that broadcast back — no global window, no
    cartesian. Per-round localCheckpoint bounds the iterative plan
    lineage exactly like ``pagerank``.

    Output: (node, auth_micro, hub_micro) for every node.
    """
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint())  # same cut as pagerank: nodes is
    # referenced twice per round (both rescales)
    e = e.localCheckpoint()
    state = nodes.select(
        "node", F.lit(0).cast("long").alias("auth_micro"),
        F.lit(1_000_000).cast("long").alias("hub_micro"))
    for _ in range(rounds):
        state = _hits_round(e, nodes, state).localCheckpoint()
    return state


def _rescale_max(raw: DataFrame, nodes: DataFrame, key: str,
                 out: str) -> DataFrame:
    """(key, s) raw sums -> (node, out) with max rescaled to 1e6;
    nodes absent from ``raw`` get 0. The max is a one-row aggregate
    broadcast back (never a collect)."""
    m = raw.agg(F.expr("greatest(coalesce(max(s), 1), 1)").alias("m"))
    return (nodes
            .join(raw, nodes.node == F.col(key), "left")
            .crossJoin(F.broadcast(m))
            .select("node",
                    F.expr("coalesce((s * 1000000) div m, 0)")
                    .cast("long").alias(out)))


def _hits_round(e: DataFrame, nodes: DataFrame,
                state: DataFrame) -> DataFrame:
    """One auth-then-hub update (split out for the plan gate)."""
    araw = (e.join(state.select("node", "hub_micro"),
                   e.src == F.col("node"))
            .groupBy("dst").agg(F.sum("hub_micro").alias("s")))
    auths = _rescale_max(araw, nodes, "dst", "auth_micro")
    hraw = (e.join(auths, e.dst == auths.node)
            .groupBy("src").agg(F.sum("auth_micro").alias("s")))
    hubs = _rescale_max(hraw, nodes, "src", "hub_micro")
    return auths.join(hubs, "node")


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Crawl-frontier robots gating: mark each URL allowed/denied by
    its host's path-prefix rules, longest-match-wins, allow wins
    length ties, default-allow when nothing matches (the
    Google/RFC 9309 precedence rules for the plain-prefix subset;
    wildcards are out of scope — documented).

    ``rules``: (host, prefix, allow) — the parsed robots corpus (a
    few rules per host; a DIMENSION, not data). Scale shape: rules
    collapse to one (host, array<struct>) row per host, broadcast,
    and the precedence fold is a per-row ``aggregate`` over the
    (tiny) matched-rule array — ZERO shuffle of the frontier, which
    is the 10^12-row side. Matching applies to path+query of the
    URL (path '' treated as '/'), hosts compared lowercased.

    Output: input columns + ``robots_allowed`` boolean.
    """
    rdim = (rules
            .groupBy(F.lower(F.col("host")).alias("_rhost"))
            .agg(F.collect_list(
                F.struct(F.col("prefix"),
                         F.col("allow").cast("boolean").alias("allow"))
            ).alias("_rules")))
    _, _, path, query = _parts(F.col(url_col))
    pathq = F.concat(F.when(path == "", F.lit("/")).otherwise(path),
                     query)
    # precedence fold: start at (len=-1, allow=true) = default-allow;
    # a matched rule replaces the accumulator iff strictly longer, or
    # equal-length upgrading deny->allow
    decide = F.expr("""
        aggregate(
          filter(_rules, r -> startswith(_pq, r.prefix)),
          named_struct('len', -1, 'allow', true),
          (acc, r) -> IF(length(r.prefix) > acc.len
                         OR (length(r.prefix) = acc.len AND r.allow
                             AND NOT acc.allow),
                         named_struct('len', length(r.prefix),
                                      'allow', r.allow),
                         acc),
          acc -> acc.allow)""")
    return (urls
            .withColumn("_uhost", url_host(F.col(url_col)))
            .join(F.broadcast(rdim),
                  F.col("_uhost") == F.col("_rhost"), "left")
            .withColumn("_pq", pathq)
            .withColumn("robots_allowed",
                        F.when(F.col("_rules").isNull(), F.lit(True))
                        .otherwise(decide))
            .drop("_uhost", "_rhost", "_rules", "_pq"))


def hits_oracle_sql(edges_cte: str, rounds: int = 6,
                    final_sql: str | None = None) -> str:
    """DuckDB replay of ``hits``: unrolled WITH-chain of the same
    integer algebra (same unroll rationale as
    ``pagerank_oracle_sql``). Every chain CTE is ``AS MATERIALIZED``:
    each raw-sum CTE is referenced TWICE (by its max CTE and by the
    rescale), so DuckDB's default inlining would re-expand the whole
    prefix at every reference — ~4^rounds blowup (measured: minutes
    at 10k nodes; materialized: milliseconds). ``final_sql``
    (referencing ``a{rounds}`` and ``h{rounds}``) overrides the
    default final SELECT."""
    parts = [f"e AS MATERIALIZED ({edges_cte})",
             "n AS MATERIALIZED (SELECT src AS node FROM e UNION "
             "SELECT dst AS node FROM e)",
             "h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT)"
             " AS hub_micro FROM n)"]
    for i in range(rounds):
        parts += [
            f"a{i + 1}r AS MATERIALIZED (SELECT e.dst AS k,"
            f" sum(h.hub_micro) AS s"
            f" FROM e JOIN h{i} h ON h.node = e.src GROUP BY e.dst)",
            f"a{i + 1}m AS MATERIALIZED (SELECT"
            f" greatest(coalesce(max(s), 1), 1)"
            f" AS m FROM a{i + 1}r)",
            f"a{i + 1} AS MATERIALIZED (SELECT n.node, CAST(coalesce("
            f"(r.s * 1000000) // q.m, 0) AS BIGINT) AS auth_micro"
            f" FROM n LEFT JOIN a{i + 1}r r ON r.k = n.node,"
            f" a{i + 1}m q)",
            f"h{i + 1}r AS MATERIALIZED (SELECT e.src AS k,"
            f" sum(a.auth_micro) AS s"
            f" FROM e JOIN a{i + 1} a ON a.node = e.dst"
            f" GROUP BY e.src)",
            f"h{i + 1}m AS MATERIALIZED (SELECT"
            f" greatest(coalesce(max(s), 1), 1)"
            f" AS m FROM h{i + 1}r)",
            f"h{i + 1} AS MATERIALIZED (SELECT n.node, CAST(coalesce("
            f"(r.s * 1000000) // q.m, 0) AS BIGINT) AS hub_micro"
            f" FROM n LEFT JOIN h{i + 1}r r ON r.k = n.node,"
            f" h{i + 1}m q)"]
    final = final_sql or (
        f"SELECT a.node, a.auth_micro, h.hub_micro"
        f" FROM a{rounds} a JOIN h{rounds} h ON h.node = a.node")
    return "WITH " + ",\n".join(parts) + "\n" + final


def _sch_sql(u: str) -> str:
    return f"lower(regexp_extract(trim({u}), '{URL_RE}', 1))"


def _auth_sql(u: str) -> str:
    return f"lower(regexp_extract(trim({u}), '{URL_RE}', 2))"


def canonical_url_sql(u: str) -> str:
    """DuckDB expression replaying ``canonical_url`` over the SQL
    expression ``u`` — the independent oracle arm. Dialect traps
    handled here so the two engines stay bit-equal: DuckDB
    regexp_replace is first-match-only without the 'g' flag (Spark
    replaces all), and list_sort/array_sort agree on ascending
    string order."""
    sch, auth0 = _sch_sql(u), _auth_sql(u)
    path0 = f"regexp_extract(trim({u}), '{URL_RE}', 3)"
    q0 = f"regexp_extract(trim({u}), '{URL_RE}', 4)"
    auth = (f"CASE WHEN {sch} = 'http' THEN"
            f" regexp_replace({auth0}, ':80$', '')"
            f" WHEN {sch} = 'https' THEN"
            f" regexp_replace({auth0}, ':443$', '')"
            f" ELSE {auth0} END")
    path1 = (f"regexp_replace(regexp_replace({path0},"
             f" '/{{2,}}', '/', 'g'), '/+$', '', 'g')")
    path = f"CASE WHEN {path1} = '' THEN '/' ELSE {path1} END"
    params = (f"list_sort(list_filter(string_split("
              f"regexp_replace({q0}, '^\\?', ''), '&'),"
              f" x -> x != '' AND NOT regexp_matches(x,"
              f" '{TRACKING_RE}')))")
    qc = (f"CASE WHEN len({params}) > 0 THEN"
          f" '?' || array_to_string({params}, '&') ELSE '' END")
    return (f"CASE WHEN {sch} != '' AND {auth} != '' THEN"
            f" {sch} || '://' || {auth} || {path} || {qc}"
            f" ELSE NULL END")


def url_host_sql(u: str) -> str:
    """DuckDB replay of ``url_host``."""
    return (f"regexp_replace(regexp_replace({_auth_sql(u)},"
            f" '^[^@]*@', ''), ':[0-9]*$', '')")


def url_domain_sql(u: str) -> str:
    """DuckDB replay of ``url_domain``."""
    return f"regexp_extract({url_host_sql(u)}, '([^.]+\\.[^.]+)$', 1)"


def pagerank_oracle_sql(edges_cte: str, rounds: int = 8,
                        damping_milli: int = 850,
                        final_sql: str | None = None) -> str:
    """DuckDB SQL replaying ``pagerank`` exactly: the caller supplies
    an edge CTE body (columns src, dst) and gets back a WITH-chain of
    ``rounds`` unrolled iterations of the identical integer algebra
    (DuckDB disallows aggregates in recursive CTE terms, and an
    unrolled chain is the honest mirror of the fixed-round loop
    anyway). ``final_sql`` (referencing ``r{rounds}``) overrides the
    default final SELECT of (node, rank_micro)."""
    base = 1_000_000 - damping_milli * 1000
    parts = [f"e AS ({edges_cte})",
             "n AS (SELECT src AS node FROM e UNION "
             "SELECT dst AS node FROM e)",
             "ew AS (SELECT e.src, e.dst, o.outdeg FROM e JOIN "
             "(SELECT src, count(*) AS outdeg FROM e GROUP BY src) o"
             " USING (src))",
             "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS "
             "rank_micro FROM n)"]
    for i in range(rounds):
        parts.append(
            f"r{i + 1} AS (SELECT n.node, CAST({base} + "
            f"({damping_milli} * coalesce(c.s, 0)) // 1000 AS BIGINT)"
            f" AS rank_micro FROM n LEFT JOIN "
            f"(SELECT ew.dst, sum(r.rank_micro // ew.outdeg) AS s "
            f"FROM ew JOIN r{i} r ON r.node = ew.src GROUP BY ew.dst)"
            f" c ON c.dst = n.node)")
    final = final_sql or f"SELECT node, rank_micro FROM r{rounds}"
    return "WITH " + ",\n".join(parts) + "\n" + final
