"""URL canonicalization + URL-level dedup for web-crawl tables.

The north-star input is a Common-Crawl-style pages table
(url, warc_ts, html, text, lang); a crawl re-fetches the same page
under syntactic URL variants (tracking params, fragments, host case,
``www.`` prefix, default ports, trailing slash). The standard pipeline
step is: canonicalize the URL, keep the LATEST capture per canonical
URL (warc_ts max, page_id tiebreak).

Design constraints (same as textstats):
  * pure built-in column expressions — regexp/split/filter/sort/join;
    zero Python in the hot path, runs at scan speed with pushdown.
  * every transform has a DuckDB SQL twin producing identical strings
    (regex subset chosen to behave identically under Java regex and
    RE2: no backrefs, no lookaround).

Canonicalization rules (applied in order):
  1. strip the ``#fragment``
  2. lowercase scheme and host; strip a leading ``www.``
  3. strip default ports (``:80`` for http, ``:443`` for https)
  4. empty path -> ``/``; strip one trailing ``/`` from non-root paths
  5. drop tracking query params (``utm_*``, fbclid, gclid, msclkid,
     ref), sort survivors bytewise, rejoin with ``&``; drop an empty
     query entirely

Scale shape: canonicalization is per-row projection (no shuffle);
``url_dedup`` is one exchange on the canonical URL with a partitioned
max_by window — never a global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# exact-name tracking params; utm_* handled as a prefix rule
TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "ref")


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL column (rules in the module docstring)."""
    base = F.regexp_extract(url, r"^([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)

    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1))
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)

    path = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/[^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path != "/", F.regexp_replace(path, r"/$", "")).otherwise(path)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(*TRACKING_EXACT),
    )
    qcanon = F.array_join(F.array_sort(params), "&")

    root = F.concat(scheme, F.lit("://"), hostport, path)
    return F.when(qcanon == "", root).otherwise(
        F.concat(root, F.lit("?"), qcanon)
    )


def canonical_url_sql(url: str = "url") -> str:
    """DuckDB twin of canonical_url — identical regexes (RE2-safe
    subset), identical param filter/sort."""
    # DuckDB regexp_extract yields NULL on no match where Spark yields ''
    # — coalesce every extract to keep the twins bit-identical.
    base = f"coalesce(regexp_extract({url}, '^([^?#]*)', 1), '')"
    query = f"coalesce(regexp_extract({url}, '\\?([^#]*)', 1), '')"
    scheme = (
        f"lower(coalesce(regexp_extract({base}, "
        f"'^([A-Za-z][A-Za-z0-9+.-]*)://', 1), ''))"
    )
    hp0 = (
        f"regexp_replace(lower(coalesce(regexp_extract({base}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)', 1), ''))"
        f", '^www\\.', '')"
    )
    hostport = (
        f"CASE WHEN {scheme} = 'http' AND {hp0} LIKE '%:80' "
        f"THEN regexp_replace({hp0}, ':80$', '') "
        f"WHEN {scheme} = 'https' AND {hp0} LIKE '%:443' "
        f"THEN regexp_replace({hp0}, ':443$', '') ELSE {hp0} END"
    )
    p0 = (
        f"coalesce(regexp_extract({base}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/[^?#]*)', 1), '')"
    )
    p1 = f"CASE WHEN {p0} = '' THEN '/' ELSE {p0} END"
    path = (
        f"CASE WHEN {p1} <> '/' THEN regexp_replace({p1}, '/$', '') ELSE {p1} END"
    )
    exact = ", ".join(f"'{t}'" for t in TRACKING_EXACT)
    params = (
        f"list_filter(string_split({query}, '&'), p -> p <> '' "
        f"AND NOT starts_with(p, 'utm_') "
        f"AND NOT list_contains([{exact}], regexp_extract(p, '^([^=]*)', 1)))"
    )
    # DuckDB array_to_string([]) is NULL where Spark array_join([]) is ''
    qcanon = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    root = f"concat({scheme}, '://', {hostport}, {path})"
    return (
        f"CASE WHEN {qcanon} = '' THEN {root} "
        f"ELSE concat({root}, '?', {qcanon}) END"
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "page_id",
) -> DataFrame:
    """Keep the LATEST capture per canonical URL (max ts; smallest id
    breaks exact-timestamp ties). Adds ``canonical_url``; one exchange
    on the canonical key."""
    out = df.withColumn("canonical_url", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canonical_url").orderBy(
        F.col(ts_col).desc(), F.col(id_col).asc()
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def url_dedup_sql(
    table: str,
    url: str = "url",
    ts: str = "warc_ts",
    id_col: str = "page_id",
    select: str = "*",
) -> str:
    canon = canonical_url_sql(url)
    return (
        f"SELECT {select} FROM ("
        f"  SELECT *, {canon} AS canonical_url, row_number() OVER ("
        f"    PARTITION BY {canon} ORDER BY {ts} DESC, {id_col}) AS _rn"
        f"  FROM {table}) WHERE _rn = 1"
    )


def url_domain(url: Column) -> Column:
    """Registrable-host extraction (lowercased, ``www.`` and port
    stripped) — the grouping key for domain-level corpus curation."""
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":[0-9]+$", "")


def url_domain_sql(url: str = "url") -> str:
    h = (
        f"regexp_replace(lower(coalesce(regexp_extract({url}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ''))"
        f", '^www\\.', '')"
    )
    return f"regexp_replace({h}, ':[0-9]+$', '')"


def domain_stats(
    df: DataFrame, url_col: str = "url", extra_aggs: dict | None = None
) -> DataFrame:
    """Per-domain page counts (+ caller aggregates) — the table behind
    domain-level filtering decisions (block heavy spam domains, cap
    per-domain contribution). One map-side-combinable exchange."""
    aggs = [F.count(F.lit(1)).alias("n_pages")]
    for name, col in (extra_aggs or {}).items():
        aggs.append(col.alias(name))
    return (
        df.withColumn("domain", url_domain(F.col(url_col)))
        .groupBy("domain")
        .agg(*aggs)
    )


def blocklist_filter(
    df: DataFrame, blocked_domains: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop pages whose domain is on a blocklist. The list is a
    BROADCAST side (spam/porn blocklists are millions of rows at most,
    dimension-sized next to 10^12 pages) — an anti-join, never a
    collected set when the list is a DataFrame."""
    out = df.withColumn("domain", url_domain(F.col(url_col)))
    if not blocked_domains:
        return out
    spark = df.sparkSession
    bdf = spark.createDataFrame(
        [(d,) for d in blocked_domains], "domain string"
    )
    return out.join(F.broadcast(bdf), "domain", "left_anti")


def domain_cap(
    df: DataFrame, max_per_domain: int, url_col: str = "url",
    id_col: str = "page_id", seed: int = 7,
) -> DataFrame:
    """Cap each domain's contribution at ``max_per_domain`` pages —
    the anti-over-representation step after blocklisting (one domain
    must not dominate the corpus). The kept subset is a deterministic
    uniform sample: rows are ranked inside each domain by the
    affine-cipher shuffle key (relational.shuffle_key_sql — exact
    integer math, identical in Spark and DuckDB, partitioning-
    independent), so reruns and engines agree bit-for-bit. One exchange
    on the domain key; the window is partitioned, never global."""
    from pdal_spark.operators.relational import shuffle_key_sql

    key = F.expr(shuffle_key_sql(seed, id_col))
    out = df.withColumn("domain", url_domain(F.col(url_col)))
    w = Window.partitionBy("domain").orderBy(key.asc(), F.col(id_col).asc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_domain)
        .drop("_rn")
    )


def domain_cap_sql(
    table: str, max_per_domain: int, url: str = "url",
    id_col: str = "page_id", seed: int = 7, select: str = "*",
) -> str:
    from pdal_spark.operators.relational import shuffle_key_sql

    dom = url_domain_sql(url)
    key = shuffle_key_sql(seed, id_col)
    return (
        f"SELECT {select} FROM ("
        f"  SELECT *, {dom} AS domain, row_number() OVER ("
        f"    PARTITION BY {dom} ORDER BY {key}, {id_col}) AS _rn"
        f"  FROM {table}) WHERE _rn <= {max_per_domain}"
    )


def url_path(url: Column) -> Column:
    """Path component (leading slash, no query/fragment); '' -> '/'."""
    p = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_path_sql(url: str = "url") -> str:
    p = (
        f"coalesce(regexp_extract({url}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')"
    )
    return f"CASE WHEN {p} = '' THEN '/' ELSE {p} END"


def policy_verdicts(
    df: DataFrame, rules: DataFrame, url_col: str = "url",
    id_col: str = "page_id",
) -> DataFrame:
    """Robots-style crawl-policy evaluation (RFC 9309 matching): per
    page, among the rules whose (host, path-prefix) match, the LONGEST
    prefix wins; at equal length ALLOW wins (least-restrictive rule);
    a page with no matching rule is allowed.

    ``rules`` = (host, prefix, allow) — robots rule sets are
    dimension-sized next to 10^12 pages, so the join is a BROADCAST on
    the host key with the prefix test as the join residual; unmatched
    pages ride the left join through. One partitioned window (per page
    id, over that page's handful of matched rules) picks the verdict —
    no global window, no shuffle beyond the id partition.

    Returns (id_col, host, path, rule_prefix, allowed); rule_prefix is
    NULL for unmatched pages.
    """
    pages = df.select(
        F.col(id_col),
        url_domain(F.col(url_col)).alias("host"),
        url_path(F.col(url_col)).alias("path"),
    )
    r = rules.select(
        F.col("host"), F.col("prefix"), F.col("allow").cast("boolean")
    )
    joined = pages.join(
        F.broadcast(r),
        (pages["host"] == r["host"]) & F.col("path").startswith(F.col("prefix")),
        "left",
    ).select(
        F.col(id_col), pages["host"].alias("host"), "path", "prefix", "allow"
    )
    w = Window.partitionBy(id_col).orderBy(
        F.length("prefix").desc(), F.col("allow").desc(), F.col("prefix").asc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col, "host", "path",
            F.col("prefix").alias("rule_prefix"),
            F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
        )
    )


def policy_verdicts_sql(
    pages_sql: str, rules_sql: str, url: str = "url",
    id_col: str = "page_id",
) -> str:
    """DuckDB twin: pages_sql/rules_sql are full SELECTs producing
    ({id_col}, {url}) and (host, prefix, allow)."""
    host = url_domain_sql(url)
    path = url_path_sql(url)
    return f"""
      WITH pages AS (
        SELECT {id_col}, {host} AS host, {path} AS path
        FROM ({pages_sql})
      ),
      rules AS ({rules_sql}),
      matched AS (
        SELECT p.{id_col}, p.host, p.path, r.prefix, r.allow,
               row_number() OVER (
                 PARTITION BY p.{id_col}
                 ORDER BY len(r.prefix) DESC, r.allow DESC, r.prefix ASC
               ) AS _rn
        FROM pages p
        LEFT JOIN rules r
          ON r.host = p.host AND starts_with(p.path, r.prefix)
      )
      SELECT {id_col}, host, path, prefix AS rule_prefix,
             coalesce(allow, TRUE) AS allowed
      FROM matched WHERE _rn = 1
    """


def revisit_changes(
    df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts",
    hash_col: str = "content_hash", id_col: str = "page_id",
) -> DataFrame:
    """Crawl revisit analysis: per canonical URL, captures ordered by
    time are labeled ``new`` (first capture), ``changed`` (content hash
    differs from the previous capture) or ``unchanged`` — the signal a
    recrawl scheduler and an incremental-corpus builder both key on.

    One exchange on the canonical key; the lag window is partitioned
    per URL (a URL's capture history is dozens of rows, never global).
    Returns (id_col, canonical_url, ts_col, status).
    """
    canon = canonical_url(F.col(url_col)).alias("canonical_url")
    base = df.select(F.col(id_col), canon, F.col(ts_col), F.col(hash_col))
    w = Window.partitionBy("canonical_url").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev = F.lag(hash_col).over(w)
    status = (
        F.when(prev.isNull(), F.lit("new"))
        .when(prev != F.col(hash_col), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return base.select(
        id_col, "canonical_url", ts_col, status.alias("status")
    )


def revisit_changes_sql(
    pages_sql: str, url: str = "url", ts_col: str = "warc_ts",
    hash_col: str = "content_hash", id_col: str = "page_id",
) -> str:
    canon = canonical_url_sql(url)
    return f"""
      WITH caps AS (
        SELECT {id_col}, {canon} AS canonical_url, {ts_col}, {hash_col},
               lag({hash_col}) OVER (
                 PARTITION BY {canon} ORDER BY {ts_col} ASC, {id_col} ASC
               ) AS _prev
        FROM ({pages_sql})
      )
      SELECT {id_col}, canonical_url, {ts_col},
             CASE WHEN _prev IS NULL THEN 'new'
                  WHEN _prev <> {hash_col} THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM caps
    """


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    min_count: int = 2,
) -> DataFrame:
    """URL pattern/template mining: generalize path segments —
    all-digit segments to ``{n}``, long hex runs (8+) to ``{hex}`` —
    and count occurrences per (host, template). The classic crawl-
    frontier compressor: a template with 10^6 instances is a
    parametric page family (product/{n}), which drives crawl
    prioritization, per-template sampling caps, and infinite-space
    trap detection (calendars, session ids).

    Map-only generalization (regexp + higher-order array exprs, no
    UDF) then ONE template-keyed combinable exchange. Output:
    (template, n_urls, n_pages) with n_urls >= min_count, n_pages =
    distinct concrete paths under the template.
    """
    u = F.col(url_col)
    host = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    segs = F.split(path, "/")
    gen = F.transform(
        segs,
        lambda s: F.when(s.rlike("^[0-9]+$"), F.lit("{n}"))
        .when(s.rlike("^[0-9a-f]{8,}$"), F.lit("{hex}"))
        .otherwise(s),
    )
    template = F.concat(host, F.array_join(gen, "/"))
    return (
        df.select(template.alias("template"), path.alias("_path"))
        .groupBy("template")
        .agg(
            F.count("*").alias("n_urls"),
            F.count_distinct(F.col("_path")).alias("n_pages"),
        )
        .filter(F.col("n_urls") >= min_count)
    )


def url_templates_sql(
    pages_sql: str,
    url: str = "url",
    min_count: int = 2,
) -> str:
    """DuckDB twin of url_templates (identical regexes; list_transform
    + CASE mirrors the engine's generalization)."""
    return f"""
WITH p AS (
  SELECT
    lower(regexp_extract({url},
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)) AS host,
    regexp_extract({url},
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path
  FROM ({pages_sql})
),
t AS (
  SELECT host || array_to_string(
           list_transform(string_split(path, '/'),
             s -> CASE WHEN regexp_matches(s, '^[0-9]+$') THEN '{{n}}'
                       WHEN regexp_matches(s, '^[0-9a-f]{{8,}}$')
                         THEN '{{hex}}'
                       ELSE s END),
           '/') AS template,
         path
  FROM p
)
SELECT template, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT path) AS BIGINT) AS n_pages
FROM t GROUP BY template
HAVING count(*) >= {int(min_count)}
""".strip()


def parse_robots(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse raw robots.txt text into the (host, prefix, allow) rule
    table `policy_verdicts` consumes (RFC 9309 grammar subset:
    User-agent / Allow / Disallow lines, '#' comments, case-insensitive
    directive names, groups formed by consecutive User-agent lines).

    The group-membership rule is computed RELATIONALLY so the DuckDB
    twin is exact: a User-agent line STARTS a new group iff the
    previous line is not a User-agent line (running sum of starts =
    group id), and a directive belongs to the group with the greatest
    id among User-agent lines above it (running max over the line
    order). Everything is one explode + per-host windows — no stateful
    kernel, no UDF; a 10^8-host robots corpus parses at scan speed
    with one host-keyed exchange.

    Group selection follows RFC 9309 §2.2.1 (most specific match
    only): a named group matches when its user-agent token is a
    case-insensitive PREFIX of the crawler's product token (so groups
    'foo' and 'foobot' both match agent 'foobot'); among matching
    named groups, only those bearing the LONGEST matching token apply
    (here 'foobot' — groups tied at that length are unioned, per the
    RFC's merge-of-matching-groups rule), and the '*' groups bind only
    on hosts with no matching named group — a per-host anti-join, not
    a union (the r2 union could flip policy_verdicts for named
    agents). Empty patterns are dropped (RFC: they match nothing).
    Returns (host, prefix, allow).
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.col(robots_col), "\n")
        ).alias("idx", "line"),
    ).withColumn(
        "line", F.trim(F.regexp_replace("line", "#.*$", ""))
    ).filter(F.col("line") != "")
    key = F.lower(F.regexp_extract("line", "^([A-Za-z-]+)\\s*:", 1))
    val = F.trim(F.regexp_extract("line", "^[A-Za-z-]+\\s*:(.*)$", 1))
    typed = lines.select(
        "host", "idx", key.alias("key"), val.alias("val")
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("idx")
    is_ua = (F.col("key") == "user-agent").cast("int")
    grouped = (
        typed.withColumn("_ua", is_ua)
        .withColumn("_prev_ua", F.coalesce(F.lag("_ua").over(w), F.lit(0)))
        .withColumn(
            "_start", ((F.col("_ua") == 1) & (F.col("_prev_ua") == 0)).cast("int")
        )
        .withColumn("_gid", F.sum("_start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    # directives bind to the last group STARTED at or before them; a
    # directive before any user-agent line has _gid 0 -> dropped
    dirs = grouped.filter(F.col("_ua") == 0).select(
        "host", "idx",
        F.col("_gid").alias("gid"),
        (F.col("key") == "allow").alias("allow"),
        F.col("val").alias("prefix"),
    ).filter(F.col("prefix") != "")
    uas = grouped.filter(F.col("_ua") == 1).select(
        "host", F.col("_gid").alias("gid"), F.lower("val").alias("agent")
    )
    matched = uas.filter(
        (F.col("agent") != "*") & (F.col("agent") != "")
        & F.lit(agent.lower()).startswith(F.col("agent"))
    )
    wh = Window.partitionBy("host")
    named = (
        matched.withColumn("_len", F.length("agent"))
        .withColumn("_best", F.max("_len").over(wh))
        .filter(F.col("_len") == F.col("_best"))
        .select("host", "gid")
    )
    wild = uas.filter(F.col("agent") == "*").select("host", "gid")
    wanted = named.unionByName(
        wild.join(named.select("host").distinct(), "host", "anti")
    ).distinct()
    return (
        dirs.join(wanted, ["host", "gid"])
        .select("host", "prefix", "allow")
        .distinct()
    )


def parse_robots_sql(
    src: str, host: str = "host", robots: str = "robots_txt",
    agent: str = "*",
) -> str:
    """DuckDB twin of parse_robots (same relational group math)."""
    return f"""
      WITH lines0 AS (
        SELECT host, u.s.idx AS idx,
               trim(regexp_replace(u.s.line, '#.*$', '')) AS line
        FROM (SELECT {host} AS host,
                     string_split({robots}, chr(10)) AS parts
              FROM ({src}))
        CROSS JOIN LATERAL (
          SELECT unnest(list_transform(
            range(len(parts)),
            i -> struct_pack(idx := i, line := parts[i + 1])
          )) AS s
        ) u
      ),
      typed AS (
        SELECT host, idx,
               lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS key,
               trim(regexp_extract(line, '^[A-Za-z-]+\\s*:(.*)$', 1)) AS val
        FROM lines0
        WHERE line <> ''
          AND lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1))
              IN ('user-agent', 'allow', 'disallow')
      ),
      flagged AS (
        SELECT host, idx, key, val,
               CASE WHEN key = 'user-agent' THEN 1 ELSE 0 END AS ua,
               coalesce(lag(CASE WHEN key = 'user-agent' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY host ORDER BY idx), 0) AS prev_ua
        FROM typed
      ),
      grouped AS (
        SELECT host, idx, key, val, ua,
               sum(CASE WHEN ua = 1 AND prev_ua = 0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY host ORDER BY idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS gid
        FROM flagged
      ),
      dirs AS (
        SELECT host, gid, key = 'allow' AS allow, val AS prefix
        FROM grouped WHERE ua = 0 AND val <> ''
      ),
      matched AS (
        -- RFC 9309 most-specific match: token is a prefix of the
        -- crawler's product token; longest matching token wins.
        SELECT host, gid, len(lower(val)) AS l FROM grouped
        WHERE ua = 1 AND lower(val) <> '*' AND val <> ''
          AND starts_with('{agent.lower()}', lower(val))
      ),
      named AS (
        SELECT DISTINCT host, gid FROM (
          SELECT host, gid, l, max(l) OVER (PARTITION BY host) AS best
          FROM matched
        ) WHERE l = best
      ),
      wild AS (
        SELECT DISTINCT host, gid FROM grouped
        WHERE ua = 1 AND lower(val) = '*'
      ),
      wanted AS (
        SELECT host, gid FROM named
        UNION
        SELECT host, gid FROM wild w
        WHERE NOT EXISTS (SELECT 1 FROM named n WHERE n.host = w.host)
      )
      SELECT DISTINCT d.host, d.prefix, d.allow
      FROM dirs d JOIN wanted w USING (host, gid)
    """


def domain_quality_screen(
    df: DataFrame, pass_col, by: str = "domain",
    z: float = 1.96, min_lower: float = 0.5,
) -> DataFrame:
    """Domain-level quality screening with a Wilson score lower bound
    (Wilson 1927; the "how not to sort by average rating" correction):
    a domain is kept when the CONFIDENCE LOWER BOUND of its per-page
    pass rate clears ``min_lower`` — a domain with 2/2 passing pages
    (rate 1.0, bound ~0.34 at z=1.96) is NOT treated like one with
    2000/2000 (bound ~0.998), which is exactly the mistake a raw-rate
    threshold makes on the long tail of small domains.

    One map-side-combined aggregate per domain (counts only), then a
    single closed-form double expression over the integer counts —
    deterministic, bit-comparable cross-engine. ``pass_col`` is any
    boolean Column (compose with gopher_rules / quality_score /
    classifier verdicts upstream).

    -> (by, n_pages, n_pass, rate, wilson_lower, keep)."""
    agg = df.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(pass_col.cast("long")).alias("n_pass"),
    )
    n = F.col("n_pages").cast("double")
    p = F.col("n_pass").cast("double") / n
    z2 = z * z
    lower = (
        (p + z2 / (2 * n)
         - z * F.sqrt((p * (1 - p) + z2 / (4 * n)) / n))
        / (1 + z2 / n)
    )
    return agg.select(
        by, "n_pages", "n_pass",
        F.round(p, 6).alias("rate"),
        F.round(lower, 6).alias("wilson_lower"),
        (lower >= min_lower).cast("int").alias("keep"),
    )


def domain_quality_screen_sql(
    src: str, pass_expr: str, by: str = "domain",
    z: float = 1.96, min_lower: float = 0.5,
) -> str:
    """DuckDB twin of domain_quality_screen (same closed form)."""
    z2 = z * z
    n = "CAST(n_pages AS DOUBLE)"
    p = f"(CAST(n_pass AS DOUBLE) / {n})"
    lower = (
        f"(({p} + {z2} / (2 * {n}) - {z} * sqrt(({p} * (1 - {p})"
        f" + {z2} / (4 * {n})) / {n})) / (1 + {z2} / {n}))"
    )
    return f"""
      WITH agg AS (
        SELECT {by}, count(*) AS n_pages,
               CAST(sum(CASE WHEN {pass_expr} THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_pass
        FROM ({src}) GROUP BY {by}
      )
      SELECT {by}, n_pages, n_pass,
             round({p}, 6) AS rate,
             round({lower}, 6) AS wilson_lower,
             CAST({lower} >= {min_lower} AS INT) AS keep
      FROM agg
    """
