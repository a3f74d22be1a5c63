

def test_parse_robots_semantics(spark):
    """RFC 9309 grammar subset: comments, group formation by
    consecutive User-agent lines, wildcard vs named agent, empty
    patterns dropped, pre-group directives ignored."""
    from pdal_spark.datapipe import weburl

    txt = "\n".join([
        "Disallow: /orphan",          # before any group -> ignored
        "# policy",
        "User-agent: googlebot",
        "Disallow: /g-only   # trailing comment",
        "",
        "User-agent: *",
        "Disallow: /private",
        "Allow: /private/pub",
        "Disallow:",                  # empty pattern -> dropped
        "User-agent: badbot",
        "User-agent: otherbot",       # consecutive UA lines: one group
        "Disallow: /",
    ])
    df = spark.createDataFrame([("h1", txt)], "host string, robots_txt string")
    star = {(r.prefix, r.allow) for r in weburl.parse_robots(df).collect()}
    assert star == {("/private", False), ("/private/pub", True)}
    goog = {(r.prefix, r.allow)
            for r in weburl.parse_robots(df, agent="googlebot").collect()}
    # RFC 9309 §2.2.1 most-specific match: a host with a googlebot
    # group applies ONLY that group — the '*' group is ignored
    assert goog == {("/g-only", False)}
    bad = {(r.prefix, r.allow)
           for r in weburl.parse_robots(df, agent="badbot").collect()}
    assert ("/", False) in bad
    other = {(r.prefix, r.allow)
             for r in weburl.parse_robots(df, agent="otherbot").collect()}
    assert ("/", False) in other  # second UA header of the same group


def test_parse_robots_feeds_policy_verdicts(spark):
    from pdal_spark.datapipe import weburl

    txt = "User-agent: *\nDisallow: /private\nAllow: /private/pub"
    robots = spark.createDataFrame(
        [("example.com", txt)], "host string, robots_txt string"
    )
    rules = weburl.parse_robots(robots).withColumnRenamed("host", "host")
    pages = spark.createDataFrame(
        [
            (1, "https://example.com/private/x"),
            (2, "https://example.com/private/pub/y"),
            (3, "https://example.com/open"),
        ],
        "page_id long, url string",
    )
    got = {r.page_id: r.allowed for r in weburl.policy_verdicts(
        pages, rules.selectExpr("host", "prefix", "allow")).collect()}
    assert got == {1: False, 2: True, 3: True}


def test_wilson_domain_screen(spark):
    """2/2 passing is NOT judged like 2000/2000: same rate, very
    different lower bounds; the bound is the scipy-free closed form."""
    from pdal_spark.datapipe import weburl
    from pyspark.sql import functions as F

    rows = [("tiny", 1)] * 2 + [("big", 1)] * 2000 + [("mid", 1)] * 30 \
        + [("mid", 0)] * 10
    df = spark.createDataFrame(rows, "domain string, ok int")
    out = {r.domain: r for r in weburl.domain_quality_screen(
        df, pass_col=F.col("ok") == 1).collect()}
    assert out["tiny"].rate == 1.0 and out["big"].rate == 1.0
    assert out["tiny"].wilson_lower < 0.45      # ~0.34
    assert out["big"].wilson_lower > 0.99
    assert out["tiny"].keep == 0 and out["big"].keep == 1
    # closed-form check at z=1.96, n=40, k=30
    import math
    n, p, z = 40.0, 0.75, 1.96
    lo = (p + z*z/(2*n) - z*math.sqrt((p*(1-p) + z*z/(4*n))/n)) / (1 + z*z/n)
    assert abs(out["mid"].wilson_lower - round(lo, 6)) < 1e-9
    assert out["mid"].keep == (1 if lo >= 0.5 else 0)


def test_parse_robots_wildcard_fallback_per_host(spark):
    """The wildcard fallback is PER HOST: a host without a named group
    uses its '*' group even when another host names the agent; and the
    SQL twin implements the same rule."""
    import duckdb
    from pdal_spark.datapipe import weburl

    t1 = "User-agent: googlebot\nDisallow: /g\nUser-agent: *\nDisallow: /a"
    t2 = "User-agent: *\nDisallow: /b"
    df = spark.createDataFrame(
        [("h1", t1), ("h2", t2)], "host string, robots_txt string"
    )
    got = {(r.host, r.prefix)
           for r in weburl.parse_robots(df, agent="googlebot").collect()}
    assert got == {("h1", "/g"), ("h2", "/b")}
    con = duckdb.connect()
    con.register("robots", df.toPandas())
    sql = weburl.parse_robots_sql("SELECT * FROM robots", agent="googlebot")
    ora = {(r.host, r.prefix) for _, r in con.sql(sql).df().iterrows()}
    assert ora == got


def test_parse_robots_longest_prefix_match(spark):
    """RFC 9309 §2.2.1 longest-match selection: group tokens match by
    case-insensitive prefix of the crawler token, the longest matching
    token wins, ties at that length are unioned, wildcard only when no
    named token matches — in the Spark path AND the DuckDB twin."""
    import duckdb
    from pdal_spark.datapipe import weburl

    txt = "\n".join([
        "User-agent: foo",
        "Disallow: /short",
        "User-agent: foobot",
        "Disallow: /long1",
        "User-agent: FOOBOT",        # tie at longest length -> unioned
        "Disallow: /long2",
        "User-agent: *",
        "Disallow: /star",
    ])
    df = spark.createDataFrame([("h1", txt)], "host string, robots_txt string")

    def run(agent):
        return {(r.prefix, r.allow)
                for r in weburl.parse_robots(df, agent=agent).collect()}

    # exact crawler token: both length-6 groups, not 'foo', not '*'
    assert run("foobot") == {("/long1", False), ("/long2", False)}
    # crawler token extends past every group token: prefix match still
    # selects the longest ('foobot' over 'foo')
    assert run("foobot-news") == {("/long1", False), ("/long2", False)}
    # only the short token is a prefix of 'foox'
    assert run("foox") == {("/short", False)}
    # nothing matches -> wildcard group
    assert run("barbot") == {("/star", False)}

    con = duckdb.connect()
    con.register("robots", df.toPandas())
    for agent, want in [
        ("foobot-news", {("/long1", False), ("/long2", False)}),
        ("foox", {("/short", False)}),
        ("barbot", {("/star", False)}),
    ]:
        sql = weburl.parse_robots_sql("SELECT * FROM robots", agent=agent)
        ora = {(r.prefix, bool(r.allow))
               for _, r in con.sql(sql).df().iterrows()}
        assert ora == want, agent
