

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
    # a named agent matches its own group AND the wildcard group
    assert goog == {("/g-only", False),
                    ("/private", False), ("/private/pub", True)}
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
