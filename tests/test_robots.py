"""robots.txt parsing + longest-match URL policy (sources/robots.py)."""

from pyspark.sql import functions as F

from judy_graph_db_spark.sources import robots as R

ROBOTS_A = """# comment line
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: specialbot
User-agent: otherbot
Disallow: /

User-agent: freebot
Disallow:
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("a.example.com", ROBOTS_A),
         ("b.example.com", "User-agent: *\nDisallow: /x/\n")],
        "host string, text string")
    return R.parse_robots(df)


def test_parse_robots_groups_and_rules(spark):
    rules = {(r.host, r.agent, r.rule, r.path)
             for r in _rules(spark).collect()}
    assert ("a.example.com", "*", "disallow", "/private/") in rules
    assert ("a.example.com", "*", "allow", "/private/ok/") in rules
    # consecutive user-agent lines share ONE group (RFC 9309 2.2.1)
    assert ("a.example.com", "specialbot", "disallow", "/") in rules
    assert ("a.example.com", "otherbot", "disallow", "/") in rules
    # empty Disallow value emits no rule (freebot allows everything)
    assert not any(h == "a.example.com" and a == "freebot"
                   for h, a, _, _ in rules)


def test_robots_policy_longest_match_and_allow_tiebreak(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [("http://a.example.com/private/ok/page",),   # allow (longer)
         ("http://a.example.com/private/secret",),    # disallow
         ("http://a.example.com/public/page",),       # no rule -> allowed
         ("http://a.example.com/tmpfile",),           # prefix match /tmp
         ("http://b.example.com/x/1",),               # other host
         ("http://c.example.com/anything",)],         # no robots at all
        "url string")
    got = {r.url: r for r in R.robots_url_policy(urls, rules).collect()}
    assert got["http://a.example.com/private/ok/page"].allowed
    assert not got["http://a.example.com/private/secret"].allowed
    assert got["http://a.example.com/public/page"].allowed
    assert not got["http://a.example.com/tmpfile"].allowed
    assert not got["http://b.example.com/x/1"].allowed
    assert got["http://c.example.com/anything"].allowed
    assert got["http://a.example.com/private/secret"].matched_path \
        == "/private/"


def test_robots_policy_named_agent_group_overrides_star(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [("http://a.example.com/private/ok/page",),
         ("http://a.example.com/public/page",)], "url string")
    got = {r.url: r.allowed
           for r in R.robots_url_policy(urls, rules,
                                        agent="specialbot").collect()}
    # specialbot has its own group (Disallow: /) -> the * group's allow
    # rules do NOT apply on that host
    assert got == {"http://a.example.com/private/ok/page": False,
                   "http://a.example.com/public/page": False}


def test_robots_policy_wildcard_flagged_not_expanded(spark):
    rules = R.parse_robots(spark.createDataFrame(
        [("w.example.com", "User-agent: *\nDisallow: /a*/b\n")],
        "host string, text string"))
    urls = spark.createDataFrame(
        [("http://w.example.com/artful/x",)], "url string")
    row = R.robots_url_policy(urls, rules).collect()[0]
    # literal-prefix match up to '*': '/a' matches, flagged as wild
    assert not row.allowed and row.matched_wild
