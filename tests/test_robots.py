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


def test_robots_policy_wildcard_semantics(spark):
    """'*' matches any char run, '$' anchors the end — the Google
    extension RFC 9309 §2.2.3 permits, evaluated for real (a wildcard
    rule that does not match never fires)."""
    rules = R.parse_robots(spark.createDataFrame(
        [("w.example.com",
          "User-agent: *\n"
          "Disallow: /a*/b\n"
          "Disallow: /fish*\n"
          "Disallow: /*.php$\n")],
        "host string, text string"))
    urls = spark.createDataFrame(
        [("http://w.example.com/artful/x",),      # /a*/b needs a '/b'
         ("http://w.example.com/all/b",),         # /a*/b matches
         ("http://w.example.com/fishheads/x",),   # /fish* prefix
         ("http://w.example.com/file.php",),      # $-anchored match
         ("http://w.example.com/file.php5",),     # $ rejects the suffix
         ("http://w.example.com/other",)],
        "url string")
    got = {r.url: r for r in R.robots_url_policy(urls, rules).collect()}
    assert got["http://w.example.com/artful/x"].allowed
    assert not got["http://w.example.com/all/b"].allowed
    assert got["http://w.example.com/all/b"].matched_wild
    assert not got["http://w.example.com/fishheads/x"].allowed
    assert not got["http://w.example.com/file.php"].allowed
    assert got["http://w.example.com/file.php5"].allowed
    assert got["http://w.example.com/other"].allowed


def test_robots_policy_google_published_examples(spark):
    """The allow/disallow precedence table published with Google's
    robots.txt documentation (the reference implementation's tie-break:
    raw pattern length, allow wins exact ties)."""
    body = ("User-agent: *\n"
            "Allow: /p\n"
            "Disallow: /\n")
    rules = R.parse_robots(spark.createDataFrame(
        [("g1.example.com", body),
         ("g2.example.com", "User-agent: *\nAllow: /folder\n"
                            "Disallow: /folder\n"),
         ("g3.example.com", "User-agent: *\nAllow: /page\n"
                            "Disallow: /*.htm\n"),
         ("g4.example.com", "User-agent: *\nAllow: /$\n"
                            "Disallow: /\n")],
        "host string, text string"))
    urls = spark.createDataFrame(
        [("http://g1.example.com/page",),
         ("http://g2.example.com/folder/page",),
         ("http://g3.example.com/page.htm",),
         ("http://g4.example.com/",),
         ("http://g4.example.com/anything",)],
        "url string")
    got = {r.url: r.allowed
           for r in R.robots_url_policy(urls, rules).collect()}
    assert got["http://g1.example.com/page"]           # /p (2) > / (1)
    assert got["http://g2.example.com/folder/page"]    # tie -> allow
    # /*.htm (6) outranks /page (5): Google ranks RAW pattern length
    assert not got["http://g3.example.com/page.htm"]
    assert got["http://g4.example.com/"]               # /$ matches root only
    assert not got["http://g4.example.com/anything"]


def test_robots_policy_regex_metachars_are_literal(spark):
    """Regex metacharacters inside rule paths must match literally after
    escaping — '.' never acts as a wildcard, parens never group."""
    rules = R.parse_robots(spark.createDataFrame(
        [("m.example.com", "User-agent: *\nDisallow: /a.b/\n"
                           "Disallow: /c(d)/*.e\n")],
        "host string, text string"))
    urls = spark.createDataFrame(
        [("http://m.example.com/a.b/x",),
         ("http://m.example.com/aXb/x",),      # '.' is literal: no match
         ("http://m.example.com/c(d)/f.e",)],
        "url string")
    got = {r.url: r.allowed
           for r in R.robots_url_policy(urls, rules).collect()}
    assert not got["http://m.example.com/a.b/x"]
    assert got["http://m.example.com/aXb/x"]
    assert not got["http://m.example.com/c(d)/f.e"]
