"""RFC 9309 robots filtering gates (engine/robots.py + spark/robots.py).

Primary gate: an independently-coded brute-force REP evaluator — a
recursive wildcard matcher with NO regexes and its own line parser —
must agree with the engine on every (body, path) decision across the
synth crawl and a pile of adversarial bodies.  Plus the RFC 9309 §5
worked examples and a documented CPython-robotparser divergence check
(robotparser is first-match and wildcard-blind, so it is NOT the twin).
"""

import pandas as pd
import pytest

from extractor_spark.engine.robots import RobotsMatcher

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# independent twin: no regex, own parser
# --------------------------------------------------------------------------

def _twin_wild(pattern: str, path: str) -> bool:
    """Does `pattern` (with * and trailing $) match a prefix of `path`?"""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")

    def rec(pi: int, pos: int) -> bool:
        if pi == len(parts):
            return pos == len(path) if anchored else True
        part = parts[pi]
        if pi == 0:
            if not path.startswith(part):
                return False
            return rec(1, len(part))
        if pi == len(parts) - 1 and anchored:
            # last literal must sit at the very end
            return path.endswith(part) and len(path) - len(part) >= pos
        start = pos
        while True:
            idx = path.find(part, start)
            if idx < 0:
                return False
            if rec(pi + 1, idx + len(part)):
                return True
            start = idx + 1

    return rec(0, 0)


def _twin_decide(body: str, agent: str, path: str):
    agent = agent.lower()
    groups = []
    cur_uas, cur_rules, ua_run = [], [], False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        d, v = line.split(":", 1)
        d, v = d.strip().lower(), v.strip()
        if d == "user-agent":
            if not v:
                continue
            if not ua_run:
                if cur_uas:
                    groups.append((cur_uas, cur_rules))
                cur_uas, cur_rules = [], []
            cur_uas.append(v.lower())
            ua_run = True
        elif d in ("allow", "disallow"):
            ua_run = False
            if cur_uas and v:
                cur_rules.append((d == "allow", v))
        elif not d.replace("-", "").isalpha():
            continue
    if cur_uas:
        groups.append((cur_uas, cur_rules))

    sel = [g for g in groups if agent in g[0]]
    if not sel:
        sel = [g for g in groups if "*" in g[0]]
    def spec(p):
        # octets, excluding the trailing $ anchor (mirrors engine)
        return len((p[:-1] if p.endswith("$") else p).encode("utf-8"))

    best = None  # (spec, allow, pattern); strict > keeps the FIRST tie rule
    for _uas, rules in sel:
        for allow, patt in rules:
            if _twin_wild(patt, path):
                key = (spec(patt), allow)
                if best is None or key > (best[0], best[1]):
                    best = (spec(patt), allow, patt)
    if best is None:
        return True, ""
    return best[1], best[2]


ADVERSARIAL_BODIES = [
    "User-agent: *\nDisallow: /a*b*c$\nAllow: /a*b\n",
    "User-agent: *\nAllow: /\nDisallow: /\n",  # tie -> allow
    "User-agent: extractor-spark\nDisallow: /x\nUser-agent: *\nDisallow: /\n",
    "User-agent: *\nDisallow: /article/*1*\nAllow: /article/11$\n",
    "User-agent: a\nUser-agent: b\nDisallow: /only-ab\n",
    "Disallow: /orphan-rule\nUser-agent: *\nAllow: /article\nDisallow: /art\n",
    "User-agent: *\n# comment\nSitemap: https://x/s.xml\nDisallow: /s\n",
    "User-agent: *\nDisallow: /**$\n",
    "User-agent: *\nDisallow: /$\n",
    # same-specificity same-verdict tie: first-declared rule must win the
    # attribution on '/a' (ADVICE r4 — engine previously reported the last)
    "User-agent: *\nDisallow: /a*\nDisallow: /*a\n",
    # $-anchor must not inflate specificity: /ab$ and /ab tie at 3 octets,
    # allow wins the tie on '/ab'
    "User-agent: *\nDisallow: /ab$\nAllow: /ab\n",
    # octet counting: /café is 6 UTF-8 octets (beats 5-octet /caf*);
    # code-point counting would tie them at 5 and flip the verdict
    "User-agent: *\nDisallow: /café\nAllow: /caf*\n",
    "",
]

PATHS = [
    "/", "/a", "/ab", "/abc", "/aXbYc", "/aXbYcZ", "/article/1",
    "/article/11", "/article/12", "/article/111", "/art", "/article",
    "/only-ab", "/s", "/sx", "/x", "/x?q=1", "/article/1?page=2",
    "/café", "/cafX",
]


@pytest.mark.parametrize("agent", ["extractor-spark", "a", "nobody"])
def test_engine_matches_independent_twin_on_adversarial_bodies(agent):
    for body in ADVERSARIAL_BODIES:
        m = RobotsMatcher(body, agent)
        for path in PATHS:
            got = m.decide(path)
            want = _twin_decide(body, agent, path)
            assert got == want, (body, agent, path, got, want)


def test_rfc9309_worked_examples():
    # RFC 9309 §2.2.2 / §5.2-style longest-match table
    m = RobotsMatcher("User-agent: *\nAllow: /p\nDisallow: /\n", "bot")
    assert m.decide("/page") == (True, "/p")
    m = RobotsMatcher("User-agent: *\nAllow: /folder\nDisallow: /folder\n", "bot")
    assert m.decide("/folder/page") == (True, "/folder")
    m = RobotsMatcher("User-agent: *\nAllow: /page\nDisallow: /*.ph\n", "bot")
    assert m.decide("/page.php5") == (True, "/page")
    m = RobotsMatcher("User-agent: *\nAllow: /page\nDisallow: /*.htm\n", "bot")
    assert m.decide("/page.htm") == (False, "/*.htm")
    m = RobotsMatcher("User-agent: *\nDisallow: /*.gif$\n", "bot")
    assert m.decide("/a.gif")[0] is False and m.decide("/a.gifx")[0] is True
    # unavailable robots => allowed
    assert RobotsMatcher("", "bot").decide("/anything") == (True, "")


def test_cpython_robotparser_divergence_is_the_documented_one():
    """CPython robotparser is first-match-wins; RFC 9309 is longest-match.
    Pin the divergence so nobody 'fixes' the engine toward robotparser."""
    import urllib.robotparser as rp

    p = rp.RobotFileParser()
    p.parse("User-agent: *\nDisallow: /a/\nAllow: /a/b\n".splitlines())
    assert p.can_fetch("bot", "/a/b/c") is False  # first-match: disallow
    m = RobotsMatcher("User-agent: *\nDisallow: /a/\nAllow: /a/b\n", "bot")
    assert m.decide("/a/b/c") == (True, "/a/b")  # RFC: longest match


# --------------------------------------------------------------------------
# Spark stage
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def spark():
    from extractor_spark.spark.session import get_spark

    yield get_spark("robots-tests", cpus=8)


def test_spark_stage_matches_twin_on_synth_crawl(spark):
    from pyspark.sql import functions as F

    from extractor_spark.spark.queries import QUERIES

    fn, oracle = QUERIES["robots_filter"]
    assert oracle is None
    out = fn(spark, SF_DIR).toPandas()
    assert len(out) > 0 and out["url"].is_unique

    from extractor_spark.spark.queries import _webgraph_pages
    from extractor_spark.spark.robots import synth_robots_df

    pages = _webgraph_pages(spark)
    hosts = [
        r["host"]
        for r in pages.select(
            F.lower(F.parse_url("url", F.lit("HOST"))).alias("host")
        ).distinct().collect()
    ]
    bodies = {
        r["host"]: r["body"] for r in synth_robots_df(spark, hosts).collect()
    }
    assert len(out) == pages.count()
    # some hosts genuinely lack robots, some verdicts genuinely deny
    assert out["allowed"].sum() < len(out)
    from urllib.parse import urlsplit

    n_denied = 0
    for row in out.itertuples():
        parts = urlsplit(row.url)
        path = (parts.path or "/") + (("?" + parts.query) if parts.query else "")
        body = bodies.get(parts.netloc.lower())
        if body is None:
            want = (True, "")
        else:
            want = _twin_decide(body, "extractor-spark", path)
        assert (row.allowed, row.rule) == want, (row.url, want)
        n_denied += not row.allowed
    assert n_denied > 0


def test_spark_stage_deterministic_and_no_robots_fast_path(spark):
    from extractor_spark.spark.queries import QUERIES

    fn, _ = QUERIES["robots_filter"]
    a = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    assert a == b
    # single-pass shape: exactly ONE decision stage, ONE host join, and
    # no union that would recompute the join per branch
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas decide") == 1, plan
    assert "Union" not in plan, plan
    # agent-specific group actually wins over '*' (variant-1 hosts allow
    # extractor-spark on *2$ pages while denying generic agents everything)
    pdf = pd.DataFrame(a, columns=["url", "host", "allowed", "rule"])
    v1 = pdf[pdf["rule"] == "/article/*2$"]
    assert len(v1) > 0 and v1["allowed"].all()
