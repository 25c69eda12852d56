"""robots.txt parsing → the engine's politeness rules table.

The scheduler consumes ROBOTS_SCHEMA rows (host, disallow_prefixes,
crawl_delay_ms, fetch_budget) — the north-rule politeness table. A
live crawl has to DERIVE those rows from fetched ``/robots.txt``
bodies; this module is that derivation, an RFC 9309 subset:

- group selection: the group whose ``User-agent`` token is the
  LONGEST case-insensitive substring match of the product token wins;
  ``*`` groups are the fallback (RFC 9309 §2.2.1);
- adjacent ``User-agent`` lines share one group; rules before any
  User-agent line are ignored;
- ``Disallow`` rules keep their path prefixes. The engine matches by
  ``path.startswith(prefix)`` (no ``Allow`` precedence, no ``$``
  anchors — SURVEY §2.3), so a pattern is truncated at its first
  wildcard ``*``: the shortened prefix blocks a SUPERSET of the
  pattern, i.e. the approximation always errs on the polite side.
  ``Allow`` lines are parsed and ignored (recorded for callers that
  want full-precision matching later);
- empty ``Disallow:`` means allow-all and contributes no prefix;
- ``Crawl-delay`` (the de-facto extension) → crawl_delay_ms.

Pure functions + one Spark stage: ``robots_rules_from_responses``
turns a DataFrame of fetched robots.txt responses into the politeness
table, one row per host — built-in column ops plus one Arrow-batched
parse of the body text.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)
    crawl_delay_s: float | None = None


def parse_robots_txt(text: str) -> list[RobotsGroup]:
    """robots.txt body → list of user-agent groups, in file order."""
    groups: list[RobotsGroup] = []
    cur: RobotsGroup | None = None
    in_agents = False  # adjacent User-agent lines accumulate one group
    for raw in (text or "").lstrip("\ufeff").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agents:
                cur = RobotsGroup()
                groups.append(cur)
                in_agents = True
            cur.agents.append(value.lower())
            continue
        in_agents = False
        if cur is None:
            continue  # rules before any User-agent line: ignored
        if key == "disallow":
            if value:
                cur.disallow.append(value)
        elif key == "allow":
            if value:
                cur.allow.append(value)
        elif key == "crawl-delay":
            try:
                cur.crawl_delay_s = float(value)
            except ValueError:
                pass
    return groups


def robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directives (the sitemaps.org extension referenced
    by RFC 9309 §2.2.4 as an "other record") — group-INDEPENDENT:
    every line counts regardless of which User-agent group it appears
    inside. Absolute URLs, file order, deduped."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in (text or "").lstrip("﻿").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap":
            v = value.strip()
            if v and v not in seen:
                seen.add(v)
                out.append(v)
    return out


def select_group(groups: list[RobotsGroup], user_agent: str) -> RobotsGroup | None:
    """RFC 9309 §2.2.1: the group with the longest user-agent token
    contained in the product token wins; ``*`` is the fallback."""
    ua = (user_agent or "").lower()
    best: RobotsGroup | None = None
    best_len = -1
    star: RobotsGroup | None = None
    for g in groups:
        for token in g.agents:
            if token == "*":
                if star is None:
                    star = g
            elif token in ua and len(token) > best_len:
                best, best_len = g, len(token)
    return best if best is not None else star


def _engine_prefix(pattern: str) -> str:
    """Disallow pattern → the prefix the engine's startswith matcher
    uses: truncate at the first ``*`` (blocks a superset — polite
    direction); drop a trailing ``$`` anchor the same way."""
    p = pattern.split("*", 1)[0]
    return p[:-1] if p.endswith("$") else p


def robots_rules(
    text: str, user_agent: str = "silkworm-spark",
) -> tuple[list[str], float | None]:
    """robots.txt body → (disallow_prefixes, crawl_delay_s) for the
    given agent — the scalar core of the rules-table derivation."""
    g = select_group(parse_robots_txt(text), user_agent)
    if g is None:
        return [], None
    prefixes = []
    for pat in g.disallow:
        pref = _engine_prefix(pat)
        if pref:
            prefixes.append(pref)
    # dedup in file order; drop prefixes shadowed by a shorter one
    allset = set(prefixes)
    seen: set[str] = set()
    out: list[str] = []
    for p in prefixes:
        if p in seen:
            continue
        seen.add(p)
        if not any(q != p and p.startswith(q) for q in allset):
            out.append(p)
    return out, g.crawl_delay_s


def robots_rules_from_responses(
    responses, user_agent: str = "silkworm-spark",
    body_col: str = "body", host_col: str = "host", status_col: str = "status",
):
    """Fetched ``/robots.txt`` responses → ROBOTS_SCHEMA rows.

    Status semantics per RFC 9309 §2.3.1: 4xx (unavailable) ⇒
    allow-all (a row with no prefixes, so the host still gets a
    politeness entry); 5xx/error ⇒ treat as DISALLOW-ALL (prefix "/")
    until a fetch succeeds. One Arrow-batched pandas pass for the text
    parse; everything else is column ops.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
            T.StructField("crawl_delay_ms", T.LongType()),
            T.StructField("fetch_budget", T.IntegerType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                # Arrow→pandas renders null ints as NaN, so `is None`
                # misses them and int(status) raises — pd.isna covers both.
                status = getattr(r, status_col)
                if pd.isna(status):
                    status = None
                body = getattr(r, body_col)
                host = getattr(r, host_col)
                if status is not None and 400 <= int(status) < 500:
                    prefixes, delay = [], None
                elif status is None or int(status) >= 500 or body is None:
                    prefixes, delay = ["/"], None
                else:
                    text = bytes(body).decode("utf-8", "replace")
                    prefixes, delay = robots_rules(text, user_agent)
                rows.append(dict(
                    host=host, disallow_prefixes=prefixes,
                    crawl_delay_ms=int(delay * 1000) if delay else None,
                    fetch_budget=None,
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    cols = [F.col(host_col), F.col(status_col), F.col(body_col)]
    return responses.select(*cols).mapInPandas(gen, schema=out_schema)


def robots_sitemap_seeds(
    responses, body_col: str = "body", host_col: str = "host",
    status_col: str = "status",
):
    """Fetched ``/robots.txt`` responses → sitemap seed requests
    ``(host, url, callback='parse_sitemap')``: union these into the
    crawl's seed list and the advertised sitemaps flow through the
    existing recursive sitemap callback (operators/parse.parse_sitemap
    — sub-sitemaps recurse, page URLs fall through to the default
    parser). Only 2xx robots bodies contribute."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("callback", T.StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                # Null status arrives as NaN via Arrow→pandas, not None.
                status = getattr(r, status_col)
                body = getattr(r, body_col)
                if pd.isna(status) or not 200 <= int(status) < 300 or body is None:
                    continue
                text = bytes(body).decode("utf-8", "replace")
                for u in robots_sitemaps(text):
                    rows.append(dict(
                        host=getattr(r, host_col), url=u,
                        callback="parse_sitemap",
                    ))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    cols = [F.col(host_col), F.col(status_col), F.col(body_col)]
    return responses.select(*cols).mapInPandas(gen, schema=out_schema)


def fetch_robots_rules(
    seeds, user_agent: str = "silkworm-spark",
    timeout_s: float = 10.0, default_scheme: str = "http",
):
    """Bootstrap the politeness table for a LIVE crawl: distinct hosts
    from the seed list → one ``/robots.txt`` request per host through
    the production fetch path (``live_fetch``: paced, manual
    redirects, 404s as status rows — exactly the semantics RFC 9309
    status handling needs) → ``robots_rules_from_responses``.

    ``seeds``: any DataFrame with a ``url`` column (a ``host`` column
    is used if already present). One request per distinct host; the
    scheme is taken from the first seed URL of the host. Returns
    ROBOTS_SCHEMA rows ready for ``CrawlEngine.initialize``."""
    from pyspark.sql import functions as F

    from silkworm_spark.functions.urls import host_udf
    from silkworm_spark.operators.fetch import live_fetch

    s = seeds
    if "host" not in s.columns:
        s = s.withColumn("host", host_udf("url"))
    _sch = F.regexp_extract("url", r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    scheme = F.when(_sch != "", _sch).otherwise(F.lit(default_scheme))
    hosts = (
        s.groupBy("host")
        .agg(F.first(scheme).alias("_scheme"), F.first("url").alias("_seed"))
        # port must survive: host_of strips it, so re-derive the
        # authority from the seed URL's prefix when it carries one
        .withColumn(
            "_auth",
            F.regexp_extract("_seed", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1),
        )
        .select(
            "host",
            F.concat(
                F.col("_scheme"), F.lit("://"),
                F.when(F.col("_auth") != "", F.col("_auth")).otherwise(F.col("host")),
                F.lit("/robots.txt"),
            ).alias("url"),
            F.lit(float(timeout_s)).alias("timeout"),
            F.lit(user_agent).alias("ua"),
            F.lit(0).alias("part"),
        )
    )
    fetched = live_fetch(hosts, timeout_s=timeout_s)
    return robots_rules_from_responses(fetched, user_agent)
