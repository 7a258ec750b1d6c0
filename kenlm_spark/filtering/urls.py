"""URL / domain signals and blocklist filtering — the web-corpus
hygiene stage (C4 removed pages by bad-word/domain lists; every
production crawl pipeline filters on URL density and domain
reputation). All-Catalyst with exact DuckDB twins.

* ``url_metric_exprs`` — per document: url count, url-ish char ratio,
  distinct lowercased registrable-ish domains (regex; no PSL in this
  container, so "domain" = the full host — documented approximation);
* ``domain_blocklist_filter`` — keep/drop by joining the exploded
  domain set against a (broadcast) blocklist DataFrame; docs with no
  URLs keep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host or www.host — host = dotted labels; deliberately simple
# and IDENTICAL on both engines (Java and RE2-ish dialects agree on it)
URL_RE = r"(?:https?://|www\.)[a-zA-Z0-9.-]+"
HOST_RE = r"(?:https?://)?(?:www\.)?([a-zA-Z0-9-]+(?:\.[a-zA-Z0-9-]+)+)"


def url_metric_exprs(text_col: Column | str) -> dict[str, Column]:
    c = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col, F.lit("")
    )
    urls = F.regexp_extract_all(c, F.lit(URL_RE), 0)
    domains = F.array_distinct(
        F.transform(
            urls, lambda u: F.lower(F.regexp_extract(u, HOST_RE, 1))
        )
    )
    domains = F.array_remove(domains, "")
    n_urls = F.size(urls)
    url_chars = F.aggregate(
        urls, F.lit(0), lambda acc, u: acc + F.length(u)
    )
    return {
        "n_urls": n_urls,
        "url_char_ratio": url_chars.cast("double")
        / F.greatest(F.length(c), F.lit(1)),
        "domains": domains,
    }


def domain_blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_urls, url_keep): url_keep = False iff any extracted domain
    is on the blocklist — a broadcast left-anti-style join, map-side at
    any corpus scale (blocklists are small dimension tables)."""
    m = url_metric_exprs(text_col)
    base = docs.select(
        F.col(id_col), m["n_urls"].alias("n_urls"), m["domains"].alias("ds")
    )
    hits = (
        base.select(id_col, F.explode("ds").alias("domain"))
        .join(F.broadcast(blocklist), "domain")
        .select(id_col)
        .distinct()
        .withColumn("_blocked", F.lit(True))
    )
    return base.join(hits, id_col, "left").select(
        id_col,
        "n_urls",
        F.coalesce(~F.col("_blocked"), F.lit(True)).alias("url_keep"),
    )


def url_metrics_sql(text_expr: str) -> dict[str, str]:
    c = f"coalesce({text_expr}, '')"
    urls = f"regexp_extract_all({c}, '{URL_RE}')"
    domains = (
        f"list_filter(list_distinct(list_transform({urls}, "
        f"u -> lower(regexp_extract(u, '{HOST_RE}', 1)))), d -> d <> '')"
    )
    return {
        "n_urls": f"len({urls})",
        "url_char_ratio": (
            f"CAST(coalesce(list_sum(list_transform({urls}, u -> length(u))), 0) "
            f"AS DOUBLE) / greatest(length({c}), 1)"
        ),
        "domains": domains,
    }


def domain_blocklist_sql(
    blocked: list[str], table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    m = url_metrics_sql(text_col)
    blist = ", ".join(f"'{d}'" for d in blocked)
    return f"""
WITH base AS (
  SELECT {id_col}, {m['n_urls']} AS n_urls, {m['domains']} AS ds
  FROM {table}
)
SELECT {id_col}, n_urls,
       NOT EXISTS (
         SELECT 1 FROM unnest(ds) AS t(d) WHERE d IN ({blist})
       ) AS url_keep
FROM base
"""
