"""DuckDB-SQL oracle for the estimator — an independent reimplementation
of the full interpolated modified-KN chain in SQL.

Mirrors :mod:`kenlm_spark.estimator` stage for stage with identical float64
expression shapes, so per-row values match the Spark pipeline bit-for-bit
up to log10 library ulps (absorbed by rounding).
"""

from __future__ import annotations

BOS, EOS, UNK = "<s>", "</s>", "<unk>"

_TOKS = (
    "list_filter(regexp_split_to_array(coalesce({text}, ''), "
    "'[\\x00\\t\\n\\r ]+'), t -> t <> '')"
)


def windows_cte(table: str, text_col: str, order: int) -> str:
    """CTE chain producing w_all(words LIST, cnt) of order-N windows."""
    toks = _TOKS.format(text=text_col)
    bos_list = "[" + ", ".join(f"'{BOS}'" for _ in range(order - 1)) + "]"
    return f"""
padded AS (
  SELECT list_concat(list_concat({bos_list}, {toks}), ['{EOS}']) AS p
  FROM {table}
),
win AS (
  SELECT list_slice(p, i, i + {order - 1}) AS words
  FROM padded, LATERAL (
    SELECT unnest(generate_series(1, len(p) - {order - 1})) AS i
  )
),
w_all AS (
  SELECT words, CAST(count(*) AS BIGINT) AS cnt FROM win GROUP BY words
)"""


def adjusted_ctes(order: int) -> str:
    """CTEs s{n} for n=order..1: gram sets with adjusted + raw counts."""
    parts = [
        f"s{order} AS (\n"
        f"  SELECT words, cnt, cnt AS raw FROM w_all "
        f"WHERE len(words) < 2 OR words[2] <> '{BOS}'\n"
        ")"
    ]
    parent = "w_all"
    parent_raw = "cnt"
    for n in range(order - 1, 0, -1):
        body = f"""s{n}_raw AS (
  SELECT suffix AS words,
         CASE WHEN suffix[1] = '{BOS}' THEN SUM(raw)
              ELSE COUNT(DISTINCT first) END AS cnt,
         SUM(raw) AS raw
  FROM (SELECT words[1] AS first, list_slice(words, 2, {n + 1}) AS suffix,
               {parent_raw} AS raw
        FROM {parent})
  GROUP BY suffix
)"""
        parts.append(body)
        if n == 1:
            parts.append(
                f"s1 AS (SELECT words, CAST(cnt AS BIGINT) AS cnt, "
                f"CAST(raw AS BIGINT) AS raw FROM s1_raw\n"
                f"  UNION ALL SELECT ['{UNK}'], 0, 0 "
                f"UNION ALL SELECT ['{BOS}'], 0, 0)"
            )
        else:
            parts.append(
                f"s{n} AS (SELECT words, CAST(cnt AS BIGINT) AS cnt, "
                f"CAST(raw AS BIGINT) AS raw FROM s{n}_raw)"
            )
        parent = f"s{n}"
        parent_raw = "raw"
    return ",\n".join(parts)


def discount_cte(order: int, fb: tuple[float, float, float] = (0.5, 1.0, 1.5)) -> str:
    """disc(ord, d1, d2, d3): Chen-Goodman with the lmplz CLI fallback."""
    hist_selects = []
    for n in range(1, order + 1):
        hist_selects.append(
            f"SELECT {n} AS ord, "
            f"SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n1, "
            f"SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS n2, "
            f"SUM(CASE WHEN cnt = 3 THEN 1 ELSE 0 END) AS n3, "
            f"SUM(CASE WHEN cnt = 4 THEN 1 ELSE 0 END) AS n4 FROM s{n}"
        )
    hist = " UNION ALL ".join(hist_selects)
    fb1, fb2, fb3 = fb
    return f"""hist AS ({hist}),
disc AS (
  SELECT ord,
    CASE WHEN ok THEN 1 - 2 * y * n2 / n1 ELSE {fb1} END AS d1,
    CASE WHEN ok THEN 2 - 3 * y * n3 / n2 ELSE {fb2} END AS d2,
    CASE WHEN ok THEN 3 - 4 * y * n4 / n3 ELSE {fb3} END AS d3
  FROM (
    SELECT ord, n1, n2, n3, n4,
           CAST(n1 AS DOUBLE) / (n1 + 2.0 * n2) AS y,
           (n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0
            AND (1 - 2 * (CAST(n1 AS DOUBLE) / (n1 + 2.0 * n2)) * n2 / n1)
                BETWEEN 0 AND 1
            AND (2 - 3 * (CAST(n1 AS DOUBLE) / (n1 + 2.0 * n2)) * n3 / n2)
                BETWEEN 0 AND 2
            AND (3 - 4 * (CAST(n1 AS DOUBLE) / (n1 + 2.0 * n2)) * n4 / n3)
                BETWEEN 0 AND 3) AS ok
    FROM hist
  )
)"""


def initial_ctes(order: int, thresholds: dict[int, int] | None = None) -> str:
    """init{n}(words, cnt, p_uninterp, gamma_gram, pruned) and gam{n}."""
    thresholds = thresholds or {}
    parts = []
    for n in range(1, order + 1):
        t = thresholds.get(n, 0)
        pruned = f"(raw <= {t})"
        if n == 1:
            pruned = (
                f"({pruned} AND NOT (words[1] IN ('{UNK}', '{BOS}', '{EOS}')))"
            )
        parts.append(
            f"m{n} AS (SELECT words, cnt, {pruned} AS pruned FROM s{n})"
        )
        ctx = f"list_slice(words, 1, {n - 1})" if n > 1 else "[]::VARCHAR[]"
        parts.append(f"""gam{n} AS (
  SELECT ctx,
         SUM(cnt) AS denom,
         (d.d1 * SUM(CASE WHEN NOT pruned AND cnt = 1 THEN 1 ELSE 0 END)
          + d.d2 * SUM(CASE WHEN NOT pruned AND cnt = 2 THEN 1 ELSE 0 END)
          + d.d3 * SUM(CASE WHEN NOT pruned AND cnt >= 3 THEN 1 ELSE 0 END)
          + SUM(CASE WHEN pruned THEN cnt ELSE 0 END)) / SUM(cnt) AS gamma
  FROM (SELECT {ctx} AS ctx, cnt, pruned FROM m{n}) CROSS JOIN
       (SELECT d1, d2, d3 FROM disc WHERE ord = {n}) d
  GROUP BY ctx, d.d1, d.d2, d.d3
)""")
        special_p = ""
        special_g = "g.gamma"
        if n == 1:
            special_p = (
                f"CASE WHEN s.words = ['{UNK}'] THEN 0.0 "
                f"WHEN s.words = ['{BOS}'] THEN 1.0 ELSE %P% END"
            )
            special_g = (
                f"CASE WHEN s.words = ['{BOS}'] THEN 0.0 ELSE g.gamma END"
            )
        p_expr = (
            "(s.cnt - CASE WHEN s.cnt = 0 THEN 0.0 WHEN s.cnt = 1 THEN d.d1 "
            "WHEN s.cnt = 2 THEN d.d2 ELSE d.d3 END) / g.denom"
        )
        full_p = special_p.replace("%P%", p_expr) if special_p else p_expr
        parts.append(f"""init{n} AS (
  SELECT s.words, s.cnt, s.pruned,
         {full_p} AS p_uninterp,
         {special_g} AS gamma_gram
  FROM m{n} s
  JOIN gam{n} g ON g.ctx = {ctx.replace("words", "s.words")}
  CROSS JOIN (SELECT d1, d2, d3 FROM disc WHERE ord = {n}) d
)""")
    return ",\n".join(parts)


def interpolate_ctes(order: int) -> str:
    parts = [
        """types AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM s1),
p1 AS (
  SELECT i.words, i.pruned,
         i.p_uninterp + i.gamma_gram * (1.0 / (t.v - 1)) AS p
  FROM init1 i CROSS JOIN types t
)"""
    ]
    for n in range(2, order + 1):
        parts.append(f"""p{n} AS (
  SELECT i.words, i.pruned, i.p_uninterp + i.gamma_gram * l.p AS p
  FROM init{n} i JOIN p{n - 1} l ON l.words = list_slice(i.words, 2, {n})
)""")
    return ",\n".join(parts)


def model_sql(
    table: str = "documents",
    text_col: str = "text",
    order: int = 3,
    prune_thresholds: dict[int, int] | None = None,
) -> str:
    """Full estimator oracle: (ord, gram, log10_prob r6, log10_backoff r6)."""
    finals = []
    for n in range(1, order + 1):
        if n < order:
            bo = f"""coalesce(
          (CASE WHEN c.words[{n}] IN ('{UNK}', '{EOS}') THEN 1.0
                ELSE b.gamma END), 1.0)"""
            join = f"LEFT JOIN gam{n + 1} b ON b.ctx = c.words"
        else:
            bo = "1.0"
            join = ""
        finals.append(f"""SELECT {n} AS ord,
       array_to_string(c.words, ' ') AS gram,
       round(least(0.0, log10(c.p)), 6) AS log10_prob,
       round(log10({bo}), 6) AS log10_backoff
FROM p{n} c {join} WHERE NOT c.pruned""")
    union = "\nUNION ALL\n".join(finals)
    return f"""
WITH {windows_cte(table, text_col, order)},
{adjusted_ctes(order)},
{discount_cte(order)},
{initial_ctes(order, prune_thresholds)},
{interpolate_ctes(order)}
{union}
"""


def windows_sql(table: str = "documents", text_col: str = "text", order: int = 3) -> str:
    return f"""
WITH {windows_cte(table, text_col, order)}
SELECT array_to_string(words, ' ') AS gram, cnt FROM w_all
"""


def adjusted_sql(
    table: str = "documents", text_col: str = "text", order: int = 3, level: int = 2
) -> str:
    return f"""
WITH {windows_cte(table, text_col, order)},
{adjusted_ctes(order)}
SELECT array_to_string(words, ' ') AS gram, cnt FROM s{level}
"""
