"""Declarative data-quality validation (the Deequ / Great-
Expectations idea, engine-native): a constraint set compiles into
ONE aggregate pass over the table, returning a per-constraint
violations report. At 10^12 rows the design constraint is exactly
that — N constraints must cost one scan, not N scans.

Constraint kinds (each a dict; ``name`` defaults to a derived id):

- ``{"kind": "not_null", "col": c}`` — NULL count.
- ``{"kind": "unique", "col": c}`` — duplicated-row count
  (count - distinct; exact).
- ``{"kind": "range", "col": c, "lo": x, "hi": y}`` — rows outside
  [lo, hi] (NULLs don't count; add not_null separately).
- ``{"kind": "in_set", "col": c, "values": [...]}`` — rows outside
  the accepted set (strings; NULL counts as a violation).
- ``{"kind": "matches", "col": c, "pattern": re}`` — rows NOT
  matching the regex (NULL violates).
- ``{"kind": "row_count", "lo": n, "hi": m}`` — table size bounds
  (violations = distance outside the band).

Scale shape: every per-row predicate becomes a conditional SUM in a
single global aggregate — map-side partial aggregation collapses
each partition to one row before the one-row exchange. ``unique``
adds exact count-distincts, which Spark plans as a single Expand +
two-stage aggregate alongside the sums (still one scan of the data;
at extreme cardinality swap in approx_count_distinct — documented
knob, exact is the default because the oracle replays it). The
report is BIGINT violation counts, so the driver oracle
hash-compares exact values.

Reference analog: the demo validates payloads per document and
routes failures (fn-preprocess/main.py error taxonomy); at corpus
scale validation inverts into declarative table-level constraints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_str(v) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _derived_name(c: dict) -> str:
    kind = c["kind"]
    if kind == "row_count":
        return f"row_count[{c.get('lo', '')}..{c.get('hi', '')}]"
    base = f"{kind}({c['col']})"
    if kind == "range":
        base = f"range({c['col']})[{c.get('lo', '')}..{c.get('hi', '')}]"
    return base


def validate_constraints(df: DataFrame,
                         constraints: list[dict]) -> DataFrame:
    """Compile ``constraints`` into one aggregate pass; return one
    row per constraint: (constraint, violations, passed) ordered as
    given (``seq`` column carries the order)."""
    if not constraints:
        raise ValueError("no constraints given")
    aggs = []
    for i, c in enumerate(constraints):
        kind = c["kind"]
        if kind == "not_null":
            e = f"sum(IF({c['col']} IS NULL, 1, 0))"
        elif kind == "unique":
            e = (f"count({c['col']})"
                 f" - count(DISTINCT {c['col']})")
        elif kind == "range":
            conds = []
            if "lo" in c:
                conds.append(f"{c['col']} < {c['lo']}")
            if "hi" in c:
                conds.append(f"{c['col']} > {c['hi']}")
            e = f"sum(IF({' OR '.join(conds)}, 1, 0))"
        elif kind == "in_set":
            vals = ", ".join(_sql_str(v) for v in c["values"])
            e = (f"sum(IF({c['col']} IS NULL"
                 f" OR {c['col']} NOT IN ({vals}), 1, 0))")
        elif kind == "matches":
            pat = _sql_str(c["pattern"])
            e = (f"sum(IF({c['col']} IS NULL"
                 f" OR NOT regexp_like({c['col']}, {pat}), 1, 0))")
        elif kind == "row_count":
            lo, hi = c.get("lo"), c.get("hi")
            under = (f"IF(count(*) < {lo}, {lo} - count(*), 0)"
                     if lo is not None else "0")
            over = (f"IF(count(*) > {hi}, count(*) - {hi}, 0)"
                    if hi is not None else "0")
            e = f"{under} + {over}"
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")
        aggs.append(F.expr(f"coalesce({e}, 0)").cast("long")
                    .alias(f"_v{i}"))
    one = df.agg(*aggs)
    names = [c.get("name", _derived_name(c)) for c in constraints]
    stack = ", ".join(
        f"{i}, {_sql_str(n)}, _v{i}" for i, n in enumerate(names))
    return (one.select(F.expr(
        f"stack({len(constraints)}, {stack})"
        " AS (seq, constraint, violations)"))
        .select(F.col("seq").cast("long"), "constraint",
                F.col("violations").cast("long"),
                (F.col("violations") == 0).alias("passed")))
