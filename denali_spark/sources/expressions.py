"""Scan-expression grammar for file pruning + residual filtering.

The reference's REST spec declares a scan Expression grammar
(/root/reference/routes/openapi.yml:1605-1731 — and/or/not, literal
comparisons, set membership, unary null tests) that the catalog itself never
evaluates; client engines use it for manifest/file pruning (SURVEY §4.b).
This module IS that client-engine piece for our engine: the same expression
shape, evaluated against the per-column min/max stats our manifests carry,
plus a lowering to a Spark SQL residual filter for exact row-level semantics.

Pruning is conservative three-valued logic: ``file_might_match`` returns
False ONLY when the stats prove no row in the file can satisfy the
predicate. Unknown columns, missing stats, or un-normalizable NOTs degrade
to True (scan the file) — never to a wrong prune.

Scale notes: at 100 TB a table is O(100k) files; pruning runs driver-side
over the manifest (tiny JSON), so a selective predicate turns a full-table
scan into reading a handful of files before Spark even plans the job —
the same plan-time win Iceberg manifests give real deployments.
"""

from __future__ import annotations

import re
from typing import Any

# --- builders ---------------------------------------------------------------


def and_(*exprs: dict) -> dict:
    out = exprs[0]
    for e in exprs[1:]:
        out = {"type": "and", "left": out, "right": e}
    return out


def or_(*exprs: dict) -> dict:
    out = exprs[0]
    for e in exprs[1:]:
        out = {"type": "or", "left": out, "right": e}
    return out


def not_(expr: dict) -> dict:
    return {"type": "not", "child": expr}


def _cmp(op: str, term: str, value: Any) -> dict:
    return {"type": op, "term": term, "value": value}


def lt(term: str, value: Any) -> dict:
    return _cmp("lt", term, value)


def lt_eq(term: str, value: Any) -> dict:
    return _cmp("lt-eq", term, value)


def gt(term: str, value: Any) -> dict:
    return _cmp("gt", term, value)


def gt_eq(term: str, value: Any) -> dict:
    return _cmp("gt-eq", term, value)


def eq(term: str, value: Any) -> dict:
    return _cmp("eq", term, value)


def not_eq(term: str, value: Any) -> dict:
    return _cmp("not-eq", term, value)


def in_(term: str, values: list) -> dict:
    return {"type": "in", "term": term, "values": list(values)}


def not_in(term: str, values: list) -> dict:
    return {"type": "not-in", "term": term, "values": list(values)}


def is_null(term: str) -> dict:
    return {"type": "is-null", "term": term}


def not_null(term: str) -> dict:
    return {"type": "not-null", "term": term}


def always_true() -> dict:
    return {"type": "true"}


def always_false() -> dict:
    return {"type": "false"}


def raw_sql(sql: str) -> dict:
    """An opaque Spark SQL predicate the scan grammar cannot express
    (modulo/function/arithmetic WHERE shapes). Evaluates exactly at the
    row level via to_spark_sql; NEVER prunes — both the stats and the
    partition pruners treat it as might-match, so a raw predicate means a
    full-candidate read. The DML router falls back to this when
    parse_where rejects a clause, trading pruning for coverage."""
    return {"type": "raw-sql", "sql": sql}


# --- NOT normalization (De Morgan + comparison negation) --------------------

_NEGATION = {
    "lt": "gt-eq",
    "lt-eq": "gt",
    "gt": "lt-eq",
    "gt-eq": "lt",
    "eq": "not-eq",
    "not-eq": "eq",
    "in": "not-in",
    "not-in": "in",
    "is-null": "not-null",
    "not-null": "is-null",
    "true": "false",
    "false": "true",
}


def normalize(expr: dict) -> dict:
    """Push NOT to the leaves so pruning only sees positive/negated
    comparisons (three-valued NOT over `might-match` is unsound)."""
    t = expr["type"]
    if t == "not":
        child = expr["child"]
        ct = child["type"]
        if ct == "not":
            return normalize(child["child"])
        if ct == "and":
            return {
                "type": "or",
                "left": normalize(not_(child["left"])),
                "right": normalize(not_(child["right"])),
            }
        if ct == "or":
            return {
                "type": "and",
                "left": normalize(not_(child["left"])),
                "right": normalize(not_(child["right"])),
            }
        if ct not in _NEGATION:  # raw-sql leaf: keep the NOT node
            return {"type": "not", "child": normalize(child)}
        neg = dict(child)
        neg["type"] = _NEGATION[ct]
        return neg
    if t in ("and", "or"):
        return {
            "type": t,
            "left": normalize(expr["left"]),
            "right": normalize(expr["right"]),
        }
    return expr


# --- lowering to a Spark SQL residual filter --------------------------------


def _sql_literal(value: Any) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    s = str(value).replace("'", "''")
    return f"'{s}'"


def _sql_col(term: str) -> str:
    return "`" + term.replace("`", "``") + "`"


def to_spark_sql(expr: dict) -> str:
    """Exact row-level SQL for the expression — applied as the residual
    filter after file pruning, and usable verbatim in `df.filter(...)`."""
    t = expr["type"]
    if t == "and":
        return f"({to_spark_sql(expr['left'])} AND {to_spark_sql(expr['right'])})"
    if t == "or":
        return f"({to_spark_sql(expr['left'])} OR {to_spark_sql(expr['right'])})"
    if t == "not":
        return f"(NOT {to_spark_sql(expr['child'])})"
    if t == "true":
        return "TRUE"
    if t == "false":
        return "FALSE"
    if t == "raw-sql":
        return f"({expr['sql']})"
    col = _sql_col(expr["term"])
    if t == "is-null":
        return f"({col} IS NULL)"
    if t == "not-null":
        return f"({col} IS NOT NULL)"
    if t == "in":
        vals = ", ".join(_sql_literal(v) for v in expr["values"])
        return f"({col} IN ({vals}))"
    if t == "not-in":
        vals = ", ".join(_sql_literal(v) for v in expr["values"])
        return f"({col} NOT IN ({vals}))"
    ops = {"lt": "<", "lt-eq": "<=", "gt": ">", "gt-eq": ">=", "eq": "=", "not-eq": "!="}
    return f"({col} {ops[t]} {_sql_literal(expr['value'])})"


# --- min/max pruning --------------------------------------------------------


def _comparable(a: Any, b: Any) -> bool:
    num = (int, float)
    if isinstance(a, num) and isinstance(b, num):
        return True
    return type(a) is type(b)


def file_might_match(expr: dict, stats: dict | None) -> bool:
    """Conservative can-this-file-contain-a-match over per-column stats of
    shape {col: {"min": v, "max": v, "null-count": n}}. Missing info → True."""
    if not stats:
        return True
    return _might(normalize(expr), stats)


def _might(expr: dict, stats: dict) -> bool:  # noqa: PLR0911 — case table
    t = expr["type"]
    if t == "and":
        return _might(expr["left"], stats) and _might(expr["right"], stats)
    if t == "or":
        return _might(expr["left"], stats) or _might(expr["right"], stats)
    if t == "true":
        return True
    if t == "false":
        return False
    if t == "not":  # un-normalizable leaf NOT → don't prune
        return True
    if t == "raw-sql":  # opaque predicate → don't prune
        return True
    col_stats = stats.get(expr["term"])
    if not isinstance(col_stats, dict):
        return True
    lo, hi = col_stats.get("min"), col_stats.get("max")
    nulls = col_stats.get("null-count")
    if t == "is-null":
        return nulls is None or nulls > 0
    if t == "not-null":
        # Prunable only if every value is null (min/max absent + known nulls).
        return not (lo is None and hi is None and (nulls or 0) > 0)
    if lo is None or hi is None:
        return True
    if t in ("in", "not-in"):
        values = [v for v in expr["values"] if _comparable(v, lo)]
        if len(values) != len(expr["values"]):
            return True  # mixed/unknown literal types → no pruning
        if t == "in":
            return any(lo <= v <= hi for v in values)
        return not (lo == hi and lo in values)
    value = expr["value"]
    if not _comparable(value, lo):
        return True
    if t == "lt":
        return lo < value
    if t == "lt-eq":
        return lo <= value
    if t == "gt":
        return hi > value
    if t == "gt-eq":
        return hi >= value
    if t == "eq":
        return lo <= value <= hi
    if t == "not-eq":
        return not (lo == hi == value)
    return True


# --- parsing SQL WHERE text into the grammar --------------------------------

_WHERE_TOKEN = re.compile(
    r"\s*(?:"
    r"(?P<lp>\()|(?P<rp>\))|(?P<comma>,)"
    r"|(?P<op><=|>=|<>|!=|=|<|>)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<num>-?\d+\.\d+|-?\d+)"
    r"|(?P<word>[A-Za-z_][\w]*)"
    r")"
)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "IS", "NULL", "BETWEEN", "TRUE",
             "FALSE", "DATE", "TIMESTAMP"}


def parse_where(text: str) -> dict:
    """Parse a SQL WHERE clause into the scan-expression grammar — the
    bridge that lets `io.sql()` route DELETE/UPDATE/MERGE statements into
    the row-level ops (which prune files from exactly these dicts).

    Supported: comparisons (= <> != < <= > >=), [NOT] IN (..), IS [NOT]
    NULL, BETWEEN a AND b, AND/OR/NOT, parentheses, numeric/string/
    boolean literals, and DATE/TIMESTAMP '<iso>' (which compare as their
    ISO strings, the same encoding file stats carry). Column must be on
    the left of a comparison. Raises ValueError on anything else."""
    tokens: list[tuple[str, object]] = []
    pos = 0
    while pos < len(text):
        m = _WHERE_TOKEN.match(text, pos)
        if m is None:
            if text[pos:].strip():
                raise ValueError(f"unparseable WHERE at: {text[pos:pos + 30]!r}")
            break
        pos = m.end()
        if m.group("lp"):
            tokens.append(("(", None))
        elif m.group("rp"):
            tokens.append((")", None))
        elif m.group("comma"):
            tokens.append((",", None))
        elif m.group("op"):
            tokens.append(("op", m.group("op")))
        elif m.group("str"):
            tokens.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num"):
            n = m.group("num")
            tokens.append(("lit", float(n) if "." in n else int(n)))
        else:
            w = m.group("word")
            if w.upper() in _KEYWORDS:
                tokens.append((w.upper(), None))
            else:
                tokens.append(("ident", w))

    i = 0

    def peek():
        return tokens[i] if i < len(tokens) else (None, None)

    def take(kind=None):
        nonlocal i
        if i >= len(tokens):
            raise ValueError("unexpected end of WHERE clause")
        t = tokens[i]
        if kind is not None and t[0] != kind:
            raise ValueError(f"expected {kind}, got {t[0]} in WHERE")
        i += 1
        return t

    def literal():
        kind, val = take()
        if kind == "lit":
            return val
        if kind == "TRUE":
            return True
        if kind == "FALSE":
            return False
        if kind in ("DATE", "TIMESTAMP"):  # DATE '2024-01-01' → ISO string
            k2, v2 = take("lit")
            return v2
        raise ValueError(f"expected literal, got {kind}")

    def predicate():
        kind, val = take()
        if kind == "(":
            e = or_expr()
            take(")")
            return e
        if kind == "NOT":
            return not_(predicate())
        if kind == "TRUE":
            return always_true()
        if kind == "FALSE":
            return always_false()
        if kind != "ident":
            raise ValueError(f"expected column name, got {kind}")
        col = val
        kind, opv = peek()
        if kind == "op":
            take()
            v = literal()
            return {
                "<": lt, "<=": lt_eq, ">": gt, ">=": gt_eq,
                "=": eq, "<>": not_eq, "!=": not_eq,
            }[opv](col, v)
        if kind == "IS":
            take()
            if peek()[0] == "NOT":
                take()
                take("NULL")
                return not_null(col)
            take("NULL")
            return is_null(col)
        if kind == "BETWEEN":
            take()
            lo = literal()
            take("AND")
            hi = literal()
            return and_(gt_eq(col, lo), lt_eq(col, hi))
        negated = False
        if kind == "NOT":
            take()
            negated = True
            kind = peek()[0]
        if kind == "IN":
            take()
            take("(")
            vals = [literal()]
            while peek()[0] == ",":
                take()
                vals.append(literal())
            take(")")
            return not_in(col, vals) if negated else in_(col, vals)
        raise ValueError(f"expected operator after column {col!r}, got {kind}")

    def and_expr():
        e = predicate()
        while peek()[0] == "AND":
            take()
            e = and_(e, predicate())
        return e

    def or_expr():
        e = and_expr()
        while peek()[0] == "OR":
            take()
            e = or_(e, and_expr())
        return e

    out = or_expr()
    if i != len(tokens):
        raise ValueError(f"trailing tokens in WHERE: {tokens[i:]}")
    return out

