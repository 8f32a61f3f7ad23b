"""ES|QL subset → Catalyst compiler.

ES|QL is Elasticsearch's piped query language [public: ES|QL reference,
"ES|QL commands and functions"]. This module compiles a pinned subset of it
straight to PySpark DataFrame plans, so every pipe stays declarative and
Catalyst keeps its whole-optimizer toolbox (pushdown through WHERE/KEEP,
broadcast for LOOKUP JOIN, partial aggregation for STATS):

    FROM <table>
      | WHERE <boolean expr>
      | EVAL name = expr [, name = expr ...]      (later evals see earlier)
      | STATS name = AGG(expr) [, ...] [BY key [, key ...]]
      | SORT col [ASC|DESC] [, ...]
      | LIMIT n
      | KEEP col [, ...]
      | DROP col [, ...]
      | RENAME old AS new [, ...]
      | LOOKUP JOIN <table> ON <col>              (left join, broadcast dim)
      | ENRICH <policy> ON <col> [WITH f, ...]    (broadcast enrich index)
      | SAMPLE <prob> [ON <col>]                  (deterministic hash variant)
      | CHANGE_POINT <val> ON <key>               (deterministic CUSUM variant)
      | MV_EXPAND col
      | DISSECT col "%{a}-%{b}"                   (separator extraction)
      | GROK col "src%{INT:snum}"                 (pattern-library extraction)

Expressions: literals (double-quoted strings, numbers, TRUE/FALSE/NULL),
columns, arithmetic (+ - * / %), comparisons (== != < <= > >=), NOT/AND/OR,
`IN (lit, ...)`, `LIKE "pat*"` (ES|QL * wildcard → SQL %), `IS [NOT] NULL`,
and the pinned scalar/string/math/multivalue functions in _FUNCS. STATS
aggregations: COUNT(*), COUNT, SUM, AVG, MIN, MAX, COUNT_DISTINCT, MEDIAN,
STD_DEV, VALUES (pinned sorted), PERCENTILE(x, p), TOP(x, k, order).

Pinned narrowings vs full ES|QL (each raises, never silently misparses):
no ROW/SHOW/INLINESTATS/FORK, no KEEP/DROP wildcards, DATE_TRUNC takes a
quoted unit ("day") instead of a time literal, GROK covers the
pattern-library subset in _GROK_PATTERNS, SAMPLE is the deterministic
portable-hash variant and CHANGE_POINT the deterministic CUSUM variant
(divergences documented at their command sites).

Scale shape: FROM is a pruned parquet scan (WHERE/KEEP push into it), STATS
is one partial+final hash aggregate, LOOKUP JOIN broadcasts the lookup table
(ES|QL requires lookup tables to be small/indexed, same assumption), SORT +
LIMIT fuse to TakeOrderedAndProject. Nothing here adds a UDF.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- lexer -------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<number>\d+(?:\.\d+)?)
      | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op><=|>=|==|!=|[<>+\-*/%(),=])
    )""",
    re.VERBOSE,
)

_KEYWORDS = frozenset(
    "from where eval stats by sort limit keep drop rename as asc desc "
    "and or not like in is null true false lookup join on nulls first last "
    "dissect grok mv_expand change_point enrich with sample".split()
)


def _lex(text: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"ES|QL: cannot lex at ...{text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "ident" and val.lower() in _KEYWORDS:
            toks.append(("kw", val.lower()))
        else:
            toks.append((kind, val))
    return toks


def _unquote(s: str) -> str:
    return s[1:-1].replace('\\"', '"').replace("\\\\", "\\")


# --- expression parser (recursive descent → Column) --------------------------


class _P:
    def __init__(self, toks: list[tuple[str, str]], allow_aggs: bool = False):
        self.toks, self.i = toks, 0
        # STATS right-hand sides may wrap aggregations in scalar functions
        # (ROUND(SUM(x), 4)) — agg names resolve only when this is set
        self.allow_aggs = allow_aggs

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def eat_kw(self, kw: str) -> bool:
        if self.peek() == ("kw", kw):
            self.i += 1
            return True
        return False

    def expect(self, kind: str, val: str | None = None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"ES|QL: expected {val or kind}, got {v!r}")
        return v

    def done(self) -> bool:
        return self.i >= len(self.toks)


# literal-aware AST atom: functions like ROUND/DATE_TRUNC need raw literal
# args, so the parser returns ("col", Column) | ("lit", python_value)
def _c(node) -> Column:
    return node[1] if node[0] == "col" else F.lit(node[1])


def _lit_of(node, what: str):
    if node[0] != "lit":
        raise ValueError(f"ES|QL: {what} must be a literal")
    return node[1]


def _fn_round(args):
    if len(args) == 1:
        return ("col", F.round(_c(args[0])))
    return ("col", F.round(_c(args[0]), int(_lit_of(args[1], "ROUND digits"))))


def _fn_substring(args):
    # ES|QL SUBSTRING is 1-based like SQL
    s = _c(args[0])
    start = _c(args[1])
    if len(args) == 3:
        return ("col", s.substr(start, _c(args[2])))
    return ("col", s.substr(start, F.length(s)))


def _fn_date_trunc(args):
    unit = _lit_of(args[0], "DATE_TRUNC unit")
    return ("col", F.date_trunc(str(unit), _c(args[1])))


def _fn_case(args):
    # ES|QL CASE(cond1, val1 [, cond2, val2 ...] [, default])
    if len(args) < 2:
        raise ValueError("ES|QL: CASE needs condition/value pairs")
    rest = list(args)
    default = rest.pop() if len(rest) % 2 == 1 else None
    col = F.when(_c(rest[0]), _c(rest[1]))
    for j in range(2, len(rest), 2):
        col = col.when(_c(rest[j]), _c(rest[j + 1]))
    if default is not None:
        col = col.otherwise(_c(default))
    return ("col", col)


_FUNCS: dict[str, Callable] = {
    "round": _fn_round,
    "abs": lambda a: ("col", F.abs(_c(a[0]))),
    "ceil": lambda a: ("col", F.ceil(_c(a[0]))),
    "floor": lambda a: ("col", F.floor(_c(a[0]))),
    "length": lambda a: ("col", F.length(_c(a[0]))),
    "to_upper": lambda a: ("col", F.upper(_c(a[0]))),
    "to_lower": lambda a: ("col", F.lower(_c(a[0]))),
    "to_long": lambda a: ("col", _c(a[0]).cast("long")),
    "to_double": lambda a: ("col", _c(a[0]).cast("double")),
    "to_string": lambda a: ("col", _c(a[0]).cast("string")),
    "concat": lambda a: ("col", F.concat(*[_c(x) for x in a])),
    "greatest": lambda a: ("col", F.greatest(*[_c(x) for x in a])),
    "least": lambda a: ("col", F.least(*[_c(x) for x in a])),
    "coalesce": lambda a: ("col", F.coalesce(*[_c(x) for x in a])),
    "starts_with": lambda a: ("col", _c(a[0]).startswith(_c(a[1]))),
    "ends_with": lambda a: ("col", _c(a[0]).endswith(_c(a[1]))),
    "replace": lambda a: (  # ES|QL REPLACE(str, regex, new) is regex-based
        "col",
        F.regexp_replace(_c(a[0]), str(_lit_of(a[1], "REPLACE pattern")), str(_lit_of(a[2], "REPLACE new"))),
    ),
    "substring": _fn_substring,
    "date_trunc": _fn_date_trunc,
    "case": _fn_case,
    # string surface [public: ES|QL string functions]
    "trim": lambda a: ("col", F.trim(_c(a[0]))),
    "ltrim": lambda a: ("col", F.ltrim(_c(a[0]))),
    "rtrim": lambda a: ("col", F.rtrim(_c(a[0]))),
    "left": lambda a: (
        "col",
        F.substring(_c(a[0]), 1, int(_lit_of(a[1], "LEFT length"))),
    ),
    "right": lambda a: (
        "col",
        F.substring(
            _c(a[0]),
            -int(_lit_of(a[1], "RIGHT length")),
            int(_lit_of(a[1], "RIGHT length")),
        ),
    ),
    # ES|QL SPLIT takes a LITERAL delimiter, not a regex — quote it for
    # Spark's regex-based split
    "split": lambda a: (
        "col",
        F.split(_c(a[0]), re.escape(str(_lit_of(a[1], "SPLIT delimiter")))),
    ),
    # math surface [public: ES|QL math functions]
    "sqrt": lambda a: ("col", F.sqrt(_c(a[0]))),
    "pow": lambda a: ("col", F.pow(_c(a[0]), _c(a[1]))),
    "log10": lambda a: ("col", F.log10(_c(a[0]))),
    "exp": lambda a: ("col", F.exp(_c(a[0]))),
    # ES|QL LOG(x) is natural log; LOG(base, x) two-arg form
    "log": lambda a: (
        "col",
        F.log(_c(a[0])) if len(a) == 1
        else F.log(float(_lit_of(a[0], "LOG base")), _c(a[1])),
    ),
    # multivalue surface [public: ES|QL mv functions]
    "mv_count": lambda a: ("col", F.size(_c(a[0]))),
    "mv_min": lambda a: ("col", F.array_min(_c(a[0]))),
    "mv_max": lambda a: ("col", F.array_max(_c(a[0]))),
    "mv_avg": lambda a: (
        "col",
        F.aggregate(
            _c(a[0]), F.lit(0.0), lambda acc, x: acc + x.cast("double")
        )
        / F.size(_c(a[0])),
    ),
    "mv_sum": lambda a: (
        "col",
        F.aggregate(
            _c(a[0]), F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ),
    ),
    # ES|QL DATE_FORMAT(format, date) — Java datetime pattern, same
    # pattern language Spark uses
    "date_format": lambda a: (
        "col",
        F.date_format(_c(a[1]), str(_lit_of(a[0], "DATE_FORMAT pattern"))),
    ),
}

_AGGS: dict[str, Callable] = {
    "count": lambda c: F.count(c if c is not None else F.lit(1)),
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count_distinct": F.countDistinct,
    "median": F.median,
    # ES|QL STD_DEV is the population standard deviation
    "std_dev": F.stddev_pop,
    # ES|QL VALUES returns the distinct values as a multivalue in undefined
    # order — pinned SORTED here so results are deterministic and
    # oracle-checkable (divergence documented)
    "values": lambda c: F.array_sort(F.collect_set(c)),
}


def _parse_expr(p: _P):
    return _parse_or(p)


def _parse_or(p: _P):
    node = _parse_and(p)
    while p.eat_kw("or"):
        node = ("col", _c(node) | _c(_parse_and(p)))
    return node


def _parse_and(p: _P):
    node = _parse_not(p)
    while p.eat_kw("and"):
        node = ("col", _c(node) & _c(_parse_not(p)))
    return node


def _parse_not(p: _P):
    if p.eat_kw("not"):
        return ("col", ~_c(_parse_not(p)))
    return _parse_cmp(p)


def _parse_cmp(p: _P):
    node = _parse_add(p)
    k, v = p.peek()
    if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
        p.next()
        rhs = _parse_add(p)
        lhs, r = _c(node), _c(rhs)
        col = {
            "==": lhs == r, "!=": lhs != r, "<": lhs < r,
            "<=": lhs <= r, ">": lhs > r, ">=": lhs >= r,
        }[v]
        return ("col", col)
    if p.eat_kw("like"):
        pat = _lit_of(_parse_add(p), "LIKE pattern")
        # ES|QL wildcards: * → any chars, ? → one char [public: ES|QL LIKE]
        sql_pat = str(pat).replace("%", r"\%").replace("_", r"\_")
        sql_pat = sql_pat.replace("*", "%").replace("?", "_")
        return ("col", _c(node).like(sql_pat))
    if p.eat_kw("in"):
        p.expect("op", "(")
        vals = [_lit_of(_parse_expr(p), "IN value")]
        while p.peek() == ("op", ","):
            p.next()
            vals.append(_lit_of(_parse_expr(p), "IN value"))
        p.expect("op", ")")
        return ("col", _c(node).isin(*vals))
    if p.eat_kw("is"):
        neg = p.eat_kw("not")
        if not p.eat_kw("null"):
            raise ValueError("ES|QL: expected NULL after IS")
        col = _c(node).isNotNull() if neg else _c(node).isNull()
        return ("col", col)
    return node


def _parse_add(p: _P):
    node = _parse_mul(p)
    while True:
        k, v = p.peek()
        if k == "op" and v in ("+", "-"):
            p.next()
            rhs = _parse_mul(p)
            node = ("col", (_c(node) + _c(rhs)) if v == "+" else (_c(node) - _c(rhs)))
        else:
            return node


def _parse_mul(p: _P):
    node = _parse_unary(p)
    while True:
        k, v = p.peek()
        if k == "op" and v in ("*", "/", "%"):
            p.next()
            rhs = _parse_unary(p)
            lhs, r = _c(node), _c(rhs)
            node = ("col", lhs * r if v == "*" else (lhs / r if v == "/" else lhs % r))
        else:
            return node


def _parse_unary(p: _P):
    if p.peek() == ("op", "-"):
        p.next()
        node = _parse_unary(p)
        if node[0] == "lit" and isinstance(node[1], (int, float)):
            return ("lit", -node[1])
        return ("col", -_c(node))
    return _parse_primary(p)


def _parse_primary(p: _P):
    k, v = p.next()
    if k == "number":
        return ("lit", float(v) if "." in v else int(v))
    if k == "string":
        return ("lit", _unquote(v))
    if k == "kw" and v in ("true", "false"):
        return ("lit", v == "true")
    if k == "kw" and v == "null":
        return ("col", F.lit(None))
    if k == "op" and v == "(":
        node = _parse_expr(p)
        p.expect("op", ")")
        return node
    if k == "ident":
        if p.peek() == ("op", "("):
            name = v.lower()
            p.next()
            if p.allow_aggs and (name in _AGGS or name in ("percentile", "top")):
                return _parse_agg_call(p, name)
            args = []
            if p.peek() != ("op", ")"):
                args.append(_parse_expr(p))
                while p.peek() == ("op", ","):
                    p.next()
                    args.append(_parse_expr(p))
            p.expect("op", ")")
            fn = _FUNCS.get(name)
            if fn is None:
                kind = "aggregation" if name in _AGGS or name in ("percentile", "top") else "function"
                raise ValueError(f"ES|QL: unknown {kind} {v!r} here")
            return fn(args)
        return ("col", F.col(v))
    raise ValueError(f"ES|QL: unexpected token {v!r}")


def _parse_agg_call(p: _P, name: str):
    """Parse one aggregation call body (the '(' is already consumed).
    Aggregation ARGUMENTS are plain scalar expressions (no nested aggs,
    matching ES|QL)."""
    inner = p.allow_aggs
    p.allow_aggs = False
    try:
        if name == "percentile":
            arg = _parse_expr(p)
            p.expect("op", ",")
            q = _lit_of(_parse_expr(p), "PERCENTILE p")
            p.expect("op", ")")
            return ("col", F.percentile(_c(arg), float(q) / 100.0))
        if name == "top":
            # ES|QL TOP(col, k, "asc"|"desc") — the k greatest/least values
            # of the group as a multivalue [public: ES|QL TOP agg]
            arg = _parse_expr(p)
            p.expect("op", ",")
            k = int(_lit_of(_parse_expr(p), "TOP k"))
            p.expect("op", ",")
            order = str(_lit_of(_parse_expr(p), "TOP order")).lower()
            p.expect("op", ")")
            if order not in ("asc", "desc"):
                raise ValueError(f"ES|QL: TOP order must be asc/desc: {order!r}")
            sorted_vals = F.array_sort(F.collect_list(_c(arg)))
            if order == "desc":
                sorted_vals = F.reverse(sorted_vals)
            return ("col", F.slice(sorted_vals, 1, k))
        if p.peek() == ("op", "*"):
            p.next()
            arg_col = None
        elif p.peek() == ("op", ")") and name == "count":
            arg_col = None
        else:
            arg_col = _c(_parse_expr(p))
        p.expect("op", ")")
        return ("col", _AGGS[name](arg_col))
    finally:
        p.allow_aggs = inner


def _expr_from(tokens: list) -> Column:
    p = _P(tokens)
    node = _parse_expr(p)
    if not p.done():
        raise ValueError(f"ES|QL: trailing tokens at {p.peek()[1]!r}")
    return _c(node)


# --- DISSECT / GROK pattern compilers ----------------------------------------
# [public: ES|QL DISSECT/GROK processing commands; the same pattern syntax as
# the ES ingest pipeline's dissect/grok processors]. Both compile to ONE Java
# regex evaluated via regexp_extract per extracted field — the dialect subset
# used (\d \w \S, non-greedy, anchors) behaves identically in Java and RE2,
# so the DuckDB twins replay the exact regex. Pinned divergence vs ES: a
# non-matching row yields '' (regexp_extract's no-match value on both
# engines), not null.

_GROK_PATTERNS = {
    "WORD": r"\w+",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
}


def _compile_dissect(pattern: str) -> tuple[str, list[str]]:
    """'%{a}-%{b}' → anchored regex with one non-greedy group per ref (the
    last ref greedy, as dissect consumes to end-of-string)."""
    parts = re.split(r"(%\{[^}]*\})", pattern)
    regex, names = ["^"], []
    for part in parts:
        if not part:
            continue
        m = re.fullmatch(r"%\{([A-Za-z_][A-Za-z_0-9]*)\}", part)
        if m:
            names.append(m.group(1))
            regex.append("(.*?)")
        else:
            regex.append(re.escape(part))
    if not names:
        raise ValueError("ES|QL: DISSECT pattern has no %{field} refs")
    s = "".join(regex) + "$"
    if s.endswith("(.*?)$"):
        s = s[: -len("(.*?)$")] + "(.*)$"
    return s, names


def _compile_grok(pattern: str) -> tuple[str, list[str]]:
    """'src%{INT:snum}' → anchored regex; %{SYNTAX:name} captures, %{SYNTAX}
    matches without capturing."""
    names, out, pos = [], ["^"], 0
    refs = list(re.finditer(r"%\{([A-Z0-9_]+)(?::([A-Za-z_][A-Za-z_0-9]*))?\}", pattern))
    if not refs:
        raise ValueError("ES|QL: GROK pattern has no %{SYNTAX} refs")
    for m in refs:
        out.append(re.escape(pattern[pos : m.start()]))
        syntax, name = m.group(1), m.group(2)
        sub = _GROK_PATTERNS.get(syntax)
        if sub is None:
            raise ValueError(f"ES|QL: unknown grok pattern %{{{syntax}}}")
        if name:
            names.append(name)
            out.append(f"({sub})")
        else:
            out.append(f"(?:{sub})")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    return "".join(out) + "$", names


# --- pipe splitter + command compiler ----------------------------------------


def _split_pipes(query: str) -> list[str]:
    parts, buf, in_str, i = [], [], False, 0
    while i < len(query):
        ch = query[i]
        if in_str:
            buf.append(ch)
            if ch == "\\" and i + 1 < len(query):
                buf.append(query[i + 1])
                i += 1
            elif ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
            buf.append(ch)
        elif ch == "|":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [s.strip() for s in parts if s.strip()]


def _parse_stats(p: _P, df: DataFrame) -> DataFrame:
    aggs = []
    p.allow_aggs = True
    while True:
        k, name = p.next()
        if k != "ident":
            raise ValueError(f"ES|QL: STATS expects name = <agg expr>, got {name!r}")
        p.expect("op", "=")
        # the agg expression runs to the next top-level comma or BY
        depth, j = 0, p.i
        while j < len(p.toks):
            kk, vv = p.toks[j]
            if kk == "op" and vv == "(":
                depth += 1
            elif kk == "op" and vv == ")":
                depth -= 1
            elif depth == 0 and ((kk == "op" and vv == ",") or (kk, vv) == ("kw", "by")):
                break
            j += 1
        sub = _P(p.toks[p.i:j], allow_aggs=True)
        node = _parse_expr(sub)
        if not sub.done():
            raise ValueError(f"ES|QL: trailing tokens in STATS at {sub.peek()[1]!r}")
        aggs.append(_c(node).alias(name))
        p.i = j
        if p.peek() == ("op", ","):
            p.next()
            continue
        break
    keys = []
    if p.eat_kw("by"):
        keys.append(p.expect("ident"))
        while p.peek() == ("op", ","):
            p.next()
            keys.append(p.expect("ident"))
    if not p.done():
        raise ValueError(f"ES|QL: trailing tokens in STATS at {p.peek()[1]!r}")
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def esql(query: str, resolve: Callable[[str], DataFrame]) -> DataFrame:
    """Compile one ES|QL query to a DataFrame. `resolve(name)` supplies the
    FROM / LOOKUP JOIN tables (the registry passes the sf_dir fixture
    reader; tests pass dict lookups)."""
    pipes = _split_pipes(query)
    if not pipes or not pipes[0].lower().startswith("from"):
        raise ValueError("ES|QL: query must start with FROM <table>")
    head = _P(_lex(pipes[0]))
    head.expect("kw", "from")
    df = resolve(head.expect("ident"))
    if not head.done():
        raise ValueError("ES|QL: FROM takes exactly one table")
    for pipe in pipes[1:]:
        p = _P(_lex(pipe))
        k, cmd = p.next()
        if k != "kw":
            raise ValueError(f"ES|QL: unknown command {cmd!r}")
        if cmd == "where":
            df = df.filter(_expr_from(p.toks[p.i:]))
        elif cmd == "eval":
            while True:
                name = p.expect("ident")
                p.expect("op", "=")
                # an eval expression runs to the next top-level comma
                depth, j = 0, p.i
                while j < len(p.toks):
                    kk, vv = p.toks[j]
                    if kk == "op" and vv == "(":
                        depth += 1
                    elif kk == "op" and vv == ")":
                        depth -= 1
                    elif kk == "op" and vv == "," and depth == 0:
                        break
                    j += 1
                df = df.withColumn(name, _expr_from(p.toks[p.i:j]))
                p.i = j
                if p.peek() == ("op", ","):
                    p.next()
                    continue
                break
        elif cmd == "stats":
            df = _parse_stats(p, df)
        elif cmd == "sort":
            order = []
            while True:
                col = F.col(p.expect("ident"))
                desc = p.eat_kw("desc")
                if not desc:
                    p.eat_kw("asc")
                # ES|QL NULLS FIRST / NULLS LAST [public: ES|QL sort]
                nulls = None
                if p.eat_kw("nulls"):
                    if p.eat_kw("first"):
                        nulls = "first"
                    elif p.eat_kw("last"):
                        nulls = "last"
                    else:
                        raise ValueError("ES|QL: expected FIRST/LAST after NULLS")
                if desc:
                    order.append(
                        col.desc_nulls_first() if nulls == "first"
                        else col.desc_nulls_last() if nulls == "last"
                        else col.desc()
                    )
                else:
                    order.append(
                        col.asc_nulls_first() if nulls == "first"
                        else col.asc_nulls_last() if nulls == "last"
                        else col.asc()
                    )
                if p.peek() == ("op", ","):
                    p.next()
                    continue
                break
            df = df.orderBy(*order)
        elif cmd == "limit":
            df = df.limit(int(p.expect("number")))
        elif cmd == "keep":
            cols = [p.expect("ident")]
            while p.peek() == ("op", ","):
                p.next()
                cols.append(p.expect("ident"))
            df = df.select(*cols)
        elif cmd == "drop":
            cols = [p.expect("ident")]
            while p.peek() == ("op", ","):
                p.next()
                cols.append(p.expect("ident"))
            df = df.drop(*cols)
        elif cmd == "rename":
            while True:
                old = p.expect("ident")
                if not p.eat_kw("as"):
                    raise ValueError("ES|QL: RENAME needs old AS new")
                df = df.withColumnRenamed(old, p.expect("ident"))
                if p.peek() == ("op", ","):
                    p.next()
                    continue
                break
        elif cmd == "mv_expand":
            # ES|QL MV_EXPAND: one row per element of a multivalued column
            # (explode, null/empty arrays drop the row — pinned to explode's
            # semantics, ES keeps a null row for null fields)
            col = p.expect("ident")
            df = df.withColumn(col, F.explode(col))
        elif cmd == "change_point":
            # ES|QL CHANGE_POINT value [ON key] [public: ES|QL change_point
            # command] — pinned DETERMINISTIC variant, same estimator as
            # aggs.change_point_agg: ES fits candidate models and reports a
            # p-value; here S_t = cumsum(x - mean(x)) over rows ordered by
            # the ON key, and the |S_t|-argmax row (ties → earliest key;
            # the last row has no right side and is excluded) is marked
            # type='step_change' with the CUSUM statistic in `cusum` (the
            # deterministic stand-in for ES's pvalue — divergence
            # documented). Runs over bucket-frame inputs (the command
            # follows a STATS in practice), never corpus-sized rows.
            from pyspark.sql import Window

            val = p.expect("ident")
            key = p.expect("ident") if p.eat_kw("on") else "@timestamp"
            w_all = Window.orderBy(key).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            w_cum = Window.orderBy(key).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            w_after = Window.orderBy(key).rowsBetween(
                1, Window.unboundedFollowing
            )
            cus = F.sum(F.col(val) - F.avg(val).over(w_all)).over(w_cum)
            df = df.withColumn(
                "_cusum", F.when(F.avg(val).over(w_after).isNotNull(), cus)
            )
            rn = F.row_number().over(
                Window.orderBy(
                    F.abs(F.col("_cusum")).desc_nulls_last(), F.col(key).asc()
                )
            )
            df = (
                df.withColumn("_rn", rn)
                .withColumn(
                    "type", F.when(F.col("_rn") == 1, F.lit("step_change"))
                )
                .withColumn(
                    "cusum", F.when(F.col("_rn") == 1, F.round("_cusum", 4))
                )
                .drop("_cusum", "_rn")
            )
        elif cmd in ("dissect", "grok"):
            src = p.expect("ident")
            k2, pat = p.next()
            if k2 != "string":
                raise ValueError(f"ES|QL: {cmd.upper()} needs a quoted pattern")
            compiler = _compile_dissect if cmd == "dissect" else _compile_grok
            regex, names = compiler(_unquote(pat))
            for i, nm in enumerate(names, start=1):
                df = df.withColumn(nm, F.regexp_extract(F.col(src), regex, i))
        elif cmd == "enrich":
            # ES|QL ENRICH policy ON match_field [WITH f1, f2] [public:
            # ES|QL enrich command]: enrich indexes are small by contract —
            # broadcast left join; the main stream never shuffles (same
            # shape as LOOKUP JOIN).
            policy = p.expect("ident")
            if not p.eat_kw("on"):
                raise ValueError("ES|QL: ENRICH needs ON <match_field>")
            key = p.expect("ident")
            lookup = resolve(policy)
            if p.eat_kw("with"):
                cols = [p.expect("ident")]
                while p.peek() == ("op", ","):
                    p.next()
                    cols.append(p.expect("ident"))
                lookup = lookup.select(key, *cols)
            df = df.join(F.broadcast(lookup), on=key, how="left")
        elif cmd == "sample":
            # ES|QL SAMPLE probability [ON col] [public: ES|QL sample
            # command] — pinned DETERMINISTIC variant: ES samples randomly,
            # which is not oracle-checkable, so the pinned semantics hash a
            # key column (ON col; default the frame's first column) with the
            # samplers' SQL-portable multiplicative hash and keep rows where
            # hash % 1000 < probability·1000 (divergence documented, same
            # idiom as random_sampler). Pure codegen filter on the scan.
            from .sample import portable_hash_expr

            k2, v2 = p.next()
            if k2 != "number":
                raise ValueError("ES|QL: SAMPLE needs a probability")
            prob = float(v2)
            if not 0 < prob <= 1:
                raise ValueError(
                    f"ES|QL: SAMPLE probability must be in (0, 1]: {prob}"
                )
            key = p.expect("ident") if p.eat_kw("on") else df.columns[0]
            df = df.filter(
                (portable_hash_expr(key) % 1000) < int(round(prob * 1000))
            )
        elif cmd == "lookup":
            if not p.eat_kw("join"):
                raise ValueError("ES|QL: expected LOOKUP JOIN")
            table = p.expect("ident")
            if not p.eat_kw("on"):
                raise ValueError("ES|QL: LOOKUP JOIN needs ON <col>")
            key = p.expect("ident")
            # ES|QL lookup tables are small by contract (lookup index mode)
            # — broadcast left join, never a shuffle of the main stream
            df = df.join(F.broadcast(resolve(table)), on=key, how="left")
        else:
            raise ValueError(f"ES|QL: unsupported command {cmd!r}")
    return df
