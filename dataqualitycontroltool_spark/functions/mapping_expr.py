"""Mapping-expression compiler: the reference's 36-function transformation
language compiled STRAIGHT to Catalyst ``Column`` expressions.

The reference (`/root/reference/mipqctool/data/trFunctions.csv`, parser
`controller/correspondenceparser.py:20-99`) only syntax-checks these
expressions and serializes them into MIPMap XML for an external engine
(`model/mapping/correspondence.py:99-131`).  Here Catalyst IS the mapping
engine (SURVEY §2.1 S11): a recursive-descent parser builds the Column tree,
so every mapping expression runs inside whole-stage codegen with zero
external processes.

Language: function calls, ``table.column`` / bare column references,
double-quoted string literals, numeric literals, ``== != < <= > >=``
comparisons, ``+ - * /`` arithmetic, parentheses.  Nested-if nominal
recoding (`model/mapping/functions.py:6-24` ``ifstr``) is exposed directly
as :func:`recode`.

Pinned semantic choices (documented where the reference delegates to MIPMap/
Java): ``indexof`` is 0-based with -1 for absent (Java ``indexOf``);
``substring(str, start, [end])`` is 0-based begin-inclusive / end-exclusive
(Java ``substring``); ``log`` is base-10 and ``ln`` natural; ``mod`` keeps
the dividend's sign (Java ``%``); ``newId()`` is a UUID (non-deterministic
by nature — keep it out of oracle-checked paths).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

from dataqualitycontroltool_spark.datefmt import strptime_to_java


class ExpressionError(ValueError):
    """Unparseable expression / unknown function / unknown column."""


# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<number>\d+\.\d+|\d+)
      | (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<name>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op>&&|\|\||==|!=|<=|>=|[-+*/<>(),.])
    )""",
    re.VERBOSE,
)


def _tokenize(expr: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            if expr[pos:].strip():
                raise ExpressionError(f"unexpected character at {pos}: {expr[pos:]!r}")
            break
        pos = m.end()
        for kind in ("number", "string", "name", "op"):
            if m.group(kind) is not None:
                out.append((kind, m.group(kind)))
                break
    return out


# ---------------------------------------------------------------------------
# function table (name, min_args, max_args, builder)
# ---------------------------------------------------------------------------


def _pattern_arg(args: list[Column], raw: list, idx: int) -> str:
    """date/timestamp patterns must be string literals; strptime-style
    patterns (with %) are translated to Java DateTimeFormatter."""
    tok = raw[idx]
    if not (isinstance(tok, str)):
        raise ExpressionError("pattern argument must be a string literal")
    return strptime_to_java(tok) if "%" in tok else tok


_NUMERIC_RE = r"^[+-]?(\d+\.?\d*|\.\d+)$"

FUNCTIONS: dict[str, tuple[int, int]] = {}
_BUILDERS = {}


def _fn(name: str, min_args: int, max_args: int):
    def deco(f):
        FUNCTIONS[name] = (min_args, max_args)
        _BUILDERS[name] = f
        return f
    return deco


@_fn("abs", 1, 1)
def _abs(a, raw): return F.abs(a[0])

@_fn("ceil", 1, 1)
def _ceil(a, raw): return F.ceil(a[0])

@_fn("floor", 1, 1)
def _floor(a, raw): return F.floor(a[0])

@_fn("exp", 1, 1)
def _exp(a, raw): return F.exp(a[0])

@_fn("log", 1, 1)
def _log(a, raw): return F.log10(a[0])

@_fn("ln", 1, 1)
def _ln(a, raw): return F.log(a[0])

@_fn("mod", 2, 2)
def _mod(a, raw): return a[0] % a[1]

@_fn("pow", 2, 2)
def _pow(a, raw): return F.pow(a[0], a[1])

@_fn("sqrt", 1, 1)
def _sqrt(a, raw): return F.sqrt(a[0])

@_fn("round", 1, 2)
def _round(a, raw):
    if len(a) <= 1:
        return F.round(a[0], 0)
    # F.round requires a literal scale; a computed second arg (raw None or
    # non-integer text) must be a clean ExpressionError, not a TypeError
    try:
        scale = int(raw[1])
    except (TypeError, ValueError):
        raise ExpressionError("round scale must be an integer literal")
    return F.round(a[0], scale)

@_fn("cos", 1, 1)
def _cos(a, raw): return F.cos(a[0])

@_fn("sin", 1, 1)
def _sin(a, raw): return F.sin(a[0])

@_fn("tan", 1, 1)
def _tan(a, raw): return F.tan(a[0])

@_fn("append", 2, 99)
def _append(a, raw): return F.concat(*a)

@_fn("contains", 2, 2)
def _contains(a, raw): return a[0].contains(a[1])

@_fn("containCount", 2, 2)
def _contain_count(a, raw):
    # occurrences of a literal substring: split on it (regex-quoted), parts-1
    return F.size(F.split(a[0], _quote(raw[1]))) - 1

@_fn("indexof", 2, 2)
def _indexof(a, raw): return F.instr(a[0], a[1]) - 1

@_fn("len", 1, 1)
def _len(a, raw): return F.length(a[0])

@_fn("replace", 3, 3)
def _replace(a, raw): return F.replace(a[0], a[1], a[2])

@_fn("substring", 2, 3)
def _substr(a, raw):
    start = a[1] + 1
    if len(a) == 3:
        return F.substring(a[0], start, a[2] - a[1])
    return F.substring(a[0], start, F.lit(2_147_483_647))

@_fn("tolower", 1, 1)
def _tolower(a, raw): return F.lower(a[0])

@_fn("toupper", 1, 1)
def _toupper(a, raw): return F.upper(a[0])

@_fn("tostring", 1, 1)
def _tostring(a, raw): return a[0].cast("string")

@_fn("if", 3, 3)
def _if(a, raw): return F.when(a[0], a[1]).otherwise(a[2])

@_fn("isNull", 1, 1)
def _isnull(a, raw): return F.isnull(a[0])

@_fn("isNotNull", 1, 1)
def _isnotnull(a, raw): return F.isnotnull(a[0])

@_fn("null", 0, 0)
def _null(a, raw): return F.lit(None)

@_fn("isNumeric", 1, 1)
def _isnumeric(a, raw): return a[0].rlike(_NUMERIC_RE)

@_fn("date", 0, 0)
def _date(a, raw): return F.current_date()

@_fn("datetime", 0, 0)
def _datetime(a, raw): return F.current_timestamp()

@_fn("currentYear", 0, 0)
def _current_year(a, raw): return F.year(F.current_date())

@_fn("todate", 2, 2)
def _todate(a, raw):
    return F.try_to_timestamp(a[0], F.lit(_pattern_arg(a, raw, 1))).cast("date")

@_fn("totimestamp", 2, 2)
def _tots(a, raw): return F.try_to_timestamp(a[0], F.lit(_pattern_arg(a, raw, 1)))

@_fn("toint", 1, 1)
def _toint(a, raw): return a[0].try_cast("long")   # malformed → null, not error

@_fn("todouble", 1, 1)
def _todouble(a, raw): return a[0].try_cast("double")

@_fn("newId", 0, 0)
def _newid(a, raw): return F.expr("uuid()")


def _quote(raw_val) -> str:
    """containCount helper: split() takes a REGEX — quote the literal."""
    if not isinstance(raw_val, str):
        raise ExpressionError("containCount needs a string literal substring")
    return re.escape(raw_val)


# ---------------------------------------------------------------------------
# recursive-descent parser
# ---------------------------------------------------------------------------

_CMP = {"==": Column.__eq__, "!=": Column.__ne__, "<": Column.__lt__,
        "<=": Column.__le__, ">": Column.__gt__, ">=": Column.__ge__}


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], columns: list[str] | None):
        self.toks = tokens
        self.i = 0
        self.columns = set(columns) if columns is not None else None

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self, expect: str | None = None):
        kind, val = self.peek()
        if kind is None:
            raise ExpressionError("unexpected end of expression")
        if expect is not None and val != expect:
            raise ExpressionError(f"expected {expect!r}, got {val!r}")
        self.i += 1
        return kind, val

    # expr := and_expr ('||' and_expr)*  — MIPMap's logical operators
    # (the reference's own task fixtures use '&&', e.g.
    # tests/test_mappings/xml/map.xml: if(isNull(x) && isNull(y), ...)).
    # '&&' binds TIGHTER than '||' and comparisons bind tighter than both,
    # like every C-family grammar — flattening them to one level would
    # silently mis-associate 'a || b && c' as '(a || b) && c'
    def expr(self):
        left, raw = self.and_expr()
        while self.peek() == ("op", "||"):
            self.take()
            right, rraw = self.and_expr()
            left = self._as_col(left, raw) | self._as_col(right, rraw)
            raw = None
        return left, raw

    # and_expr := cmp ('&&' cmp)*
    def and_expr(self):
        left, raw = self.cmp()
        while self.peek() == ("op", "&&"):
            self.take()
            right, rraw = self.cmp()
            left = self._as_col(left, raw) & self._as_col(right, rraw)
            raw = None
        return left, raw

    # cmp := term (cmp_op term)?
    def cmp(self):
        left, raw = self.term()
        kind, val = self.peek()
        if kind == "op" and val in _CMP:
            self.take()
            right, rraw = self.term()
            return _CMP[val](self._as_col(left, raw), self._as_col(right, rraw)), None
        return left, raw

    @staticmethod
    def _fold(raw, rraw, op):
        """Driver-side constant folding for literal-literal arithmetic in
        Python (arbitrary precision) — matches the reference's pure-Python
        evaluation, where e.g. a product of int literals never overflows
        the way a chain of int32 Spark literals would under ANSI mode.
        Returns the folded Python value, or None when not foldable."""
        if not all(isinstance(v, (int, float)) and not isinstance(v, bool)
                   for v in (raw, rraw)):
            return None
        if op == "+":
            return raw + rraw
        if op == "-":
            return raw - rraw
        if op == "*":
            return raw * rraw
        if op == "/" and rraw != 0:
            # /0 is deliberately NOT folded: the compiled column keeps the
            # engine's division-by-zero behavior (error under ANSI mode,
            # NULL otherwise) — folding would have to pick one
            return raw / rraw  # Spark and Python / are both true division
        return None

    @staticmethod
    def _as_col(col, raw):
        """Materialize a lazily-folded literal as a Column.  Folding runs in
        arbitrary-precision Python; only the value that actually ENTERS the
        plan must fit a Spark literal type, so an un-representable
        intermediate (e.g. a*b/c where a*b > int64 but the quotient fits)
        never errors — only a final out-of-range literal does, cleanly."""
        if col is not None:
            return col
        if isinstance(raw, int) and not -(2**63) <= raw < 2**63:
            raise ExpressionError(
                f"integer literal out of range for bigint: {raw}"
            )
        return F.lit(raw)

    def term(self):
        left, raw = self.factor()
        while self.peek() == ("op", "+") or self.peek() == ("op", "-"):
            _, op = self.take()
            right, rraw = self.factor()
            folded = self._fold(raw, rraw, op)
            if folded is not None:
                left, raw = None, folded  # stay lazy: materialized at use
            else:
                left = self._as_col(left, raw)
                right = self._as_col(right, rraw)
                left = left + right if op == "+" else left - right
                raw = None
        return left, raw

    def factor(self):
        left, raw = self.unary()
        while self.peek() == ("op", "*") or self.peek() == ("op", "/"):
            _, op = self.take()
            right, rraw = self.unary()
            folded = self._fold(raw, rraw, op)
            if folded is not None:
                left, raw = None, folded  # stay lazy: materialized at use
            else:
                left = self._as_col(left, raw)
                right = self._as_col(right, rraw)
                left = left * right if op == "*" else left / right
                raw = None
        return left, raw

    def unary(self):
        if self.peek() == ("op", "-"):
            self.take()
            inner, iraw = self.unary()
            if isinstance(iraw, (int, float)) and not isinstance(iraw, bool):
                return None, -iraw  # lazy literal
            return -self._as_col(inner, iraw), None
        return self.atom()

    def atom(self):
        kind, val = self.peek()
        if kind == "number":
            self.take()
            num = float(val) if "." in val else int(val)
            return F.lit(num), num
        if kind == "string":
            self.take()
            s = val[1:-1].replace('\\"', '"').replace("\\\\", "\\")
            return F.lit(s), s
        if kind == "op" and val == "(":
            self.take()
            e, raw = self.expr()
            self.take(")")
            return e, raw
        if kind == "name":
            self.take()
            nxt = self.peek()
            if nxt == ("op", "("):
                return self.funcall(val)
            if nxt == ("op", "."):          # table.column → column
                self.take()
                _, col = self.take()
                return self.colref(col)
            return self.colref(val)
        raise ExpressionError(f"unexpected token {val!r}")

    def funcall(self, name: str):
        if name not in FUNCTIONS:
            raise ExpressionError(f"{name!r} is not an existing function")
        self.take("(")
        args, raws = [], []
        if self.peek() != ("op", ")"):
            while True:
                a, raw = self.expr()
                args.append(self._as_col(a, raw))
                raws.append(raw)
                if self.peek() == ("op", ","):
                    self.take()
                    continue
                break
        self.take(")")
        lo, hi = FUNCTIONS[name]
        if not (lo <= len(args) <= hi):
            raise ExpressionError(
                f"function {name!r} takes {lo}..{hi} arguments, got {len(args)}"
            )
        return _BUILDERS[name](args, raws), None

    def colref(self, name: str):
        if self.columns is not None and name not in self.columns:
            raise ExpressionError(f"there is no column named {name!r}")
        return F.col(name), None


def compile_expression(expr: str, columns: list[str] | None = None) -> Column:
    """Compile a mapping expression string to a Catalyst ``Column``.

    ``columns`` (optional) enables the reference's column-existence check
    (`correspondenceparser.py:64-74`); parenthesis/function/arity errors
    raise :class:`ExpressionError` like the reference's ExpressionError."""
    p = _Parser(_tokenize(expr), columns)
    col, raw = p.expr()
    if p.i != len(p.toks):
        raise ExpressionError(f"trailing tokens: {p.toks[p.i:]}")
    return p._as_col(col, raw)


def recode(column: str, mapping: dict[str, str]) -> Column:
    """Nested-if nominal recode (`model/mapping/functions.py:6-24` ``ifstr``):
    value → replacement, anything unmatched → null."""
    out: Column = F.lit(None)
    for src, tgt in reversed(list(mapping.items())):
        out = F.when(F.col(column) == src, F.lit(tgt)).otherwise(out)
    return out
