"""Mapping-expression compiler tests: golden evaluation for the full §2.7
function surface (trFunctions.csv), nesting, errors, and the ifstr recode."""

import datetime

import pytest

from dataqualitycontroltool_spark.functions import (
    ExpressionError,
    FUNCTIONS,
    compile_expression,
    recode,
)

ROW = {
    "x": -2.5, "y": 3.0, "n": 7, "s": "Hello World", "t": "lo",
    "num": "42.5", "nn": None, "d": "13/02/2020", "code": "AA",
}


@pytest.fixture(scope="module")
def ev(spark):
    df = spark.createDataFrame(
        [tuple(ROW.values())],
        "x double, y double, n long, s string, t string, num string, "
        "nn string, d string, code string",
    )

    def _ev(expr, columns=None):
        return df.select(compile_expression(expr, columns).alias("r")).collect()[0].r

    return _ev


CASES = [
    ("abs(x)", 2.5),
    ("ceil(x)", -2),
    ("floor(x)", -3),
    ("exp(0)", 1.0),
    ("log(100)", 2.0),
    ("ln(1)", 0.0),
    ("mod(n, 4)", 3),
    ("mod(0 - n, 4)", -3),            # Java %: sign of dividend
    ("pow(2, 10)", 1024.0),
    ("sqrt(y * y)", 3.0),
    ("round(x)", -3.0),               # Spark HALF_UP away from zero
    ("round(2.345, 2)", 2.35),
    ("cos(0)", 1.0),
    ("sin(0)", 0.0),
    ("tan(0)", 0.0),
    ('append(s, "!", "!")', "Hello World!!"),
    ('contains(s, "World")', True),
    ('contains(s, "xyz")', False),
    ('containCount("aXbXc", "X")', 2),
    ('indexof(s, "World")', 6),       # Java 0-based
    ('indexof(s, "zzz")', -1),
    ("len(s)", 11),
    ('replace(s, "World", "Spark")', "Hello Spark"),
    ("substring(s, 0, 5)", "Hello"),  # Java begin-inclusive end-exclusive
    ("substring(s, 6)", "World"),
    ("tolower(s)", "hello world"),
    ("toupper(t)", "LO"),
    ("tostring(n)", "7"),
    ('if(n > 5, "big", "small")', "big"),
    ("isNull(nn)", True),
    ("isNull(s)", False),
    ("isNotNull(s)", True),
    ("null()", None),
    ("isNumeric(num)", True),
    ("isNumeric(s)", False),
    ('todate(d, "%d/%m/%Y")', datetime.date(2020, 2, 13)),
    ('todate("bogus", "%d/%m/%Y")', None),
    ("toint(num)", None),             # '42.5' is not an integer string
    ('toint("42")', 42),
    ("todouble(num)", 42.5),
    ("currentYear()", datetime.date.today().year),
    # composition / table.column refs / comparisons / arithmetic
    ('if(isNull(nn), toupper(substring(s, 0, 5)), null())', "HELLO"),
    ("events.n + 1", 8),
    ('if(code == "AA", "ok", "no")', "ok"),
    ("(n + 1) * 2 - 1", 15),
]


@pytest.mark.parametrize("expr,expected", CASES, ids=[c[0][:40] for c in CASES])
def test_golden(ev, expr, expected):
    got = ev(expr)
    if isinstance(expected, float):
        assert got == pytest.approx(expected, abs=1e-9)
    else:
        assert got == expected


def test_every_listed_function_is_implemented():
    # trFunctions.csv surface (date()/datetime()/newId() checked separately)
    expected = {
        "abs", "append", "ceil", "contains", "containCount", "cos",
        "currentYear", "date", "datetime", "exp", "floor", "if", "indexof",
        "isNotNull", "isNull", "isNumeric", "len", "log", "ln", "mod",
        "newId", "null", "pow", "replace", "round", "sin", "sqrt",
        "substring", "tan", "todate", "todouble", "toint", "tolower",
        "tostring", "totimestamp", "toupper",
    }
    assert expected <= set(FUNCTIONS)


def test_volatile_functions_run(ev):
    assert ev("date()") == datetime.date.today()
    assert len(ev("newId()")) == 36
    assert ev("datetime()") is not None


def test_errors():
    with pytest.raises(ExpressionError):
        compile_expression("nosuchfn(1)")
    with pytest.raises(ExpressionError):
        compile_expression("abs(1, 2)")
    with pytest.raises(ExpressionError):
        compile_expression("abs(1")
    with pytest.raises(ExpressionError):
        compile_expression("if(a == 1, 2, 3)", columns=["b"])
    compile_expression("if(a == 1, 2, 3)", columns=["a"])  # ok
    # ADVICE r1: non-literal round scale is a clean ExpressionError
    with pytest.raises(ExpressionError, match="integer literal"):
        compile_expression("round(a, a + 1)", columns=["a"])
    compile_expression("round(a, 2)", columns=["a"])  # literal scale ok


def test_recode(spark):
    df = spark.createDataFrame([("M",), ("F",), ("?",)], ["sex"])
    out = [r.r for r in df.select(
        recode("sex", {"M": "male", "F": "female"}).alias("r")).collect()]
    assert out == ["male", "female", None]


def test_literal_fold_interm_overflow_and_range(spark):
    from dataqualitycontroltool_spark.functions import compile_expression
    from dataqualitycontroltool_spark.functions.mapping_expr import ExpressionError
    import pytest as pt

    # intermediate exceeds int64 but the final folded value fits: must
    # compile and evaluate exactly (folding is arbitrary-precision Python)
    got = spark.range(1).select(
        compile_expression("4000000000 * 4000000000 / 4000000000").alias("r")
    ).collect()[0].r
    assert got == 4000000000.0
    # a FINAL literal out of int64 range is a clean ExpressionError
    with pt.raises(ExpressionError, match="out of range"):
        compile_expression("4000000000 * 4000000000")
