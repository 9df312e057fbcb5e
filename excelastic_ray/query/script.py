"""A safe, arithmetic-only score-script language (ES ``script_score``)
plus its boolean extension (the ES ``script`` query, filter context).

ES evaluates Painless; this engine evaluates a restricted expression
grammar that covers the score-shaping subset users actually write in
``script_score`` / ``function_score.script`` (the elasticsearch docs'
own examples are all of this form): float arithmetic over ``_score``
and doc values, a few math functions, and script params.

Grammar (Python expression syntax, compiled via ``ast`` — never
``eval`` on raw input):

- names: ``_score``, ``dl``, ``turn_idx``, plus any key supplied in
  ``params`` (numbers only)
- operators: ``+ - * / **``, unary ``-``
- calls: ``ln`` / ``log`` (natural log), ``log10``, ``sqrt``, ``abs``,
  ``exp``, ``min``, ``max`` (two-arg, elementwise)
- numeric literals

``compile_filter_script`` (the ES ``script`` query) adds the boolean
layer on top: comparisons ``< <= > >= == !=`` between two arithmetic
expressions (no chaining — ``a < b < c`` is rejected so the grammar
stays unambiguous), combined with ``and`` / ``or`` / ``not``; the top
level must be boolean. Everything evaluates numpy-vectorized
elementwise, so a compiled filter is one mask per shard per query.

Everything else (attributes, subscripts, comprehensions, lambdas,
names outside the environment) raises ``ValueError`` at COMPILE time,
so a malformed script never reaches a shard. The compiled form is a
closure evaluating numpy-vectorized over the match set — one
expression evaluation per shard per query, no per-doc Python.
"""

from __future__ import annotations

import ast

import numpy as np

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.divide,
    ast.Pow: np.power,
}

_CALLS = {
    "ln": np.log,
    "log": np.log,
    "log10": np.log10,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "exp": np.exp,
    "min": np.minimum,
    "max": np.maximum,
}

_TWO_ARG = {"min", "max"}

_CMPOPS = {
    ast.Lt: np.less,
    ast.LtE: np.less_equal,
    ast.Gt: np.greater,
    ast.GtE: np.greater_equal,
    ast.Eq: np.equal,
    ast.NotEq: np.not_equal,
}


def _check_arith(node: ast.AST, names: set, what: str) -> None:
    """Validate an arithmetic subtree, collecting names."""
    if isinstance(node, ast.BinOp):
        if type(node.op) not in _BINOPS:
            raise ValueError(
                f"{what}: operator {type(node.op).__name__} "
                "is not supported"
            )
        _check_arith(node.left, names, what)
        _check_arith(node.right, names, what)
    elif isinstance(node, ast.UnaryOp):
        if not isinstance(node.op, (ast.USub, ast.UAdd)):
            raise ValueError(
                f"{what}: operator {type(node.op).__name__} "
                "is not supported"
            )
        _check_arith(node.operand, names, what)
    elif isinstance(node, ast.Call):
        if (
            not isinstance(node.func, ast.Name)
            or node.func.id not in _CALLS
            or node.keywords
        ):
            raise ValueError(
                f"{what}: only {sorted(_CALLS)} calls are supported"
            )
        want = 2 if node.func.id in _TWO_ARG else 1
        if len(node.args) != want:
            raise ValueError(
                f"{what}: {node.func.id} takes {want} "
                f"argument{'s' if want > 1 else ''}"
            )
        for a in node.args:
            _check_arith(a, names, what)
    elif isinstance(node, ast.Name):
        names.add(node.id)
    elif isinstance(node, ast.Constant):
        if not isinstance(node.value, (int, float)):
            raise ValueError(
                f"{what}: literal {node.value!r} is not numeric"
            )
    else:
        raise ValueError(
            f"{what}: {type(node).__name__} is not supported"
        )


def _eval_arith(node: ast.AST, env: dict, what: str):
    if isinstance(node, ast.BinOp):
        return _BINOPS[type(node.op)](
            _eval_arith(node.left, env, what),
            _eval_arith(node.right, env, what),
        )
    if isinstance(node, ast.UnaryOp):
        v = _eval_arith(node.operand, env, what)
        return -v if isinstance(node.op, ast.USub) else +v
    if isinstance(node, ast.Call):
        return _CALLS[node.func.id](
            *(_eval_arith(a, env, what) for a in node.args)
        )
    if isinstance(node, ast.Name):
        try:
            return env[node.id]
        except KeyError:
            raise ValueError(
                f"{what}: unknown name {node.id!r} (have {sorted(env)})"
            ) from None
    return np.float64(node.value)  # Constant, validated numeric


def compile_score_script(script: str):
    """→ ``fn(env: dict[str, float | np.ndarray]) -> np.ndarray``.

    Validates the whole tree up front and raises ``ValueError`` with
    the offending construct for anything outside the grammar."""
    what = "script_score"
    try:
        tree = ast.parse(script, mode="eval")
    except SyntaxError as e:
        raise ValueError(f"{what}: invalid expression: {e}") from None

    names: set[str] = set()
    _check_arith(tree.body, names, what)

    def fn(env: dict):
        return _eval_arith(tree.body, env, what)

    fn.names = frozenset(names)
    return fn


def compile_filter_script(script: str):
    """ES ``script`` query (filter context) → ``fn(env) -> bool
    ndarray``. The top level must be BOOLEAN: a comparison of two
    arithmetic expressions, or ``and``/``or``/``not`` over such.
    Chained comparisons are rejected (write ``a < b and b < c``)."""
    what = "script query"
    try:
        tree = ast.parse(script, mode="eval")
    except SyntaxError as e:
        raise ValueError(f"{what}: invalid expression: {e}") from None

    names: set[str] = set()

    def check_bool(node: ast.AST) -> None:
        if isinstance(node, ast.BoolOp):
            for v in node.values:
                check_bool(v)
        elif isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            check_bool(node.operand)
        elif isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise ValueError(
                    f"{what}: chained comparisons are not supported — "
                    "write 'a < b and b < c'"
                )
            if type(node.ops[0]) not in _CMPOPS:
                raise ValueError(
                    f"{what}: comparator "
                    f"{type(node.ops[0]).__name__} is not supported"
                )
            _check_arith(node.left, names, what)
            _check_arith(node.comparators[0], names, what)
        else:
            raise ValueError(
                f"{what}: the expression must be boolean (a comparison "
                "or and/or/not over comparisons); got "
                f"{type(node).__name__}"
            )

    check_bool(tree.body)

    def eval_bool(node: ast.AST, env: dict):
        if isinstance(node, ast.BoolOp):
            vals = [eval_bool(v, env) for v in node.values]
            op = (np.logical_and if isinstance(node.op, ast.And)
                  else np.logical_or)
            out = vals[0]
            for v in vals[1:]:
                out = op(out, v)
            return out
        if isinstance(node, ast.UnaryOp):  # validated: Not
            return np.logical_not(eval_bool(node.operand, env))
        return _CMPOPS[type(node.ops[0])](
            _eval_arith(node.left, env, what),
            _eval_arith(node.comparators[0], env, what),
        )

    def fn(env: dict):
        return np.asarray(eval_bool(tree.body, env), dtype=bool)

    fn.names = frozenset(names)
    return fn
