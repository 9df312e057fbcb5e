"""A safe, arithmetic-only score-script language (ES ``script_score``).

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


def compile_score_script(script: str):
    """→ ``fn(env: dict[str, float | np.ndarray]) -> np.ndarray``.

    Validates the whole tree up front and raises ``ValueError`` with
    the offending construct for anything outside the grammar."""
    try:
        tree = ast.parse(script, mode="eval")
    except SyntaxError as e:
        raise ValueError(f"script_score: invalid expression: {e}") from None

    names: set[str] = set()

    def check(node: ast.AST) -> None:
        if isinstance(node, ast.Expression):
            check(node.body)
        elif isinstance(node, ast.BinOp):
            if type(node.op) not in _BINOPS:
                raise ValueError(
                    f"script_score: operator {type(node.op).__name__} "
                    "is not supported"
                )
            check(node.left)
            check(node.right)
        elif isinstance(node, ast.UnaryOp):
            if not isinstance(node.op, (ast.USub, ast.UAdd)):
                raise ValueError(
                    f"script_score: operator {type(node.op).__name__} "
                    "is not supported"
                )
            check(node.operand)
        elif isinstance(node, ast.Call):
            if (
                not isinstance(node.func, ast.Name)
                or node.func.id not in _CALLS
                or node.keywords
            ):
                raise ValueError(
                    "script_score: only "
                    f"{sorted(_CALLS)} calls are supported"
                )
            want = 2 if node.func.id in _TWO_ARG else 1
            if len(node.args) != want:
                raise ValueError(
                    f"script_score: {node.func.id} takes {want} "
                    f"argument{'s' if want > 1 else ''}"
                )
            for a in node.args:
                check(a)
        elif isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError(
                    f"script_score: literal {node.value!r} is not numeric"
                )
        else:
            raise ValueError(
                f"script_score: {type(node).__name__} is not supported"
            )

    check(tree)

    def evaluate(node: ast.AST, env: dict):
        if isinstance(node, ast.Expression):
            return evaluate(node.body, env)
        if isinstance(node, ast.BinOp):
            return _BINOPS[type(node.op)](
                evaluate(node.left, env), evaluate(node.right, env)
            )
        if isinstance(node, ast.UnaryOp):
            v = evaluate(node.operand, env)
            return -v if isinstance(node.op, ast.USub) else +v
        if isinstance(node, ast.Call):
            return _CALLS[node.func.id](
                *(evaluate(a, env) for a in node.args)
            )
        if isinstance(node, ast.Name):
            try:
                return env[node.id]
            except KeyError:
                raise ValueError(
                    f"script_score: unknown name {node.id!r} "
                    f"(have {sorted(env)})"
                ) from None
        return np.float64(node.value)  # Constant, validated numeric

    def fn(env: dict):
        return evaluate(tree, env)

    fn.names = frozenset(names)
    return fn
