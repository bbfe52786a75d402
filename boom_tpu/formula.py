"""R-style model-formula parsing: design matrices from data frames.

The reference's R interface builds design matrices from model formulas
(`Interfaces/R/parse_model_formula.cpp`, and every BoomSpikeSlab/bsts
entry point takes `formula, data`). This module provides that surface
for boom_tpu without depending on R or patsy.

Supported grammar (the commonly used subset of R formulas):

    response ~ terms
    terms    := term (('+' | '-') term)*
    term     := '.'            all data columns except the response
              | '1' / '0'      intercept on / off  ('- 1' also works)
              | name           a data column (categoricals dummy-coded)
              | name ':' name  interaction (elementwise / dummy product)
              | name '*' name  main effects + interaction
              | func(expr)     numpy-evaluated transform, e.g. log(x),
                               I(x**2), sqrt(x + 1)

`data` may be a pandas DataFrame or a mapping of column name -> 1-D
array. String/categorical columns are dummy-coded (first level dropped
when an intercept is present, matching R's treatment contrasts).

Example:
    y, x, names = model_matrix("y ~ . - x3 + log(x1) + x1:x2", data)
"""

from __future__ import annotations

import ast
import re

import numpy as np

__all__ = ["model_matrix", "design_matrix", "parse_formula"]

_SAFE_FUNCS = {
    "log": np.log, "log1p": np.log1p, "exp": np.exp, "sqrt": np.sqrt,
    "abs": np.abs, "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "floor": np.floor, "ceil": np.ceil, "I": lambda x: x,
}


def _columns(data):
    if hasattr(data, "columns"):  # pandas DataFrame
        return list(data.columns)
    return list(data.keys())


def _get(data, name):
    col = data[name]
    return np.asarray(col)


def _is_categorical(col):
    if col.dtype.kind in "OUS":
        return True
    return bool(getattr(col.dtype, "name", "") == "category")


def _split_top(s, seps):
    """Split on top-level (non-parenthesized) occurrences of chars in
    `seps`, keeping the separators."""
    parts, depth, cur = [], 0, ""
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0 and ch in seps:
            parts.append(cur.strip())
            parts.append(ch)
            cur = ""
        else:
            cur += ch
    parts.append(cur.strip())
    return [p for p in parts if p != ""]


def parse_formula(formula):
    """Split a formula into (response, [(sign, term), ...])."""
    if "~" not in formula:
        raise ValueError(f"formula needs '~': {formula!r}")
    lhs, rhs = formula.split("~", 1)
    response = lhs.strip() or None
    tokens = _split_top(rhs.strip(), "+-")
    terms, sign = [], "+"
    for tok in tokens:
        if tok in "+-":
            sign = tok
        else:
            terms.append((sign, tok))
            sign = "+"
    return response, terms


def _encode_column(data, name, drop_first):
    """One data column -> (block [n, k], names)."""
    col = _get(data, name)
    if _is_categorical(col):
        levels = sorted(set(np.asarray(col, str).tolist()))
        use = levels[1:] if drop_first else levels
        svals = np.asarray(col, str)
        block = np.column_stack(
            [(svals == lv).astype(float) for lv in use]
        ) if use else np.zeros((len(col), 0))
        return block, [f"{name}.{lv}" for lv in use]
    return np.asarray(col, float)[:, None], [name]


_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.Call, ast.Name,
    ast.Constant, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Pow,
    ast.Mod, ast.FloorDiv, ast.USub, ast.UAdd, ast.Load,
)


def _validate_transform_ast(expr):
    """Restrict transform expressions to arithmetic on whitelisted names.

    A bare `eval` with empty __builtins__ is escapable through attribute
    chains (().__class__.__base__....), so formulas sourced from
    untrusted input would be arbitrary code execution (like R formulas /
    patsy, which have the same property). Parsing to an AST and
    whitelisting node types closes that: no attributes, subscripts,
    lambdas, comprehensions, or f-strings can appear."""
    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"formula transform {expr!r} contains a disallowed "
                f"construct ({type(node).__name__}); only arithmetic, "
                f"column names and {sorted(_SAFE_FUNCS)} are allowed")
        if isinstance(node, ast.Call) and (
                not isinstance(node.func, ast.Name)
                or node.func.id not in _SAFE_FUNCS):
            raise ValueError(
                f"formula transform {expr!r} calls a function outside "
                f"the whitelist {sorted(_SAFE_FUNCS)}")
    return tree


def _eval_term(data, expr):
    """Evaluate a transform term like log(x) / I(x**2) with numpy,
    restricted to a validated arithmetic AST (see
    _validate_transform_ast)."""
    tree = _validate_transform_ast(expr)
    names = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id not in _SAFE_FUNCS:
            col = _get(data, node.id)  # KeyError -> clear message below
            if _is_categorical(col):
                raise ValueError(
                    f"formula transform {expr!r} references the "
                    f"categorical column {node.id!r}; transforms apply "
                    "to numeric columns only (dummy-code it with a "
                    "plain term instead)")
            names[node.id] = np.asarray(col, float)
    val = eval(compile(tree, "<formula>", "eval"),
               {"__builtins__": {}}, {**_SAFE_FUNCS, **names})
    return np.asarray(val, float)[:, None], [expr]


def _term_block(data, term, response, intercept):
    """One term -> (block, names). Handles '.', ':', '*', transforms."""
    cols = _columns(data)
    if term == ".":
        blocks, names = [], []
        for c in cols:
            if c == response:
                continue
            b, nm = _encode_column(data, c, drop_first=intercept)
            blocks.append(b)
            names.extend(nm)
        return (np.column_stack(blocks) if blocks
                else np.zeros((_n(data), 0))), names
    if "*" in term and "(" not in term:
        a, b = (t.strip() for t in term.split("*", 1))
        blocks, names = [], []
        for sub in (a, b, f"{a}:{b}"):
            blk, nm = _term_block(data, sub, response, intercept)
            blocks.append(blk)
            names.extend(nm)
        return np.column_stack(blocks), names
    if ":" in term and "(" not in term:
        parts = [t.strip() for t in term.split(":")]
        block, names = _encode_column(data, parts[0], drop_first=intercept)
        for p in parts[1:]:
            b2, n2 = _encode_column(data, p, drop_first=intercept)
            block = np.einsum("ni,nj->nij", block, b2).reshape(
                block.shape[0], -1)
            names = [f"{x}:{y}" for x in names for y in n2]
        return block, names
    if "(" in term:
        return _eval_term(data, term)
    if term in cols:
        return _encode_column(data, term, drop_first=intercept)
    raise KeyError(f"unknown term {term!r}; columns: {cols}")


def _n(data):
    return len(_get(data, _columns(data)[0]))


def design_matrix(formula, data):
    """RHS only: returns (X [n, p], names). The formula may omit the
    response ('~ x1 + x2')."""
    response, terms = parse_formula(formula)
    intercept = True
    for sign, t in terms:
        if t in ("0", "1") or (sign == "-" and t == "1"):
            intercept = not (t == "0" or sign == "-")
    blocks, names = [], []
    dropped = set()
    for sign, t in terms:
        if t in ("0", "1"):
            continue
        if sign == "-":
            blk, nm = _term_block(data, t, response, intercept)
            dropped.update(nm)
            continue
        blk, nm = _term_block(data, t, response, intercept)
        for j, name in enumerate(nm):
            if name not in names:
                blocks.append(blk[:, j])
                names.append(name)
    keep = [i for i, nm in enumerate(names) if nm not in dropped]
    names = [names[i] for i in keep]
    cols = [blocks[i] for i in keep]
    if intercept:
        cols = [np.ones(_n(data))] + cols
        names = ["(Intercept)"] + names
    x = (np.column_stack(cols) if cols
         else np.zeros((_n(data), 0)))
    return x, names


def model_matrix(formula, data):
    """Full formula: returns (y [n], X [n, p], names)."""
    response, _ = parse_formula(formula)
    if response is None:
        raise ValueError("model_matrix needs a response; use "
                         "design_matrix for one-sided formulas")
    x, names = design_matrix(formula, data)
    if "(" in response:
        y, _ = _eval_term(data, response)
        y = y[:, 0]
    else:
        y = np.asarray(_get(data, response), float)
    return y, x, names
