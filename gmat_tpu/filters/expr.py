"""Tiny expression engine — the select-filter expression language.

Covers the subset of FFmpeg's av_expr used by GMAT's select_cuda filter
(vf_select_cuda.c:53-100 var_names: n, t, pts, key, scene, prev_selected_n,
selected_n ...; doc usage `select_cuda='gt(scene,0.4)'`, FrameSelect.h:12).

Recursive-descent parser -> AST of Python closures; evaluation is per-frame
on host scalars (the heavy part — scene scores — is computed on device in
batches by ops/scene.py).
"""
from __future__ import annotations

import math
import re
from typing import Callable, Dict

Num = float
Env = Dict[str, float]

# numbers: decimals with optional exponent, then an optional av_strtod
# unit suffix (k/M/G/T..., 'i' = binary, trailing 'B' = bytes -> x8)
_TOKEN = re.compile(
    r"\s*(?:((?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?"
    r"(?:[yzafpnumcdhkKMGTPEZY]i?B?|B)?)|([A-Za-z_]\w*)|(.))")

_SUFFIX = {"y": 1e-24, "z": 1e-21, "a": 1e-18, "f": 1e-15, "p": 1e-12,
           "n": 1e-9, "u": 1e-6, "m": 1e-3, "c": 1e-2, "d": 1e-1,
           "h": 1e2, "k": 1e3, "K": 1e3, "M": 1e6, "G": 1e9, "T": 1e12,
           "P": 1e15, "E": 1e18, "Z": 1e21, "Y": 1e24}
_SUFFIX_I = {"k": 2.0 ** 10, "K": 2.0 ** 10, "M": 2.0 ** 20,
             "G": 2.0 ** 30, "T": 2.0 ** 40, "P": 2.0 ** 50,
             "E": 2.0 ** 60, "Z": 2.0 ** 70, "Y": 2.0 ** 80}


def _parse_number(tok: str) -> float:
    """av_strtod semantics: value, optional SI suffix, optional 'i'
    (binary prefix), optional 'B' (bytes: x8)."""
    mult = 1.0
    if tok.endswith("B"):
        tok = tok[:-1]
        mult *= 8.0
    if tok.endswith("i"):
        suf = tok[-2] if len(tok) >= 2 else ""
        if suf in _SUFFIX_I:
            mult *= _SUFFIX_I[suf]
            tok = tok[:-2]
        else:
            raise ValueError(f"bad binary suffix in number {tok!r}")
    elif tok and tok[-1] in _SUFFIX and not tok[-1].isdigit():
        mult *= _SUFFIX[tok[-1]]
        tok = tok[:-1]
    return float(tok) * mult

_NAN = float("nan")
_INF = float("inf")


def _div(a: float, b: float) -> float:
    # av_expr: d2 ? d/d2 : d*INFINITY (eval.c:320) — no exception, and
    # 0/0 becomes nan exactly like C
    return a / b if b else a * _INF


def _mod(a: float, b: float) -> float:
    # av_expr mod is floor-mod with the divisor's sign (eval.c:309:
    # d - floor(d/d2)*d2); mod(x, 0) is nan like C
    if b == 0 or math.isnan(a) or math.isnan(b) or math.isinf(a):
        return _NAN
    if math.isinf(b):
        return a if (a >= 0) == (b > 0) else _NAN
    return a - math.floor(a / b) * b


def _domain(f):
    """C math never raises: out-of-domain becomes nan (asin(2), pow of a
    negative base to a fractional power, log of a negative, ...)."""
    def g(*a):
        try:
            return f(*a)
        except (ValueError, OverflowError, ZeroDivisionError):
            return _NAN
    return g


_FUNCS = {
    "gt": lambda a, b: 1.0 if a > b else 0.0,
    "gte": lambda a, b: 1.0 if a >= b else 0.0,
    "lt": lambda a, b: 1.0 if a < b else 0.0,
    "lte": lambda a, b: 1.0 if a <= b else 0.0,
    "eq": lambda a, b: 1.0 if a == b else 0.0,
    "ne": lambda a, b: 1.0 if a != b else 0.0,
    "not": lambda a: 1.0 if a == 0 else 0.0,
    # NOTE: if/ifnot/and/or are handled as LAZY special forms in
    # _parse_atom (av_expr e_if semantics: the untaken branch is never
    # evaluated); entries here only serve arity-0 lookups
    "min": min,
    "max": max,
    "abs": abs,
    # C floor/ceil/round pass nan/inf through; math.floor raises — wrap
    "floor": lambda a: a if math.isnan(a) or math.isinf(a) \
        else float(math.floor(a)),
    "ceil": lambda a: a if math.isnan(a) or math.isinf(a) \
        else float(math.ceil(a)),
    # av_expr round is C round(): half AWAY from zero, not banker's
    "round": lambda a: a if math.isnan(a) or math.isinf(a) \
        else float(math.floor(a + 0.5) if a >= 0 else math.ceil(a - 0.5)),
    "mod": _mod,
    "between": lambda x, lo, hi: 1.0 if lo <= x <= hi else 0.0,
    "isnan": lambda a: 1.0 if math.isnan(a) else 0.0,
    # av_expr math set (animated overlay positions etc.)
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "atan": math.atan,
    "atan2": math.atan2,
    "asin": _domain(math.asin),
    "acos": _domain(math.acos),
    "exp": _domain(math.exp),
    "log": lambda a: math.log(a) if a > 0 else (-_INF if a == 0 else _NAN),
    "sqrt": lambda a: math.sqrt(a) if a >= 0 else _NAN,
    "pow": _domain(math.pow),
    "trunc": lambda a: a if math.isnan(a) or math.isinf(a) \
        else float(math.trunc(a)),
    "sgn": lambda a: (a > 0) - (a < 0),
    "clip": lambda x, lo, hi: min(max(x, lo), hi),
    "hypot": math.hypot,
    "gauss": lambda x: math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.pi),
}

_LAZY = {"if", "ifnot", "and", "or"}

# av_expr named constants (eval-time fallback: env vars shadow them)
_CONSTS = {"PI": math.pi, "E": math.e, "PHI": (1.0 + math.sqrt(5.0)) / 2.0}


class Expr:
    def __init__(self, text: str):
        self.text = text
        self._tokens = self._tokenize(text)
        self._pos = 0
        self._ast = self._parse_add()
        if self._pos < len(self._tokens):
            raise ValueError(f"trailing input in expr {text!r} at "
                             f"{self._tokens[self._pos]}")

    @staticmethod
    def _tokenize(text):
        out = []
        for m in _TOKEN.finditer(text):
            num, name, sym = m.groups()
            if num is not None:
                out.append(("num", _parse_number(num)))
            elif name is not None:
                out.append(("name", name))
            elif sym and not sym.isspace():
                out.append(("sym", sym))
        return out

    def _peek(self):
        return self._tokens[self._pos] if self._pos < len(self._tokens) else (None, None)

    def _next(self):
        t = self._peek()
        self._pos += 1
        return t

    def _expect(self, sym):
        k, v = self._next()
        if k != "sym" or v != sym:
            raise ValueError(f"expected {sym!r} in {self.text!r}, got {v!r}")

    def _parse_add(self):
        node = self._parse_mul()
        while self._peek() == ("sym", "+") or self._peek() == ("sym", "-"):
            _, op = self._next()
            rhs = self._parse_mul()
            node = (lambda l, r, o=op: (lambda env: l(env) + r(env) if o == "+"
                                        else l(env) - r(env)))(node, rhs)
        return node

    def _parse_mul(self):
        node = self._parse_unary()
        while self._peek() in (("sym", "*"), ("sym", "/")):
            _, op = self._next()
            rhs = self._parse_unary()
            node = (lambda l, r, o=op: (lambda env: l(env) * r(env) if o == "*"
                                        else _div(l(env), r(env))))(node, rhs)
        return node

    def _parse_unary(self):
        if self._peek() == ("sym", "-"):
            self._next()
            inner = self._parse_unary()
            return lambda env: -inner(env)
        if self._peek() == ("sym", "+"):
            self._next()
            return self._parse_unary()
        return self._parse_atom()

    def _parse_atom(self):
        kind, val = self._next()
        if kind == "num":
            return lambda env, v=val: v
        if kind == "name":
            if self._peek() == ("sym", "("):
                self._next()
                args = []
                if self._peek() != ("sym", ")"):
                    args.append(self._parse_add())
                    while self._peek() == ("sym", ","):
                        self._next()
                        args.append(self._parse_add())
                self._expect(")")
                if val in _LAZY:       # av_expr e_if: lazy branches
                    return self._lazy_form(val, args)
                if val not in _FUNCS:
                    raise ValueError(f"unknown function {val!r} in {self.text!r}")
                f = _FUNCS[val]
                return lambda env, f=f, args=args: float(f(*[a(env) for a in args]))
            name = val

            def var(env, n=name, text=self.text):
                if n in env:
                    return float(env[n])
                if n in _CONSTS:
                    return _CONSTS[n]
                raise ValueError(f"unknown variable {n!r} in expression "
                                 f"{text!r}")
            return var
        if kind == "sym" and val == "(":
            node = self._parse_add()
            self._expect(")")
            return node
        raise ValueError(f"unexpected token {val!r} in {self.text!r}")

    def _lazy_form(self, name, args):
        """if/ifnot/and/or with av_expr's lazy evaluation: the untaken
        branch never runs (so `if(gt(t,0), 1/t, 0)` is safe at t==0)."""
        if name in ("if", "ifnot"):
            if not 2 <= len(args) <= 3:
                raise ValueError(f"{name}() takes 2-3 args in {self.text!r}")
            c, a = args[0], args[1]
            b = args[2] if len(args) == 3 else None
            inv = name == "ifnot"

            def f(env, c=c, a=a, b=b, inv=inv):
                taken = (c(env) == 0) if inv else (c(env) != 0)
                if taken:
                    return float(a(env))
                return float(b(env)) if b is not None else 0.0
            return f
        if len(args) != 2:
            raise ValueError(f"{name}() takes 2 args in {self.text!r}")
        l, r = args
        if name == "and":
            return lambda env: 1.0 if (l(env) != 0 and r(env) != 0) else 0.0
        return lambda env: 1.0 if (l(env) != 0 or r(env) != 0) else 0.0

    def __call__(self, env: Env) -> float:
        return self._ast(env)


def compile_expr(text: str) -> Callable[[Env], float]:
    return Expr(text)
