"""Arithmetic, comparison, logical, trig/exp and misc scalar builtins.

Reference: the op table generated from `ops.lisp`/`builtins.lisp`
[unverified — mount empty, SURVEY.md §0]; op list per SURVEY.md §2.1.

Operator tokens are routed here as builtins named `__add`, `__mul`, ...;
`__mul` and `__div` perform tag dispatch for complex (`ri:`), matrix
(`m2x2:`/`m3x3:`), quaternion (`quat:`/`cquat:`) and hypercomplex (`hyper:`)
operands before falling back to elementwise semantics.
"""

from __future__ import annotations

from ..runtime.value import TupleValue
from ..typesys.tags import NIL
from ..utils.errors import MMTypeError
from .registry import (
    broadcast_pair,
    builtin,
    ew1,
    ew2,
    need_args,
    result_tag,
)

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _to_float(be, boolarr):
    return boolarr.astype(be.float32)


def _truthy(be, v: TupleValue, span):
    """MathMap condition: a length-1 tuple, true iff != 0."""
    if v.is_opaque or v.length != 1:
        raise MMTypeError("condition must be a single value", span)
    return v.arrays[0] != 0


# ---------------------------------------------------------------------------
# arithmetic operators
# ---------------------------------------------------------------------------

ew2("__add", lambda be, x, y: be.add(x, y))
ew2("__sub", lambda be, x, y: be.subtract(x, y))
# `%` uses floored-mod (sign of divisor) [unverified vs the reference's C
# fmod; floored mod is what wrap edge-behavior arithmetic needs].
ew2("__mod", lambda be, x, y: be.mod(x, y))
ew2("__pow", lambda be, x, y: be.power(x, y))


def _special_pair_kind(a: TupleValue, b: TupleValue) -> str | None:
    ta, tb = a.tag, b.tag
    if ta == "ri" and tb == "ri":
        return "complex"
    if ta == "quat" and tb == "quat":
        return "quat"
    if ta == "cquat" and tb == "cquat":
        return "cquat"
    if ta == "hyper" and tb == "hyper":
        return "hyper"
    if ta in ("m2x2", "m3x3") or tb in ("m2x2", "m3x3"):
        return "matrix"
    return None


@builtin("__mul")
def _mul(ev, args, span):
    a, b = need_args(args, 2, "*", span)
    kind = _special_pair_kind(a, b)
    if kind == "complex":
        from .complex_ops import c_mul

        return c_mul(ev, a, b)
    if kind in ("quat", "cquat", "hyper"):
        from .vector_ops import quat_mul

        return quat_mul(ev, a, b, kind)
    if kind == "matrix":
        from .vector_ops import matrix_mul

        return matrix_mul(ev, a, b, span)
    pairs = broadcast_pair(a, b, span, "*")
    return TupleValue(result_tag(a, b), tuple(ev.be.multiply(x, y) for x, y in pairs))


@builtin("__div")
def _div(ev, args, span):
    a, b = need_args(args, 2, "/", span)
    if b.tag == "ri":
        # complex division whenever the DENOMINATOR is complex — a scalar
        # numerator promotes (1/z is the complex reciprocal, not an
        # elementwise divide; review r3). z / scalar stays elementwise
        # below, which IS the complex scaling.
        from .complex_ops import c_div

        if a.tag == "ri":
            return c_div(ev, a, b)
        s = a.scalar(span)
        return c_div(ev, TupleValue("ri", (s, ev.be.zeros_like(s))), b)
    pairs = broadcast_pair(a, b, span, "/")
    return TupleValue(result_tag(a, b), tuple(ev.be.divide(x, y) for x, y in pairs))


@builtin("__neg")
def _neg(ev, args, span):
    (a,) = need_args(args, 1, "unary -", span)
    if a.is_opaque:
        raise MMTypeError(f"unary '-' not defined on {a.tag}", span)
    return TupleValue(a.tag, tuple(ev.be.negative(x) for x in a.arrays))


# ---------------------------------------------------------------------------
# comparisons (length-1 operands, 0/1 result) and logic
# ---------------------------------------------------------------------------

def _cmp(name, fn, any_comp=False):
    @builtin(name)
    def _op(ev, args, span, _fn=fn, _name=name, _any=any_comp):
        a, b = need_args(args, 2, _name, span)
        pairs = broadcast_pair(a, b, span, _name)
        if len(pairs) == 1:
            return TupleValue(NIL, (_to_float(ev.be, _fn(ev.be, *pairs[0])),))
        # Tuple comparison: all components must satisfy the relation
        # [unverified rule — equality on tuples is componentwise-AND] —
        # EXCEPT '!=', which must be the NEGATION of '==': true when ANY
        # component differs (De Morgan; review r3 — AND made partially-
        # differing tuples neither equal nor not-equal).
        acc = _fn(ev.be, *pairs[0])
        for x, y in pairs[1:]:
            acc = (acc | _fn(ev.be, x, y)) if _any else (acc & _fn(ev.be, x, y))
        return TupleValue(NIL, (_to_float(ev.be, acc),))


_cmp("__eq", lambda be, x, y: be.equal(x, y))
_cmp("__ne", lambda be, x, y: be.not_equal(x, y), any_comp=True)
_cmp("__lt", lambda be, x, y: be.less(x, y))
_cmp("__gt", lambda be, x, y: be.greater(x, y))
_cmp("__le", lambda be, x, y: be.less_equal(x, y))
_cmp("__ge", lambda be, x, y: be.greater_equal(x, y))


@builtin("__and")
def _and(ev, args, span):
    a, b = need_args(args, 2, "&&", span)
    return TupleValue(NIL, (_to_float(ev.be, _truthy(ev.be, a, span) & _truthy(ev.be, b, span)),))


@builtin("__or")
def _or(ev, args, span):
    a, b = need_args(args, 2, "||", span)
    return TupleValue(NIL, (_to_float(ev.be, _truthy(ev.be, a, span) | _truthy(ev.be, b, span)),))


@builtin("__xor")
def _xor(ev, args, span):
    a, b = need_args(args, 2, "xor", span)
    return TupleValue(NIL, (_to_float(ev.be, _truthy(ev.be, a, span) ^ _truthy(ev.be, b, span)),))


@builtin("__not")
def _not(ev, args, span):
    (a,) = need_args(args, 1, "!", span)
    return TupleValue(NIL, (_to_float(ev.be, ~_truthy(ev.be, a, span)),))


# ---------------------------------------------------------------------------
# trig / exp / log
# ---------------------------------------------------------------------------

ew1("sin", lambda be, x: be.sin(x))
ew1("cos", lambda be, x: be.cos(x))
ew1("tan", lambda be, x: be.tan(x))
ew1("asin", lambda be, x: be.arcsin(x))
ew1("acos", lambda be, x: be.arccos(x))
ew1("sinh", lambda be, x: be.sinh(x))
ew1("cosh", lambda be, x: be.cosh(x))
ew1("tanh", lambda be, x: be.tanh(x))
ew1("asinh", lambda be, x: be.arcsinh(x))
ew1("acosh", lambda be, x: be.arccosh(x))
ew1("atanh", lambda be, x: be.arctanh(x))
ew1("exp", lambda be, x: be.exp(x))
ew1("sqrt", lambda be, x: be.sqrt(x))
ew1("floor", lambda be, x: be.floor(x))
ew1("ceil", lambda be, x: be.ceil(x))
ew1("round", lambda be, x: be.round(x))
ew1("sign", lambda be, x: be.sign(x))
ew1("deg2rad", lambda be, x: x * (3.141592653589793 / 180.0))
ew1("rad2deg", lambda be, x: x * (180.0 / 3.141592653589793))


@builtin("log")
def _log(ev, args, span):
    # log(x) natural log; the complex overload lives in complex_ops and is
    # dispatched there when the argument is ri:.
    (a,) = need_args(args, 1, "log", span)
    if a.is_opaque:
        raise MMTypeError(f"'log' not defined on {a.tag}", span)
    if a.tag == "ri":
        from .complex_ops import c_log

        return c_log(ev, a)
    return TupleValue(a.tag, tuple(ev.be.log(x) for x in a.arrays))


@builtin("atan")
def _atan(ev, args, span):
    if len(args) == 1:
        (a,) = args
        if a.is_opaque:
            raise MMTypeError(f"'atan' not defined on {a.tag}", span)
        return TupleValue(a.tag, tuple(ev.be.arctan(x) for x in a.arrays))
    a, b = need_args(args, 2, "atan", span)
    pairs = broadcast_pair(a, b, span, "atan")
    return TupleValue(result_tag(a, b), tuple(ev.be.arctan2(x, y) for x, y in pairs))


ew2("atan2", lambda be, x, y: be.arctan2(x, y))
# NOTE: "pow" is registered by ops/__init__ as an alias of the
# complex-dispatching __pow (last-write-wins registry)


# ---------------------------------------------------------------------------
# min/max/clamp/lerp/misc
# ---------------------------------------------------------------------------

ew2("min", lambda be, x, y: be.minimum(x, y))
ew2("max", lambda be, x, y: be.maximum(x, y))


@builtin("clamp")
def _clamp(ev, args, span):
    a, lo, hi = need_args(args, 3, "clamp", span)
    lo_p = broadcast_pair(a, lo, span, "clamp")
    hi_p = broadcast_pair(a, hi, span, "clamp")
    if len(lo_p) != len(hi_p):
        # e.g. clamp(scalar, rgba, 1): zip() would silently TRUNCATE to
        # the shorter side (review r3) — broadcast the shorter one
        if len(lo_p) == 1:
            lo_p = lo_p * len(hi_p)
        elif len(hi_p) == 1:
            hi_p = hi_p * len(lo_p)
        else:
            raise MMTypeError(
                f"clamp: lo/hi lengths {len(lo_p)} vs {len(hi_p)} "
                f"don't broadcast", span)
    out = tuple(
        ev.be.minimum(ev.be.maximum(x, l), h)
        for (x, l), (_, h) in zip(lo_p, hi_p)
    )
    tag = a.tag if len(out) == len(a.arrays) else NIL
    return TupleValue(tag, out)


@builtin("lerp")
def _lerp(ev, args, span):
    # lerp(t, a, b) = a + t*(b-a)  [signature per SURVEY §2.1 op list]
    t, a, b = need_args(args, 3, "lerp", span)
    tt = t.scalar(span)
    pairs = broadcast_pair(a, b, span, "lerp")
    return TupleValue(result_tag(a, b), tuple(x + tt * (y - x) for x, y in pairs))


@builtin("scale")
def _scale(ev, args, span):
    # scale(v, from_lo, from_hi, to_lo, to_hi) — affine remap [unverified
    # signature]; also accepts scale(v, s) = v * s.
    if len(args) == 2:
        v, s = args
        ss = s.scalar(span)
        return TupleValue(v.tag, tuple(x * ss for x in v.arrays))
    v, a0, a1, b0, b1 = need_args(args, 5, "scale", span)
    a0s, a1s, b0s, b1s = (w.scalar(span) for w in (a0, a1, b0, b1))
    return TupleValue(
        v.tag, tuple(b0s + (x - a0s) * (b1s - b0s) / (a1s - a0s) for x in v.arrays)
    )


@builtin("inintv")
def _inintv(ev, args, span):
    x, lo, hi = need_args(args, 3, "inintv", span)
    xs, los, his = x.scalar(span), lo.scalar(span), hi.scalar(span)
    return TupleValue(NIL, (_to_float(ev.be, (xs >= los) & (xs <= his)),))


@builtin("abs")
def _abs(ev, args, span):
    (a,) = need_args(args, 1, "abs", span)
    if a.is_opaque:
        raise MMTypeError("'abs' not defined on opaque values", span)
    # Norm semantics for geometric/complex tags, elementwise otherwise
    # [unverified rule — SURVEY §2.1 lists vector 'abs'=norm and complex
    # modulus alongside scalar abs].
    if a.tag in ("ri", "v2", "v3", "quat", "cquat", "hyper", "xy"):
        be = ev.be
        acc = a.arrays[0] * a.arrays[0]
        for x in a.arrays[1:]:
            acc = acc + x * x
        return TupleValue(NIL, (be.sqrt(acc),))
    return TupleValue(a.tag, tuple(ev.be.abs(x) for x in a.arrays))


@builtin("rand")
def _rand(ev, args, span):
    lo, hi = need_args(args, 2, "rand", span)
    los, his = lo.scalar(span), hi.scalar(span)
    u = ev.rand_uniform()
    return TupleValue(NIL, (los + u * (his - los),))


# -- additional scalar utilities (log bases, C-style fmod, hypot, smoothstep)
ew1("log2", lambda be, x: be.log2(x))
ew1("log10", lambda be, x: be.log10(x))
ew1("exp2", lambda be, x: be.exp2(x))
# C fmod: sign follows the dividend (unlike '%', which is floored
# mod). be.fmod is the exact remainder — the x - trunc(x/y)*y form lost
# exactness for large quotients (review r3: fmod(1e8, 3) -> 4.0, not 1.0)
ew2("fmod", lambda be, x, y: be.fmod(x, y))
ew2("hypot", lambda be, x, y: be.sqrt(x * x + y * y))


@builtin("smoothstep")
def _smoothstep(ev, args, span):
    lo, hi, x = need_args(args, 3, "smoothstep", span)
    be = ev.be
    los, his, xs = lo.scalar(span), hi.scalar(span), x.scalar(span)
    t = be.clip((xs - los) / (his - los), 0.0, 1.0)
    return TupleValue(NIL, (t * t * (3.0 - 2.0 * t),))
