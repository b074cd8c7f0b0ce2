"""Builtin op table — importing this package populates the registry.

Import order matters: later modules re-register overload-aware versions of
earlier elementwise ops (complex dispatch for exp/sqrt/sin/cos/tan/log, the
reference's overload.c behavior).
"""

from . import math_ops  # noqa: F401  (arithmetic, trig, logic)
from . import color_ops  # noqa: F401  (colors, HSVA, toXY/toRA, curves)
from . import complex_ops  # noqa: F401  (ri: algebra + overload dispatch)
from . import vector_ops  # noqa: F401  (vectors, matrices, quats)
from . import special_ops  # noqa: F401  (gamma/beta/elliptic/jacobi)
from . import noise  # noqa: F401  (Perlin)
from . import image_ops  # noqa: F401  (origVal family)
from . import native_ops  # noqa: F401  (native fast-path: gaussian blur)
from .registry import BUILTINS, is_builtin, lookup  # noqa: F401

# ri: ^ overload: z^w as exp(w * log z) (GSL complex pow in the reference).
from ..runtime.value import TupleValue as _TV
from .registry import builtin as _builtin, broadcast_pair as _bp, need_args as _na, result_tag as _rt


@_builtin("__pow", "pow")  # the named `pow` builtin gets the SAME
# complex overload as the `^` operator (review r3: pow(z, w) on ri:
# operands silently computed elementwise (re^re, im^im))
def _pow_dispatch(ev, args, span):
    a, b = _na(args, 2, "^", span)
    if a.tag == "ri" or b.tag == "ri":
        from . import complex_ops as _c

        def as_ri(v):
            if v.tag == "ri":
                return v
            s = v.scalar(span)
            return _TV("ri", (s, ev.be.zeros_like(s)))

        return _c.c_pow(ev, as_ri(a), as_ri(b))
    pairs = _bp(a, b, span, "^")
    return _TV(_rt(a, b), tuple(ev.be.power(x, y) for x, y in pairs))
