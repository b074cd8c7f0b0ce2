"""Perlin noise builtin.

Reference: `noise.c` — classic Perlin 3D gradient noise with precomputed
permutation/gradient tables, deterministic (SURVEY.md §2.1) [unverified —
mount empty, SURVEY.md §0]. This is Ken Perlin's improved-noise (2002)
reference permutation table, which is the table classic implementations ship;
bit-level agreement with the reference requires the §8 verification pass once
the mount is populated.

Implemented with integer gathers (`take`) + fused elementwise math so the
whole grid evaluates as one vectorized XLA op sequence on both backends.
"""

from __future__ import annotations

from ..runtime.value import TupleValue
from ..typesys.tags import NIL
from ..utils.errors import MMTypeError
from .registry import builtin

# Ken Perlin's reference permutation (256 entries).
_PERM = [
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175,
    74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122,
    60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54,
    65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169,
    200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64,
    52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212,
    207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213,
    119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
    129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104,
    218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241,
    81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157,
    184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
    222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180,
]

import numpy as _np

_PERM_NP = _np.asarray(_PERM + _PERM, dtype=_np.int32)

# Two-level one-hot factorization of the 512-entry permutation for the MXU:
# p[i] == onehot(i >> 4) @ T2 @ onehot(i & 15) with T2 = p.reshape(32, 16).
# All values (0..255) and the 0/1 one-hots are exact in bfloat16, and each
# row of the product has exactly one nonzero term, so the contraction is
# BIT-EXACT vs the integer gather. On TPU this replaces 14 scalar-unit
# gathers per noise() call (~6 ns/element each => ~0.7 s/frame at 4K,
# measured: the whole Noise category ran at 2.1 Mpix/s) with two tiny
# matmul/mul-reduce stages that ride the MXU/VPU.
_PERM_T2 = _PERM_NP.reshape(32, 16)


def _perm_table(be):
    # No cross-call cache: a backend array created inside one jit trace must
    # not leak into another (UnexpectedTracerError); asarray of a host
    # constant is free at trace time.
    return be.asarray(_PERM_NP)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _grad(be, h, x, y, z):
    """Gradient dot-product for hash h (improved-noise 12-gradient set)."""
    h = h & 15
    u = be.where(h < 8, x, y)
    v = be.where(h < 4, y, be.where((h == 12) | (h == 14), x, z))
    return be.where((h & 1) == 0, u, -u) + be.where((h & 2) == 0, v, -v)


def perlin3(be, x, y, z):
    xf = be.floor(x)
    yf = be.floor(y)
    zf = be.floor(z)
    xi = xf.astype(be.int32) & 255
    yi = yf.astype(be.int32) & 255
    zi = zf.astype(be.int32) & 255
    x = x - xf
    y = y - yf
    z = z - zf
    u, v, w = _fade(x), _fade(y), _fade(z)

    if be is _np:
        p = _perm_table(be)  # gather table: numpy oracle path only

        def P(i):
            return be.take(p, i)
    else:
        # jax path: XLA's TPU gather is scalar-unit bound (~6 ns/element);
        # the two-level one-hot contraction is bit-exact (see _PERM_T2) and
        # keeps the lookup on the vector units. bf16 operands halve the
        # materialized one-hot traffic; the sum has exactly one nonzero
        # term so f32 accumulation reproduces the integer gather exactly.
        t2 = be.asarray(_PERM_T2.astype(_np.float32), dtype=be.bfloat16)
        k_hi = be.arange(32, dtype=be.int32)
        k_lo = be.arange(16, dtype=be.int32)

        def P(i):
            oh_hi = ((i[..., None] >> 4) == k_hi).astype(be.bfloat16)
            m1 = be.einsum("...k,kl->...l", oh_hi, t2,
                           preferred_element_type=be.float32)
            oh_lo = ((i[..., None] & 15) == k_lo).astype(be.float32)
            return (m1 * oh_lo).sum(-1).astype(be.int32)

    a = P(xi) + yi
    aa = P(a) + zi
    ab = P(a + 1) + zi
    b = P(xi + 1) + yi
    ba = P(b) + zi
    bb = P(b + 1) + zi

    def lerp(t, p0, p1):
        return p0 + t * (p1 - p0)

    n000 = _grad(be, P(aa), x, y, z)
    n100 = _grad(be, P(ba), x - 1.0, y, z)
    n010 = _grad(be, P(ab), x, y - 1.0, z)
    n110 = _grad(be, P(bb), x - 1.0, y - 1.0, z)
    n001 = _grad(be, P(aa + 1), x, y, z - 1.0)
    n101 = _grad(be, P(ba + 1), x - 1.0, y, z - 1.0)
    n011 = _grad(be, P(ab + 1), x, y - 1.0, z - 1.0)
    n111 = _grad(be, P(bb + 1), x - 1.0, y - 1.0, z - 1.0)

    return lerp(
        w,
        lerp(v, lerp(u, n000, n100), lerp(u, n010, n110)),
        lerp(v, lerp(u, n001, n101), lerp(u, n011, n111)),
    )


@builtin("noise")
def _noise(ev, args, span):
    if len(args) == 1:
        (v,) = args
        if v.is_opaque or v.length != 3:
            raise MMTypeError("'noise' expects a v3:/length-3 tuple or 3 scalars", span)
        x, y, z = v.arrays
    elif len(args) == 3:
        x, y, z = (a.scalar(span) for a in args)
    else:
        raise MMTypeError("'noise' expects 1 tuple or 3 scalar arguments", span)
    return TupleValue(NIL, (perlin3(ev.be, x, y, z),))
