"""Axis permutation/negation.

Reference: src/conversions/axisswap.cpp:76-308 (+order / +axis parsing
187-255, fwd/inv at all arities 76-166).  Pure column select/negate.
"""

from __future__ import annotations

import numpy as np

from proj_4_spark.kernels.base import PJ, ProjError, UNITS_RADIANS


def _fwd(v, axis, sign, n):
    out = list(v)
    for i in range(n):
        out[i] = v[axis[i]] * sign[i]
    return tuple(out)


def _inv(v, axis, sign, n):
    out = list(v)
    for i in range(n):
        out[axis[i]] = v[i] * sign[i]
    return tuple(out)


def setup_axisswap(P: PJ) -> PJ:
    """axisswap.cpp:166-308."""
    has_order = P.has("order")
    has_axis = P.has("axis")
    if has_order == has_axis:
        raise ProjError("axis", "+order and +axis are mutually exclusive")

    axis = [4, 5, 6, 7]
    sign = [1, 1, 1, 1]
    n = 0

    if has_order:
        order = str(P.params["order"])
        for ch in order:
            if ch not in "1234-,":
                raise ProjError("axis", f"unknown axis {ch!r}")
        for tok in order.split(","):
            if n >= 4 or not tok:
                break
            val = int(tok)
            idx = abs(val) - 1
            if idx > 3:
                raise ProjError("axis", f"invalid axis {idx}")
            axis[n] = idx
            sign[n] = 1 if val > 0 else (-1 if val < 0 else 0)
            n += 1

    if has_axis:
        spec = str(P.params["axis"])
        if len(spec) != 3:
            raise ProjError("axis", "axis spec must have 3 characters")
        table = {
            "w": (0, -1), "e": (0, 1),
            "s": (1, -1), "n": (1, 1),
            "d": (2, -1), "u": (2, 1),
        }
        for i, ch in enumerate(spec):
            if ch not in table:
                raise ProjError("axis", f"unknown axis {ch!r}")
            axis[i], sign[i] = table[ch]
        n = 3

    for i in range(4):
        for j in range(4):
            if i != j and axis[i] == axis[j]:
                raise ProjError("axis", "duplicate axes specified")

    axis_t = tuple(axis)
    sign_t = tuple(sign)

    if n == 4:
        P.fwd4d = lambda a, b, c, d, _P: _fwd((a, b, c, d), axis_t, sign_t, 4)
        P.inv4d = lambda a, b, c, d, _P: _inv((a, b, c, d), axis_t, sign_t, 4)
    elif n == 3 and max(axis_t[:3]) < 3:
        def fwd3d(a, b, c, d, _P):
            out = _fwd((a, b, c), axis_t, sign_t, 3)
            return out[0], out[1], out[2], d

        def inv3d(a, b, c, d, _P):
            out = _inv((a, b, c), axis_t, sign_t, 3)
            return out[0], out[1], out[2], d

        P.fwd3d, P.inv3d = fwd3d, inv3d
    elif n == 2 and max(axis_t[:2]) < 2:
        def fwd2d(a, b, c, d, _P):
            out = _fwd((a, b), axis_t, sign_t, 2)
            return out[0], out[1], c, d

        def inv2d(a, b, c, d, _P):
            out = _inv((a, b), axis_t, sign_t, 2)
            return out[0], out[1], c, d

        P.fwd, P.inv = fwd2d, inv2d
    else:
        raise ProjError("axis", "bad axis order")

    if P.param_b("angularunits"):
        P.left = UNITS_RADIANS
        P.right = UNITS_RADIANS
    else:
        P.left = "whatever"
        P.right = "whatever"
    P.skip_fwd_prepare = True
    P.skip_fwd_finalize = True
    P.skip_inv_prepare = True
    P.skip_inv_finalize = True
    return P
