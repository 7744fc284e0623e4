"""Helmert 3/4/6/7/14-parameter similarity transform (+ Molodensky-Badekas).

Reference: src/transformations/helmert.cpp — fwd3d 363-399, inv3d 403-436,
4D time-dependent rebuild 439-472, parameter propagation update_parameters
106-159, rotation matrix (exact & small-angle, position_vector vs
coordinate_frame) build_rot_matrix 162-317, setup 478-747.

Time-dependence is vectorized by grouping on distinct t (the C caches the
rotation matrix and rebuilds when t changes, helmert.cpp:442-449; we compute
one matrix per distinct epoch in the batch and apply with masks).
"""

from __future__ import annotations

import math

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import (
    PJ,
    ProjError,
    UNITS_CARTESIAN,
    UNITS_PROJECTED,
)


def _build_rot_matrix(o, p, k, exact: bool, is_position_vector: bool):
    """helmert.cpp:162-317.  Returns a 3x3 nested tuple."""
    f, t_, p_ = o, p, k
    if exact:
        cf, sf = math.cos(f), math.sin(f)
        ct, st = math.cos(t_), math.sin(t_)
        cp, sp = math.cos(p_), math.sin(p_)
        R = [
            [ct * cp, cf * sp + sf * st * cp, sf * sp - cf * st * cp],
            [-ct * sp, cf * cp - sf * st * sp, sf * cp + cf * st * sp],
            [st, -sf * ct, cf * ct],
        ]
    else:
        R = [
            [1.0, p_, -t_],
            [-p_, 1.0, f],
            [t_, -f, 1.0],
        ]
    if is_position_vector:
        R[0][1], R[1][0] = R[1][0], R[0][1]
        R[0][2], R[2][0] = R[2][0], R[0][2]
        R[1][2], R[2][1] = R[2][1], R[1][2]
    return R


def _params_at(Q: dict, t_obs: float):
    """update_parameters; helmert.cpp:106-159."""
    dt = t_obs - Q["t_epoch"]
    xyz = tuple(Q["xyz_0"][i] + Q["dxyz"][i] * dt for i in range(3))
    opk = tuple(Q["opk_0"][i] + Q["dopk"][i] * dt for i in range(3))
    scale = Q["scale_0"] + Q["dscale"] * dt
    theta = Q["theta_0"] + Q["dtheta"] * dt
    R = _build_rot_matrix(opk[0], opk[1], opk[2], Q["exact"], Q["is_position_vector"])
    return xyz, scale, theta, R


def _fwd3d_with(x, y, z, Q, xyz, scale_ppm, R):
    """helmert.cpp:363-399."""
    if Q["no_rotation"] and scale_ppm == 0:
        return x + xyz[0], y + xyz[1], z + xyz[2]
    scale = 1 + scale_ppm * 1e-6
    X = x - Q["refp"][0]
    Y = y - Q["refp"][1]
    Z = z - Q["refp"][2]
    ox = scale * (R[0][0] * X + R[0][1] * Y + R[0][2] * Z) + xyz[0]
    oy = scale * (R[1][0] * X + R[1][1] * Y + R[1][2] * Z) + xyz[1]
    oz = scale * (R[2][0] * X + R[2][1] * Y + R[2][2] * Z) + xyz[2]
    return ox, oy, oz


def _inv3d_with(x, y, z, Q, xyz, scale_ppm, R):
    """helmert.cpp:403-436 (transpose multiplication)."""
    if Q["no_rotation"] and scale_ppm == 0:
        return x - xyz[0], y - xyz[1], z - xyz[2]
    scale = 1 + scale_ppm * 1e-6
    X = (x - xyz[0]) / scale
    Y = (y - xyz[1]) / scale
    Z = (z - xyz[2]) / scale
    ox = (R[0][0] * X + R[1][0] * Y + R[2][0] * Z) + Q["refp"][0]
    oy = (R[0][1] * X + R[1][1] * Y + R[2][1] * Z) + Q["refp"][1]
    oz = (R[0][2] * X + R[1][2] * Y + R[2][2] * Z) + Q["refp"][2]
    return ox, oy, oz


def _fwd2d_with(x, y, Q, theta, scale):
    """4-parameter planar transform; helmert.cpp:323-339."""
    cr = math.cos(theta) * scale
    sr = math.sin(theta) * scale
    ox = cr * x + sr * y + Q["xyz_0"][0]
    oy = -sr * x + cr * y + Q["xyz_0"][1]
    return ox, oy


def _inv2d_with(x, y, Q, theta, scale):
    """helmert.cpp:343-359."""
    cr = math.cos(theta) / scale
    sr = math.sin(theta) / scale
    xx = x - Q["xyz_0"][0]
    yy = y - Q["xyz_0"][1]
    ox = xx * cr - yy * sr
    oy = xx * sr + yy * cr
    return ox, oy


def _apply_4d(x, y, z, t, P: PJ, direction: str):
    """Time-grouped application; helmert.cpp:439-472.

    One parameter set + rotation matrix per distinct observation epoch in
    the batch — the vectorized analogue of the C's rebuild-if-t-changed
    cache (helmert.cpp:442-449).
    """
    Q = P.opaque
    t = np.asarray(t, dtype=np.float64)
    # HUGE_VAL t means "use epoch" (helmert.cpp:444); we use NaN
    t_eff = np.where(np.isnan(t), Q["t_epoch"], t)
    is_static = (
        Q["dxyz"] == (0.0, 0.0, 0.0)
        and Q["dopk"] == (0.0, 0.0, 0.0)
        and Q["dscale"] == 0.0
        and Q["dtheta"] == 0.0
    )
    ox = np.empty_like(np.asarray(x, dtype=np.float64))
    oy = np.empty_like(ox)
    oz = np.empty_like(ox)

    if Q["fourparam"]:
        epochs = [0.0] if is_static else np.unique(t_eff)
        for ep in np.atleast_1d(epochs):
            m = slice(None) if is_static else (t_eff == ep)
            _, scale, theta, _ = _params_at(Q, float(ep))
            if direction == "fwd":
                rx, ry = _fwd2d_with(np.asarray(x)[m], np.asarray(y)[m], Q, theta, scale)
            else:
                rx, ry = _inv2d_with(np.asarray(x)[m], np.asarray(y)[m], Q, theta, scale)
            ox[m], oy[m] = rx, ry
            oz[m] = np.asarray(z)[m]
        return ox, oy, oz, t

    epochs = [Q["t_epoch"]] if is_static else np.unique(t_eff)
    for ep in np.atleast_1d(epochs):
        m = slice(None) if is_static else (t_eff == ep)
        xyz, scale, _, R = _params_at(Q, float(ep))
        if direction == "fwd":
            rx, ry, rz = _fwd3d_with(
                np.asarray(x, dtype=np.float64)[m],
                np.asarray(y, dtype=np.float64)[m],
                np.asarray(z, dtype=np.float64)[m], Q, xyz, scale, R)
        else:
            rx, ry, rz = _inv3d_with(
                np.asarray(x, dtype=np.float64)[m],
                np.asarray(y, dtype=np.float64)[m],
                np.asarray(z, dtype=np.float64)[m], Q, xyz, scale, R)
        ox[m], oy[m], oz[m] = rx, ry, rz
    return ox, oy, oz, t


def helmert_fwd4d(x, y, z, t, P: PJ):
    return _apply_4d(x, y, z, t, P, "fwd")


def helmert_inv4d(x, y, z, t, P: PJ):
    return _apply_4d(x, y, z, t, P, "inv")


def _parse_towgs84(P: PJ, Q: dict) -> None:
    """+towgs84=dx,dy,dz[,rx,ry,rz,s] — pj_datum_set semantics
    (src/datum_set.cpp): rotations arcsec (position_vector), scale ppm."""
    vals = [float(v) for v in str(P.params["towgs84"]).split(",")]
    while len(vals) < 7:
        vals.append(0.0)
    Q["xyz_0"] = (vals[0], vals[1], vals[2])
    Q["opk_0"] = (
        vals[3] * C.ARCSEC_TO_RAD,
        vals[4] * C.ARCSEC_TO_RAD,
        vals[5] * C.ARCSEC_TO_RAD,
    )
    Q["scale_0"] = vals[6]
    Q["is_position_vector"] = True


def setup_helmert(P: PJ) -> PJ:
    """helmert.cpp:555-685."""
    Q: dict = {
        "xyz_0": (P.param_f("x"), P.param_f("y"), P.param_f("z")),
        "opk_0": (
            P.param_f("rx") * C.ARCSEC_TO_RAD,
            P.param_f("ry") * C.ARCSEC_TO_RAD,
            P.param_f("rz") * C.ARCSEC_TO_RAD,
        ),
        "dxyz": (P.param_f("dx"), P.param_f("dy"), P.param_f("dz")),
        "dopk": (
            P.param_f("drx") * C.ARCSEC_TO_RAD,
            P.param_f("dry") * C.ARCSEC_TO_RAD,
            P.param_f("drz") * C.ARCSEC_TO_RAD,
        ),
        "scale_0": 0.0,
        "dscale": P.param_f("ds"),
        "theta_0": 0.0,
        "dtheta": P.param_f("dtheta") * C.ARCSEC_TO_RAD,
        "t_epoch": P.param_f("t_epoch"),
        "refp": (0.0, 0.0, 0.0),
        "exact": P.param_b("exact"),
        "fourparam": False,
        "is_position_vector": False,
    }
    P.left = UNITS_CARTESIAN
    P.right = UNITS_CARTESIAN

    if P.has("towgs84"):
        _parse_towgs84(P, Q)

    if P.has("theta"):
        Q["theta_0"] = P.param_f("theta") * C.ARCSEC_TO_RAD
        Q["fourparam"] = True
        Q["scale_0"] = 1.0
        P.left = UNITS_PROJECTED
        P.right = UNITS_PROJECTED

    if P.has("s"):
        Q["scale_0"] = P.param_f("s")
        if Q["scale_0"] <= -1.0e6:
            raise ProjError("invalid_scale")
        if P.has("theta") and Q["scale_0"] == 0.0:
            raise ProjError("invalid_scale")

    Q["no_rotation"] = Q["opk_0"] == (0.0, 0.0, 0.0) and Q["dopk"] == (0.0, 0.0, 0.0)

    if not Q["no_rotation"]:
        conv = P.params.get("convention")
        if P.has("towgs84"):
            if conv not in (None, "position_vector"):
                raise ProjError("invalid_arg", "towgs84 requires position_vector")
        elif conv == "position_vector":
            Q["is_position_vector"] = True
        elif conv == "coordinate_frame":
            Q["is_position_vector"] = False
        else:
            raise ProjError("missing_args", "helmert: missing 'convention'")

    P.opaque.update(Q)
    P.fwd4d = helmert_fwd4d
    P.inv4d = helmert_inv4d
    return P


def setup_molobadekas(P: PJ) -> PJ:
    """Molodensky-Badekas (rotation about a reference point);
    helmert.cpp:689-747."""
    Q: dict = {
        "xyz_0": (P.param_f("x"), P.param_f("y"), P.param_f("z")),
        "opk_0": (
            P.param_f("rx") * C.ARCSEC_TO_RAD,
            P.param_f("ry") * C.ARCSEC_TO_RAD,
            P.param_f("rz") * C.ARCSEC_TO_RAD,
        ),
        "dxyz": (0.0, 0.0, 0.0),
        "dopk": (0.0, 0.0, 0.0),
        "scale_0": P.param_f("s"),
        "dscale": 0.0,
        "theta_0": 0.0,
        "dtheta": 0.0,
        "t_epoch": 0.0,
        "exact": P.param_b("exact"),
        "fourparam": False,
        "is_position_vector": False,
        "no_rotation": False,
    }
    conv = P.params.get("convention")
    if conv == "position_vector":
        Q["is_position_vector"] = True
    elif conv == "coordinate_frame":
        Q["is_position_vector"] = False
    else:
        raise ProjError("missing_args", "molobadekas: missing 'convention'")

    refp = (P.param_f("px"), P.param_f("py"), P.param_f("pz"))
    Q["refp"] = refp
    # incorporate refp into the translation (helmert.cpp:738-743)
    Q["xyz_0"] = (Q["xyz_0"][0] + refp[0], Q["xyz_0"][1] + refp[1],
                  Q["xyz_0"][2] + refp[2])

    P.opaque.update(Q)
    P.left = UNITS_CARTESIAN
    P.right = UNITS_CARTESIAN
    P.fwd4d = helmert_fwd4d
    P.inv4d = helmert_inv4d
    return P
