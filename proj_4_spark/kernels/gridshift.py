"""Horizontal/vertical grid-shift operators (vectorized).

The reference's only "join": point -> subgrid resolution (findGrid,
src/grids.cpp:3058-3074) + bilinear interpolation (pj_hgrid_interpolate,
src/grids.cpp:2875-2944) + fixed-point inverse (<=10 iterations @ 1e-12,
pj_hgrid_apply_internal, src/grids.cpp:2948-3054).

Vectorization: one NumPy gather per subgrid over the rows it owns
(SURVEY.md §1.3 "broadcast hash join against a raster").  Grid values
stay float32 until the bilinear combine (as the C's valueAt does).
"""

from __future__ import annotations

import numpy as np

from proj_4_spark.kernels import common as C
from proj_4_spark.kernels.base import PJ, ProjError, UNITS_RADIANS

_REL_TOL = 1e-5        # REL_TOLERANCE_HGRIDSHIFT, grids.cpp:2398
_MAX_ITER = 10         # grids.cpp:2948
_TOL = 1e-12           # grids.cpp:2949


def _interp_grid(tlam, tphi, grid):
    """pj_hgrid_interpolate over arrays; src/grids.cpp:2875-2944.

    tlam/tphi are offsets from the grid's SW corner (radians).
    Returns (dlam, dphi) with NaN where outside (beyond the +-1-cell
    edge tolerance).
    """
    gl = tlam / grid.resx
    gp = tphi / grid.resy
    ix = np.floor(gl)
    iy = np.floor(gp)
    ix = np.where(np.isnan(ix), 0.0, ix).astype(np.int64)
    iy = np.where(np.isnan(iy), 0.0, iy).astype(np.int64)
    fl = gl - ix
    fp = gp - iy

    bad = np.zeros(gl.shape, dtype=bool)
    tol = 10 * _REL_TOL

    # west edge: ix == -1 with frct close to 1 snaps in (grids.cpp:2890-2895)
    snap_w = (ix == -1) & (fl > 1 - tol)
    ix = np.where(snap_w, ix + 1, ix)
    fl = np.where(snap_w, 0.0, fl)
    bad |= ix < 0
    # east edge (grids.cpp:2896-2902)
    snap_e = (ix + 1 == grid.width) & (fl < tol)
    ix = np.where(snap_e, ix - 1, ix)
    fl = np.where(snap_e, 1.0, fl)
    bad |= ix + 1 >= grid.width
    # south edge
    snap_s = (iy == -1) & (fp > 1 - tol)
    iy = np.where(snap_s, iy + 1, iy)
    fp = np.where(snap_s, 0.0, fp)
    bad |= iy < 0
    # north edge
    snap_n = (iy + 1 == grid.height) & (fp < tol)
    iy = np.where(snap_n, iy - 1, iy)
    fp = np.where(snap_n, 1.0, fp)
    bad |= iy + 1 >= grid.height

    ixs = np.clip(ix, 0, grid.width - 2)
    iys = np.clip(iy, 0, grid.height - 2)
    f00lon = grid.lon_shift[iys, ixs]
    f00lat = grid.lat_shift[iys, ixs]
    f10lon = grid.lon_shift[iys, ixs + 1]
    f10lat = grid.lat_shift[iys, ixs + 1]
    f01lon = grid.lon_shift[iys + 1, ixs]
    f01lat = grid.lat_shift[iys + 1, ixs]
    f11lon = grid.lon_shift[iys + 1, ixs + 1]
    f11lat = grid.lat_shift[iys + 1, ixs + 1]

    # weights exactly as grids.cpp:2932-2940
    m10 = fl
    m11 = m10.copy()
    m01 = 1.0 - fl
    m00 = m01.copy()
    m11 = m11 * fp
    m01 = m01 * fp
    fp1 = 1.0 - fp
    m00 = m00 * fp1
    m10 = m10 * fp1
    dlam = m00 * f00lon + m10 * f10lon + m01 * f01lon + m11 * f11lon
    dphi = m00 * f00lat + m10 * f10lat + m01 * f01lat + m11 * f11lat
    dlam = np.where(bad, np.nan, dlam)
    dphi = np.where(bad, np.nan, dphi)
    return dlam, dphi


def _find_grid_index(grids, lam, phi):
    """Vectorized findGrid: index of the most-refined containing subgrid
    per point, -1 where none (gridAt semantics, grids.cpp:2402-2431)."""
    idx = np.full(lam.shape, -1, dtype=np.int64)
    best_res = np.full(lam.shape, np.inf)
    for gi, g in enumerate(grids):
        inside = g.contains(lam, phi)
        finer = inside & (g.resx < best_res)
        idx = np.where(finer, gi, idx)
        best_res = np.where(finer, g.resx, best_res)
    return idx


def hgrid_apply(grids, lam, phi, direction: str):
    """pj_hgrid_apply over arrays; src/grids.cpp:2951-3090.

    fwd: add interpolated deltas; inv: fixed-point iteration (<=10 @1e-12)
    with per-lane freeze and edge fallback to the first approximation.
    Out-of-all-grids points -> NaN (PJD_ERR_GRID_AREA).
    """
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    out_lam = np.full_like(lam, np.nan)
    out_phi = np.full_like(phi, np.nan)

    gidx = _find_grid_index(grids, lam, phi)
    for gi, g in enumerate(grids):
        sel = gidx == gi
        if not sel.any():
            continue
        if g.name == "null":
            # the builtin null grid is an exact identity: no shift and
            # no longitude renormalization (PROJ 8's crs_to_crs builds a
            # null pipeline for @null — the +over case must survive)
            out_lam[sel] = lam[sel]
            out_phi[sel] = phi[sel]
            continue
        ll = lam[sel]
        pp = phi[sel]
        eps = (g.resx + g.resy) * _REL_TOL
        tb_lam = ll - g.west
        tb_lam = np.where(tb_lam + eps < 0, tb_lam + 2 * np.pi, tb_lam)
        tb_lam = np.where(tb_lam - eps > g.east - g.west, tb_lam - 2 * np.pi, tb_lam)
        tb_phi = pp - g.south

        dlam, dphi = _interp_grid(tb_lam, tb_phi, g)
        if direction == "fwd":
            out_lam[sel] = ll + dlam
            out_phi[sel] = pp + dphi
            continue

        # inverse: t = tb - delta, iterate (grids.cpp:2991-3044), with
        # MID-ITERATION CROSS-GRID SWITCHING (grids.cpp:3003-3026): a
        # lane whose iterate steps outside its grid re-resolves the
        # containing grid at the current estimate, re-expresses t/tb in
        # the new grid's frame and keeps iterating; only a lane with NO
        # other containing grid breaks and keeps the current estimate
        # ("Using first approximation", grids.cpp:3046-3049).
        n_sel = len(ll)
        cur_gi = np.full(n_sel, gi, dtype=np.int64)
        t_lam = tb_lam - dlam
        t_phi = tb_phi - dphi
        active = np.isfinite(t_lam)
        edge_fallback = np.zeros_like(active)
        count = np.zeros(n_sel, dtype=np.int64)
        while active.any():
            dl = np.full(n_sel, np.nan)
            dp = np.full(n_sel, np.nan)
            for gj in np.unique(cur_gi[active]):
                m = active & (cur_gi == gj)
                dl[m], dp[m] = _interp_grid(t_lam[m], t_phi[m], grids[gj])
            stepped_out = active & np.isnan(dl)
            if stepped_out.any():
                west = np.array([grids[k].west for k in range(len(grids))])
                south = np.array([grids[k].south for k in range(len(grids))])
                lp_lam = t_lam[stepped_out] + west[cur_gi[stepped_out]]
                lp_phi = t_phi[stepped_out] + south[cur_gi[stepped_out]]
                new_gi = _find_grid_index(grids, lp_lam, lp_phi)
                null_mask = np.array([
                    k >= 0 and grids[k].name == "null" for k in new_gi
                ])
                can_switch = ((new_gi >= 0)
                              & (new_gi != cur_gi[stepped_out])
                              & ~null_mask)
                # lanes with nowhere to go: keep the current estimate
                give_up_idx = np.flatnonzero(stepped_out)[~can_switch]
                edge_fallback[give_up_idx] = True
                active[give_up_idx] = False
                sw_idx = np.flatnonzero(stepped_out)[can_switch]
                if len(sw_idx):
                    ngi = new_gi[can_switch]
                    cur_gi[sw_idx] = ngi
                    nw, ns = west[ngi], south[ngi]
                    t_lam[sw_idx] = lp_lam[can_switch] - nw
                    t_phi[sw_idx] = lp_phi[can_switch] - ns
                    eps_n = np.array([
                        (grids[k].resx + grids[k].resy) * _REL_TOL for k in ngi
                    ])
                    span = np.array([
                        grids[k].east - grids[k].west for k in ngi
                    ])
                    nb_lam = ll[sw_idx] - nw
                    nb_lam = np.where(nb_lam + eps_n < 0, nb_lam + 2 * np.pi,
                                      nb_lam)
                    nb_lam = np.where(nb_lam - eps_n > span,
                                      nb_lam - 2 * np.pi, nb_lam)
                    tb_lam[sw_idx] = nb_lam
                    tb_phi[sw_idx] = pp[sw_idx] - ns
                    # a switch consumes an iteration (the C's --i runs on
                    # the `continue` path too) but leaves dif huge
                    count[sw_idx] += 1
                    ran_out = sw_idx[count[sw_idx] >= _MAX_ITER]
                    active[ran_out] = False
                    count[ran_out] = _MAX_ITER + 1  # marks nonconvergence
            stepping = active & ~np.isnan(dl)
            if stepping.any():
                dif_lam = t_lam[stepping] + dl[stepping] - tb_lam[stepping]
                dif_phi = t_phi[stepping] + dp[stepping] - tb_phi[stepping]
                t_lam[stepping] -= dif_lam
                t_phi[stepping] -= dif_phi
                converged = (dif_lam * dif_lam + dif_phi * dif_phi
                             <= _TOL * _TOL)
                cnt = count[stepping] + 1
                count[stepping] = cnt
                idx = np.flatnonzero(stepping)
                active[idx[converged]] = False
                ran_out = idx[~converged & (cnt >= _MAX_ITER)]
                active[ran_out] = False
                count[ran_out] = _MAX_ITER + 1
        # non-convergence after MAX_ITER -> error (grids.cpp:3036-3044);
        # NOTE the C's `while (--i && ...)` errors even when the 10th
        # body execution converged (i hits 0 first), so >= not >
        nonconv = (count >= _MAX_ITER) & ~edge_fallback
        west = np.array([grids[k].west for k in range(len(grids))])
        south = np.array([grids[k].south for k in range(len(grids))])
        res_lam = C.adjlon(t_lam + west[cur_gi])
        res_phi = t_phi + south[cur_gi]
        res_lam = np.where(nonconv, np.nan, res_lam)
        res_phi = np.where(nonconv, np.nan, res_phi)
        out_lam[sel] = res_lam
        out_phi[sel] = res_phi

    return out_lam, out_phi


def vgrid_value(grids, lam, phi, vmultiplier: float):
    """read_vgrid_value over arrays; src/grids.cpp:3141-3276.

    Bilinear with nodata-aware weight renormalization; NaN where no grid
    covers the point or all four corners are nodata.
    """
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    out = np.full_like(lam, np.nan)

    # deepest/most-refined containing grid per point (gridAt child
    # recursion, grids.cpp:1439-1462); no fallthrough to coarser grids
    # when the value is nodata (C returns HUGE_VAL there)
    gidx = np.full(lam.shape, -1, dtype=np.int64)
    best_res = np.full(lam.shape, np.inf)
    for gi, g in enumerate(grids):
        inside = g.contains(lam, phi)
        finer = inside & (g.resx < best_res)
        gidx = np.where(finer, gi, gidx)
        best_res = np.where(finer, g.resx, best_res)
    for gi, g in enumerate(grids):
        sel = gidx == gi
        if not sel.any():
            continue
        ll = lam[sel]
        pp = phi[sel]
        gx = (ll - g.west) / g.resx
        if g.full_world:
            gx = np.mod(np.mod(gx + g.width, g.width) + g.width, g.width)
        else:
            gx = np.where(ll < g.west, (ll + 2 * np.pi - g.west) / g.resx, gx)
            gx = np.where(ll > g.east, (ll - 2 * np.pi - g.west) / g.resx, gx)
        gy = (pp - g.south) / g.resy
        ix = np.floor(gx).astype(np.int64)
        iy = np.floor(gy).astype(np.int64)
        ok = (ix >= 0) & (ix < g.width) & (iy >= 0) & (iy < g.height)
        ixs = np.clip(ix, 0, g.width - 1)
        iys = np.clip(iy, 0, g.height - 1)
        fx = gx - ixs
        fy = gy - iys
        ix2 = ixs + 1
        if g.full_world:
            ix2 = np.where(ix2 >= g.width, 0, ix2)
        else:
            ix2 = np.minimum(ix2, g.width - 1)
        iy2 = np.minimum(iys + 1, g.height - 1)

        va = g.values[iys, ixs]
        vb = g.values[iys, ix2]
        vc = g.values[iy2, ixs]
        vd = g.values[iy2, ix2]

        def nodata(v):
            if g.nodata is not None:  # explicit GTiff nodata tag
                return v == np.float32(g.nodata)
            vm = v * vmultiplier
            return (vm > 1000) | (vm < -1000) | (v == np.float32(-88.8888))

        wa = (1.0 - fx) * (1.0 - fy)
        wb = fx * (1.0 - fy)
        wc = (1.0 - fx) * fy
        wd = fx * fy
        na, nb, nc, nd = nodata(va), nodata(vb), nodata(vc), nodata(vd)
        value = (
            np.where(na, 0.0, va * wa) + np.where(nb, 0.0, vb * wb)
            + np.where(nc, 0.0, vc * wc) + np.where(nd, 0.0, vd * wd)
        )
        total_w = (
            np.where(na, 0.0, wa) + np.where(nb, 0.0, wb)
            + np.where(nc, 0.0, wc) + np.where(nd, 0.0, wd)
        )
        n_weights = 4 - (na.astype(int) + nb.astype(int) + nc.astype(int) + nd.astype(int))
        with np.errstate(invalid="ignore", divide="ignore"):
            value = np.where(n_weights == 0, np.nan,
                             np.where(n_weights != 4, value / total_w, value))
        value = value * vmultiplier
        value = np.where(ok, value, np.nan)
        out[sel] = value

    return out


def _parse_t(P: PJ, key: str) -> float:
    """+t_final supports 'now' (hgridshift.cpp:188-199)."""
    v = P.params.get(key)
    if v is None:
        return 0.0
    if str(v) == "now":
        import time as _time

        tm = _time.localtime()
        return 1900.0 + tm.tm_year - 1900 + tm.tm_yday / 365.0
    return float(v)


def setup_hgridshift(P: PJ) -> PJ:
    """src/transformations/hgridshift.cpp:35-214."""
    from proj_4_spark.sources.grids import load_hgrids

    if not P.has("grids"):
        raise ProjError("no_args", "hgridshift: +grids parameter missing")
    try:
        grids = load_hgrids(str(P.params["grids"]))
    except FileNotFoundError as e:
        raise ProjError("failed_to_load_grid", str(e)) from None
    except ValueError as e:
        # corrupt/truncated grid files are load failures; only genuinely
        # unknown formats stay "unsupported"
        errno = ("failed_to_load_grid"
                 if ".tif" in str(P.params["grids"]).lower() else "unsupported")
        raise ProjError(errno, f"grid format: {e}") from None
    t_final = _parse_t(P, "t_final")
    t_epoch = P.param_f("t_epoch")

    if not grids:
        # every grid was @optional and missing: pass coordinates through
        # unchanged (hgridshift.cpp:56-60 "Only try the gridshift if at
        # least one grid is loaded")
        def passthrough(lam, phi, z, t, P_):
            return lam, phi, z, t

        P.fwd4d = passthrough
        P.inv4d = passthrough
        P.left = UNITS_RADIANS
        P.right = UNITS_RADIANS
        P.opaque["grids"] = grids
        return P

    def fwd4d(lam, phi, z, t, P_):
        if t_final != 0 and t_epoch != 0:
            apply_mask = (t < t_epoch) & (t_final > t_epoch)
        else:
            apply_mask = np.ones(np.shape(lam), dtype=bool)
        nl, np_ = hgrid_apply(grids, lam, phi, "fwd")
        return (np.where(apply_mask, nl, lam), np.where(apply_mask, np_, phi), z, t)

    def inv4d(lam, phi, z, t, P_):
        if t_final != 0 and t_epoch != 0:
            apply_mask = (t < t_epoch) & (t_final > t_epoch)
        else:
            apply_mask = np.ones(np.shape(lam), dtype=bool)
        nl, np_ = hgrid_apply(grids, lam, phi, "inv")
        return (np.where(apply_mask, nl, lam), np.where(apply_mask, np_, phi), z, t)

    P.fwd4d = fwd4d
    P.inv4d = inv4d
    P.left = UNITS_RADIANS
    P.right = UNITS_RADIANS
    P.opaque["grids"] = grids
    return P


def setup_vgridshift(P: PJ) -> PJ:
    """src/transformations/vgridshift.cpp:175-240: historical default is
    multiplier=-1 (forward subtracts the offset)."""
    from proj_4_spark.sources.grids import load_vgrids

    if not P.has("grids"):
        raise ProjError("no_args", "vgridshift: +grids parameter missing")
    try:
        grids = load_vgrids(str(P.params["grids"]))
    except FileNotFoundError as e:
        raise ProjError("failed_to_load_grid", str(e)) from None
    except ValueError as e:
        # corrupt/truncated grid files are load failures; only genuinely
        # unknown formats stay "unsupported"
        errno = ("failed_to_load_grid"
                 if ".tif" in str(P.params["grids"]).lower() else "unsupported")
        raise ProjError(errno, f"grid format: {e}") from None
    mult = P.param_f("multiplier", -1.0)

    if not grids:
        # all grids @optional and missing: identity
        # (vgridshift.cpp:88-92,112-116)
        def passthrough(lam, phi, z, t, P_):
            return lam, phi, z, t

        P.fwd4d = passthrough
        P.inv4d = passthrough
        P.left = UNITS_RADIANS
        P.right = UNITS_RADIANS
        P.opaque["grids"] = grids
        return P

    t_final = _parse_t(P, "t_final")
    t_epoch = P.param_f("t_epoch")

    def _time_mask(t):
        # time-restricted shift: apply only when t < t_epoch and the
        # bracket is forward-ordered (vgridshift.cpp forward_4d/
        # reverse_4d — same gate hgridshift uses)
        if t_final != 0 and t_epoch != 0:
            return (t < t_epoch) & (t_final > t_epoch)
        return np.ones(np.shape(t), dtype=bool)

    def fwd4d(lam, phi, z, t, P_):
        m = _time_mask(t)
        dz = vgrid_value(grids, lam, phi, mult)
        # grid error poisons the whole coordinate (proj_coord_error,
        # all components HUGE_VAL in the reference)
        bad = np.isnan(dz) & m
        return (np.where(bad, np.nan, lam), np.where(bad, np.nan, phi),
                np.where(m, z + dz, z), t)

    def inv4d(lam, phi, z, t, P_):
        m = _time_mask(t)
        dz = vgrid_value(grids, lam, phi, mult)
        bad = np.isnan(dz) & m
        return (np.where(bad, np.nan, lam), np.where(bad, np.nan, phi),
                np.where(m, z - dz, z), t)

    P.fwd4d = fwd4d
    P.inv4d = inv4d
    P.left = UNITS_RADIANS
    P.right = UNITS_RADIANS
    P.opaque["grids"] = grids
    return P


def hgrid_raw_value(grids, lam, phi):
    """pj_hgrid_value (src/grids.cpp:3095-3139): raw bilinear grid values
    WITHOUT the NTv2 west-positive compensation (compensateNTConvention
    = false).  NTv1/NTv2/CTable2 readers bake that compensation into
    lon_shift at load time, so their raw east-value = -lon_shift; GTiff
    hgrids ignore the flag in C (grids.cpp:2094-2106) so raw == baked.
    Lat is never compensated.  Out-of-grid lanes -> NaN
    (PJD_ERR_GRID_AREA)."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    out_e = np.full_like(lam, np.nan)
    out_n = np.full_like(phi, np.nan)
    gidx = _find_grid_index(grids, lam, phi)
    for gi, g in enumerate(grids):
        sel = gidx == gi
        if not sel.any():
            continue
        ll = lam[sel]
        pp = phi[sel]
        eps = (g.resx + g.resy) * _REL_TOL
        tb_lam = ll - g.west
        tb_lam = np.where(tb_lam + eps < 0, tb_lam + 2 * np.pi, tb_lam)
        tb_lam = np.where(tb_lam - eps > g.east - g.west, tb_lam - 2 * np.pi, tb_lam)
        tb_phi = pp - g.south
        dlam, dphi = _interp_grid(tb_lam, tb_phi, g)
        out_e[sel] = -dlam if getattr(g, "raw_lon_negated", True) else dlam
        out_n[sel] = dphi
    return out_e, out_n


def setup_deformation(P: PJ) -> PJ:
    """Kinematic grid shift; src/transformations/deformation.cpp.

    Cartesian in/out.  X_out = X_in + dt*V where V is the ENU velocity
    (mm/yr in the grids, CTable2 horizontal + GTX vertical) rotated to
    XYZ at the point's geodetic position (deformation.cpp:146-211).  The
    reverse iteration including its verbatim `out += dif` update
    (deformation.cpp:214-254) and the first-guess z sign are reproduced.
    """
    from proj_4_spark.kernels.cart import cart_fwd3d, cart_inv3d
    from proj_4_spark.sources.grids import load_hgrids, load_vgrids

    has_xy = P.has("xy_grids")
    has_z = P.has("z_grids")
    has_g = P.has("grids")
    if not has_g and (not has_xy or not has_z):
        raise ProjError("no_args", "deformation: need +grids or +xy_grids/+z_grids")
    hgrids = vgrids = ggrids = None
    try:
        if has_g:
            from proj_4_spark.sources.grids import load_generic_grids

            ggrids = load_generic_grids(str(P.params["grids"]))
        else:
            hgrids = load_hgrids(str(P.params["xy_grids"]))
            vgrids = load_vgrids(str(P.params["z_grids"]))
    except FileNotFoundError as e:
        raise ProjError("failed_to_load_grid", str(e)) from None
    except ValueError as e:
        raise ProjError("failed_to_load_grid", f"grid format: {e}") from None

    dt = P.param_f("dt", np.inf) if P.has("dt") else np.inf
    if P.has("t_obs"):
        raise ProjError("missing_args", "+t_obs is deprecated, use +dt")
    t_epoch = P.param_f("t_epoch", np.inf) if P.has("t_epoch") else np.inf
    if not np.isfinite(dt) and not np.isfinite(t_epoch):
        raise ProjError("missing_args", "deformation: +dt or +t_epoch required")
    if np.isfinite(dt) and np.isfinite(t_epoch):
        raise ProjError("mutually_exclusive_args", "+dt and +t_epoch are exclusive")

    def shift_xyz(x, y, z):
        """get_grid_shift (deformation.cpp:146-211)."""
        lam, phi, zz, _ = cart_inv3d(x, y, z, np.zeros_like(x), P)
        if ggrids is not None:
            # generic grid path (deformation.cpp:84-144): samples
            # east/north/up_velocity in mm/yr
            se, sn, su = 0, 1, 2
            if ggrids:
                g0 = ggrids[0]
                for i in range(g0.samples):
                    d = g0.item("DESCRIPTION", i)
                    if d == "east_velocity":
                        se = i
                    elif d == "north_velocity":
                        sn = i
                    elif d == "up_velocity":
                        su = i
                unit = g0.item("UNITTYPE", se)
                if unit and unit != "millimetres per year":
                    raise ProjError("failed_to_load_grid",
                                    f"deformation: unit {unit} not handled")
            e, n, u = generic_grid_values(ggrids, lam, phi, (se, sn, su))
        else:
            e, n = hgrid_raw_value(hgrids, lam, phi)
            u = vgrid_value(vgrids, lam, phi, 1.0)
        e = e / 1000.0
        n = n / 1000.0
        u = u / 1000.0
        sp = np.sin(phi)
        cp = np.cos(phi)
        sl = np.sin(lam)
        cl = np.cos(lam)
        vx = -sp * cl * n - sl * e + cp * cl * u
        vy = -sp * sl * n + cl * e + cp * sl * u
        vz = cp * n + sp * u
        return vx, vy, vz

    def _fwd(x, y, z, dts):
        vx, vy, vz = shift_xyz(x, y, z)
        return x + dts * vx, y + dts * vy, z + dts * vz

    def _rev(x, y, z, dts):
        """reverse_shift (deformation.cpp:214-254), per-lane frozen."""
        vx, vy, vz = shift_xyz(x, y, z)
        z0 = vz
        ox = x - dts * vx
        oy = y - dts * vy
        oz = z + dts * vz
        active = np.isfinite(ox)
        for _ in range(10):
            if not active.any():
                break
            dx, dy, dz_ = shift_xyz(ox, oy, oz)
            nanlane = active & ~np.isfinite(dx)
            difx = ox + dts * dx - x
            dify = oy + dts * dy - y
            difz = oz - dts * dz_ - z
            upd = active & ~nanlane
            ox = np.where(upd, ox + difx, ox)
            oy = np.where(upd, oy + dify, oy)
            oz = np.where(upd, oz + difz, oz)
            conv = np.hypot(difx, dify) <= 1e-8
            active = upd & ~conv
        oz = z - dts * z0
        return ox, oy, oz

    def fwd3d(x, y, z, t, P_):
        if not np.isfinite(dt):
            nan = np.full_like(x, np.nan)
            return nan, nan.copy(), nan.copy(), t
        nx, ny, nz = _fwd(x, y, z, dt)
        return nx, ny, nz, t

    def inv3d(x, y, z, t, P_):
        if not np.isfinite(dt):
            nan = np.full_like(x, np.nan)
            return nan, nan.copy(), nan.copy(), t
        nx, ny, nz = _rev(x, y, z, dt)
        return nx, ny, nz, t

    def fwd4d(x, y, z, t, P_):
        dts = dt if np.isfinite(dt) else t - t_epoch
        nx, ny, nz = _fwd(x, y, z, dts)
        return nx, ny, nz, t

    def inv4d(x, y, z, t, P_):
        dts = dt if np.isfinite(dt) else t - t_epoch
        nx, ny, nz = _rev(x, y, z, dts)
        return nx, ny, nz, t

    P.fwd3d = fwd3d
    P.inv3d = inv3d
    P.fwd4d = fwd4d
    P.inv4d = inv4d
    P.left = "cartesian"
    P.right = "cartesian"
    P.opaque["hgrids"] = hgrids
    P.opaque["vgrids"] = vgrids
    P.opaque["ggrids"] = ggrids
    return P


def generic_grid_values(grids, lam, phi, idx123):
    """pj_bilinear_interpolation_three_samples over arrays
    (src/grids.cpp:3365-3445): plain bilinear of three samples, +-2pi
    longitude wrap, int truncation of the cell index, no edge snapping.
    Out-of-all-grids lanes -> NaN."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    outs = [np.full_like(lam, np.nan) for _ in idx123]
    gidx = np.full(lam.shape, -1, dtype=np.int64)
    best_res = np.full(lam.shape, np.inf)
    for gi, g in enumerate(grids):
        e = 0.0
        ll = np.where(lam < g.west, lam + 2 * np.pi, lam)
        ll = np.where(ll > g.east, ll - 2 * np.pi, ll)
        inside = ((ll + e >= g.west) & (ll - e <= g.east)
                  & (phi + e >= g.south) & (phi - e <= g.north))
        finer = inside & (g.resx < best_res)
        gidx = np.where(finer, gi, gidx)
        best_res = np.where(finer, g.resx, best_res)
    for gi, g in enumerate(grids):
        sel = gidx == gi
        if not sel.any():
            continue
        ll = lam[sel]
        pp = phi[sel]
        gx = (ll - g.west) / g.resx
        gx = np.where(ll < g.west, (ll + 2 * np.pi - g.west) / g.resx, gx)
        gx = np.where(ll > g.east, (ll - 2 * np.pi - g.west) / g.resx, gx)
        gy = (pp - g.south) / g.resy
        ix = np.clip(np.trunc(gx).astype(np.int64), 0, g.width - 1)
        iy = np.clip(np.trunc(gy).astype(np.int64), 0, g.height - 1)
        ix2 = np.minimum(ix + 1, g.width - 1)
        iy2 = np.minimum(iy + 1, g.height - 1)
        fl = gx - ix
        fp = gy - iy
        m10 = fl * (1.0 - fp)
        m11 = fl * fp
        m01 = (1.0 - fl) * fp
        m00 = (1.0 - fl) * (1.0 - fp)
        for k, s in enumerate(idx123):
            band = g.data[s]
            v = (m00 * band[iy, ix] + m10 * band[iy, ix2]
                 + m01 * band[iy2, ix] + m11 * band[iy2, ix2])
            outs[k][sel] = v
    return outs


def setup_xyzgridshift(P: PJ) -> PJ:
    """Geocentric grid shift; src/transformations/xyzgridshift.cpp.

    Cartesian in/out; grid samples x/y/z_translation in metres looked up
    at the geodetic position of the point (in the input CRS when
    grid_ref=input_crs, else iteratively in the output CRS)."""
    from proj_4_spark.kernels.cart import cart_inv3d
    from proj_4_spark.sources.grids import load_generic_grids

    grid_ref_is_input = True
    gr = P.params.get("grid_ref")
    if gr is not None:
        if gr == "output_crs":
            grid_ref_is_input = False
        elif gr != "input_crs":
            raise ProjError("no_args", f"xyzgridshift: bad grid_ref {gr}")
    if not P.has("grids"):
        raise ProjError("no_args", "xyzgridshift: +grids parameter missing")
    try:
        grids = load_generic_grids(str(P.params["grids"]))
    except FileNotFoundError as e:
        raise ProjError("failed_to_load_grid", str(e)) from None
    except ValueError as e:
        raise ProjError("failed_to_load_grid", f"grid format: {e}") from None
    multiplier = P.param_f("multiplier", 1.0)

    def _idx(g):
        sx, sy, sz = 0, 1, 2
        for i in range(g.samples):
            d = g.item("DESCRIPTION", i)
            if d == "x_translation":
                sx = i
            elif d == "y_translation":
                sy = i
            elif d == "z_translation":
                sz = i
        return sx, sy, sz

    def get_values(x, y, z):
        lam, phi, _, _ = cart_inv3d(x, y, z, np.zeros_like(x), P)
        if not grids:
            return (np.full_like(x, np.nan),) * 3
        sx, sy, sz = _idx(grids[0])
        dx, dy, dz = generic_grid_values(grids, lam, phi, (sx, sy, sz))
        return dx * multiplier, dy * multiplier, dz * multiplier

    def direct(x, y, z, factor):
        dx, dy, dz = get_values(x, y, z)
        return x + factor * dx, y + factor * dy, z + factor * dz

    def iterative(x, y, z, factor):
        """iterative_adjustment (xyzgridshift.cpp:136-161)."""
        px, py, pz = x.copy(), y.copy(), z.copy()
        active = np.isfinite(px)
        for _ in range(10):
            if not active.any():
                break
            dx, dy, dz = get_values(px, py, pz)
            dx, dy, dz = factor * dx, factor * dy, factor * dz
            err = ((px - x - dx) ** 2 + (py - y - dy) ** 2
                   + (pz - z - dz) ** 2)
            px = np.where(active, x + dx, px)
            py = np.where(active, y + dy, py)
            pz = np.where(active, z + dz, pz)
            active = active & ~(err < 1e-10)
        return px, py, pz

    def fwd3d(x, y, z, t, P_):
        nx, ny, nz = (direct(x, y, z, 1.0) if grid_ref_is_input
                      else iterative(x, y, z, 1.0))
        return nx, ny, nz, t

    def inv3d(x, y, z, t, P_):
        nx, ny, nz = (iterative(x, y, z, -1.0) if grid_ref_is_input
                      else direct(x, y, z, -1.0))
        return nx, ny, nz, t

    P.fwd3d = fwd3d
    P.inv3d = inv3d
    P.left = "cartesian"
    P.right = "cartesian"
    return P
