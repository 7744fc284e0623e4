"""EPSG conversion-method -> proj-string fragment mapping, shared by
the catalog generator (tools/gen_epsg_catalog.py) and the runtime WKT2
reader (sources/wkt2.py).

`p` maps EPSG parameter codes to raw (value, uom) records; `A`, `L`,
`K` are accessor callables A(p, code, default) -> degrees,
L(p, code, default=0.0) -> meters, K(p, code, default=1.0) -> unity
supplied by the caller (the generator converts through the EPSG
unit_of_measure table; the WKT2 reader through the unit factors carried
in the WKT text itself).

Reference semantics: the classic +init=epsg expansions for each EPSG
method code (conversion.sql methods; src/init.cpp init-file rendering).
"""

from __future__ import annotations


def fmt(v: float) -> str:
    """Shortest round-trip decimal (classic init files print plainly)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def method_fragment(method: int, p: dict, A, L, K) -> str | None:
    if method in (9807, 9808):  # Transverse Mercator [South Orientated]
        lat0, lon0 = A(p, 8801, 0.0), A(p, 8802, 0.0)
        k, x0, y0 = K(p, 8805), L(p, 8806), L(p, 8807)
        south = method == 9808
        if k < 0:       # ESRI convention for SA Lo south-orientated
            k, south = -k, True
        # UTM detection (classic init rendered these as +proj=utm)
        zone = (lon0 + 183.0) / 6.0
        if (not south and lat0 == 0.0 and abs(k - 0.9996) < 1e-12
                and x0 == 500000.0 and y0 in (0.0, 10000000.0)
                and abs(zone - round(zone)) < 1e-9
                and 1 <= round(zone) <= 60):
            s = f"proj=utm zone={int(round(zone))}"
            return s + (" south" if y0 == 10000000.0 else "")
        s = (f"proj=tmerc lat_0={fmt(lat0)} lon_0={fmt(lon0)} "
             f"k={fmt(k)} x_0={fmt(x0)} y_0={fmt(y0)}")
        return s + (" axis=wsu" if south else "")
    if method == 9802:  # LCC 2SP
        return (f"proj=lcc lat_0={fmt(A(p, 8821, 0.0))} "
                f"lon_0={fmt(A(p, 8822, 0.0))} "
                f"lat_1={fmt(A(p, 8823, 0.0))} lat_2={fmt(A(p, 8824, 0.0))} "
                f"x_0={fmt(L(p, 8826))} y_0={fmt(L(p, 8827))}")
    if method == 1051:  # LCC 2SP Michigan (ellipsoid scaling factor)
        k = K(p, 1038, 1.0)
        return (f"proj=lcc lat_0={fmt(A(p, 8821, 0.0))} "
                f"lon_0={fmt(A(p, 8822, 0.0))} "
                f"lat_1={fmt(A(p, 8823, 0.0))} lat_2={fmt(A(p, 8824, 0.0))} "
                f"x_0={fmt(L(p, 8826))} y_0={fmt(L(p, 8827))} k_0={fmt(k)}")
    if method == 9801:  # LCC 1SP
        lat0 = A(p, 8801, 0.0)
        return (f"proj=lcc lat_1={fmt(lat0)} lat_0={fmt(lat0)} "
                f"lon_0={fmt(A(p, 8802, 0.0))} k_0={fmt(K(p, 8805))} "
                f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
    if method == 9804:  # Mercator variant A
        return (f"proj=merc lon_0={fmt(A(p, 8802, 0.0))} "
                f"k={fmt(K(p, 8805))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))}")
    if method == 9805:  # Mercator variant B
        return (f"proj=merc lat_ts={fmt(A(p, 8823, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))}")
    if method == 1024:  # Popular Visualisation Pseudo Mercator
        return (f"proj=webmerc lon_0={fmt(A(p, 8802, 0.0))} "
                f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
    if method == 9806:  # Cassini-Soldner
        return (f"proj=cass lat_0={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))}")
    if method == 9809:  # Oblique Stereographic
        return (f"proj=sterea lat_0={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} k={fmt(K(p, 8805))} "
                f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
    if method == 9810:  # Polar Stereographic variant A
        return (f"proj=stere lat_0={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} k={fmt(K(p, 8805))} "
                f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
    if method == 9829:  # Polar Stereographic variant B
        lat_ts = A(p, 8832, 0.0)
        pole = 90.0 if lat_ts >= 0 else -90.0
        return (f"proj=stere lat_0={fmt(pole)} lat_ts={fmt(lat_ts)} "
                f"lon_0={fmt(A(p, 8833, 0.0))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))}")
    if method in (9812, 9815):  # Hotine Oblique Mercator A/B
        alpha = A(p, 8813, 0.0)
        gamma = A(p, 8814, alpha)
        if method == 9812:
            x0, y0, tail = L(p, 8806), L(p, 8807), " no_uoff"
        else:
            x0, y0, tail = L(p, 8816), L(p, 8817), ""
        if alpha == 90.0 and gamma == 90.0 and method == 9815:
            # HOM-B at alpha=gamma=90 IS the Swiss Oblique Mercator
            # (classic epsg init rendered these as +proj=somerc)
            return (f"proj=somerc lat_0={fmt(A(p, 8811, 0.0))} "
                    f"lon_0={fmt(A(p, 8812, 0.0))} "
                    f"k_0={fmt(K(p, 8815))} "
                    f"x_0={fmt(x0)} y_0={fmt(y0)}")
        return (f"proj=omerc lat_0={fmt(A(p, 8811, 0.0))} "
                f"lonc={fmt(A(p, 8812, 0.0))} alpha={fmt(alpha)} "
                f"gamma={fmt(gamma)} k={fmt(K(p, 8815))} "
                f"x_0={fmt(x0)} y_0={fmt(y0)}{tail}")
    if method == 9818:  # American Polyconic
        return (f"proj=poly lat_0={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))}")
    if method in (9819, 1041):  # Krovak [North Orientated]
        s = (f"proj=krovak lat_0={fmt(A(p, 8811, 0.0))} "
             f"lon_0={fmt(A(p, 8833, 0.0))} "
             f"alpha={fmt(A(p, 1036, 0.0))} k={fmt(K(p, 8819))} "
             f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
        return s + (" axis=swu" if method == 9819 else "")
    if method in (9820, 9821, 1027):  # LAEA [(Spherical)]
        s = (f"proj=laea lat_0={fmt(A(p, 8801, 0.0))} "
             f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
             f"y_0={fmt(L(p, 8807))}")
        return s + (" R_A" if method in (9821, 1027) else "")
    if method == 9822:  # Albers
        return (f"proj=aea lat_0={fmt(A(p, 8821, 0.0))} "
                f"lon_0={fmt(A(p, 8822, 0.0))} "
                f"lat_1={fmt(A(p, 8823, 0.0))} lat_2={fmt(A(p, 8824, 0.0))} "
                f"x_0={fmt(L(p, 8826))} y_0={fmt(L(p, 8827))}")
    if method == 1078:  # Equal Earth
        return (f"proj=eqearth lon_0={fmt(A(p, 8802, 0.0))} "
                f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
    if method in (1028, 1029, 9823, 9842):  # Equidistant Cylindrical
        s = (f"proj=eqc lat_ts={fmt(A(p, 8823, 0.0))} "
             f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
             f"y_0={fmt(L(p, 8807))}")
        return s + (" R_A" if method in (1029, 9823) else "")
    if method in (9834, 9835):  # Lambert Cylindrical Equal Area
        s = (f"proj=cea lat_ts={fmt(A(p, 8823, 0.0))} "
             f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
             f"y_0={fmt(L(p, 8807))}")
        return s + (" R_A" if method == 9834 else "")
    if method == 9811:  # New Zealand Map Grid
        return (f"proj=nzmg lat_0={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))}")
    if method == 9832:  # Modified Azimuthal Equidistant
        return (f"proj=aeqd lat_0={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))}")
    if method == 9831:  # Guam Projection
        return (f"proj=aeqd guam lat_0={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))}")
    if method == 1052:  # Colombia Urban (IOGP GN7-2)
        h0 = L(p, 1039, 0.0)
        return (f"proj=col_urban lat_0={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))} h_0={fmt(h0)}")
    if method == 9826:  # LCC West Orientated: 1SP with W = FE - E
        lat0 = A(p, 8801, 0.0)
        return (f"proj=lcc lat_1={fmt(lat0)} lat_0={fmt(lat0)} "
                f"lon_0={fmt(A(p, 8802, 0.0))} k_0={fmt(K(p, 8805))} "
                f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))} axis=wnu")
    if method == 9813:  # Laborde Oblique Mercator (Madagascar)
        return (f"proj=labrd lat_0={fmt(A(p, 8811, 0.0))} "
                f"lon_0={fmt(A(p, 8812, 0.0))} "
                f"azi={fmt(A(p, 8813, 0.0))} k_0={fmt(K(p, 8815))} "
                f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
    if method == 9817:  # Lambert Conic Near-Conformal
        return (f"proj=lcca lat_0={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} k_0={fmt(K(p, 8805))} "
                f"x_0={fmt(L(p, 8806))} y_0={fmt(L(p, 8807))}")
    if method == 9827:  # Bonne
        return (f"proj=bonne lat_1={fmt(A(p, 8801, 0.0))} "
                f"lon_0={fmt(A(p, 8802, 0.0))} x_0={fmt(L(p, 8806))} "
                f"y_0={fmt(L(p, 8807))}")
    if method == 9624:  # Affine parametric transformation
        # exportToPROJStringGeneric, coordinateoperation.cpp:10003-10021:
        # A0/A1/A2/B0/B1/B2 -> affine xoff/s11/s12/yoff/s21/s22 ("Do not
        # mess with axis unit and order for that transformation")
        return (f"proj=affine xoff={fmt(L(p, 8623))} "
                f"s11={fmt(K(p, 8624, 1.0))} s12={fmt(K(p, 8625, 0.0))} "
                f"yoff={fmt(L(p, 8639))} s21={fmt(K(p, 8640, 0.0))} "
                f"s22={fmt(K(p, 8641, 1.0))}")
    return None  # unsupported method -> code dropped
