"""Grid-shift tests: synthetic toy grids (FIXTURES.md §3) + real reference
grids read-only, replaying DHDN_ETRS89.gie vectors (1 mm tolerance)."""

import math
import os

import numpy as np
import pytest

from proj_4_spark.engine.plan import create_operation
from proj_4_spark.gie import run_file, summarize
from proj_4_spark.kernels.common import DEG_TO_RAD, RAD_TO_DEG
from proj_4_spark.kernels.gridshift import hgrid_apply, vgrid_value
from proj_4_spark.sources.grids import (
    HGrid,
    VGrid,
    read_gtx,
    read_ntv2,
    resolve_grid_path,
)

ARCSEC = DEG_TO_RAD / 3600.0


def toy_hgrid() -> HGrid:
    """FIXTURES.md §3: west=5E..15E, south=47N..55N, res 0.1 deg,
    dlon(i,j) = 1.0 + 0.01*i + 0.002*j arcsec (i=col from west, j=row
    from south); dlat = -0.5 - 0.005*i + 0.001*j."""
    width, height = 101, 81
    i = np.arange(width)[None, :]
    j = np.arange(height)[:, None]
    dlon = (1.0 + 0.01 * i + 0.002 * j) * np.ones((height, width))
    dlat = (-0.5 - 0.005 * i + 0.001 * j) * np.ones((height, width))
    return HGrid(
        name="toy", west=5 * DEG_TO_RAD, south=47 * DEG_TO_RAD,
        east=15 * DEG_TO_RAD, north=55 * DEG_TO_RAD,
        resx=0.1 * DEG_TO_RAD, resy=0.1 * DEG_TO_RAD,
        width=width, height=height,
        lon_shift=(dlon * ARCSEC).astype(np.float32),
        lat_shift=(dlat * ARCSEC).astype(np.float32),
    )


def toy_vgrid() -> VGrid:
    width, height = 101, 81
    i = np.arange(width)[None, :]
    j = np.arange(height)[:, None]
    dz = (40.0 + 0.05 * i - 0.03 * j) * np.ones((height, width))
    return VGrid(
        name="toyv", west=5 * DEG_TO_RAD, south=47 * DEG_TO_RAD,
        east=15 * DEG_TO_RAD, north=55 * DEG_TO_RAD,
        resx=0.1 * DEG_TO_RAD, resy=0.1 * DEG_TO_RAD,
        width=width, height=height, values=dz.astype(np.float32),
    )


def test_toy_hgrid_forward_matches_closed_form():
    g = toy_hgrid()
    lon = np.array([10.05, 5.0, 14.999, 7.33]) * DEG_TO_RAD
    lat = np.array([50.05, 47.0, 54.999, 52.11]) * DEG_TO_RAD
    out_lon, out_lat = hgrid_apply([g], lon, lat, "fwd")
    # closed form: bilinear of a bilinear function is exact (modulo the
    # float32 cell quantization of the stored deltas)
    i = (lon - g.west) / g.resx
    j = (lat - g.south) / g.resy
    dlon_exact = (1.0 + 0.01 * i + 0.002 * j) * ARCSEC
    dlat_exact = (-0.5 - 0.005 * i + 0.001 * j) * ARCSEC
    assert np.allclose(out_lon - lon, dlon_exact, atol=2e-12)
    assert np.allclose(out_lat - lat, dlat_exact, atol=2e-12)


def test_toy_hgrid_inverse_fixed_point():
    """Inverse converges <=10 iterations @1e-12 (grids.cpp:2948-2949) and
    round-trips below 1e-8 deg."""
    g = toy_hgrid()
    rng = np.random.default_rng(42)
    lon = rng.uniform(5.2, 14.8, 500) * DEG_TO_RAD
    lat = rng.uniform(47.2, 54.8, 500) * DEG_TO_RAD
    f_lon, f_lat = hgrid_apply([g], lon, lat, "fwd")
    b_lon, b_lat = hgrid_apply([g], f_lon, f_lat, "inv")
    assert np.nanmax(np.abs(b_lon - lon)) * RAD_TO_DEG < 1e-8
    assert np.nanmax(np.abs(b_lat - lat)) * RAD_TO_DEG < 1e-8


def test_toy_hgrid_out_of_extent_errors():
    g = toy_hgrid()
    lon = np.array([20.0, 4.0]) * DEG_TO_RAD
    lat = np.array([50.0, 46.0]) * DEG_TO_RAD
    out_lon, out_lat = hgrid_apply([g], lon, lat, "fwd")
    assert np.isnan(out_lon).all() and np.isnan(out_lat).all()


def test_toy_hgrid_edge_tolerance():
    """Points within the +-1-cell edge tolerance snap in
    (grids.cpp:2890-2915)."""
    g = toy_hgrid()
    eps_deg = 0.1 * 1e-6  # far inside the 10*REL_TOL band
    lon = np.array([5.0 - eps_deg, 15.0 + eps_deg]) * DEG_TO_RAD
    lat = np.array([47.0, 55.0]) * DEG_TO_RAD
    out_lon, _ = hgrid_apply([g], lon, lat, "fwd")
    assert np.isfinite(out_lon).all()


def test_toy_vgrid_value_and_op():
    g = toy_vgrid()
    lon = np.array([10.0]) * DEG_TO_RAD
    lat = np.array([51.0]) * DEG_TO_RAD
    v = vgrid_value([g], lon, lat, 1.0)
    i = (10.0 - 5.0) / 0.1
    j = (51.0 - 47.0) / 0.1
    assert abs(v[0] - (40.0 + 0.05 * i - 0.03 * j)) < 1e-4


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/tests/BETA2007.gsb"),
    reason="reference grid fixtures absent",
)
def test_ntv2_reader_beta2007():
    grids = read_ntv2("/root/reference/data/tests/BETA2007.gsb")
    assert len(grids) >= 1
    g = grids[0]
    # DHDN coverage: Germany
    assert g.west < 7 * DEG_TO_RAD < g.east
    assert g.south < 50 * DEG_TO_RAD < g.north


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/tests/BETA2007.gsb"),
    reason="reference grid fixtures absent",
)
def test_dhdn_etrs89_gie_vectors():
    """The north-star grid-shift case: full DHDN<->ETRS89 NTv2 corpus at
    1 mm tolerance (test/gie/DHDN_ETRS89.gie)."""
    s = summarize(run_file("/root/reference/test/gie/DHDN_ETRS89.gie"))
    assert s["fail"] == 0, s["failures"][:5]
    assert s["pass"] >= 64


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/tests/egm96_15_downsampled.gtx"),
    reason="reference grid fixtures absent",
)
def test_gtx_reader_and_vgridshift():
    g = read_gtx(resolve_grid_path("egm96_15_downsampled.gtx"))
    assert g.width > 0 and g.height > 0
    op = create_operation(
        "+proj=vgridshift +grids=egm96_15_downsampled.gtx +multiplier=1 +ellps=GRS80"
    )
    lam = np.array([12.0 * DEG_TO_RAD])
    phi = np.array([56.0 * DEG_TO_RAD])
    z = np.zeros(1)
    _, _, z2, _ = op.apply(lam, phi, z, np.zeros(1))
    # EGM96 geoid undulation near Denmark ~ 36-40 m
    assert 20 < z2[0] < 60
    # inverse subtracts the same value
    _, _, z3, _ = op.apply(lam, phi, z2, np.zeros(1), "inv")
    assert abs(z3[0]) < 1e-6


def test_datum_emulation_nad27_ctable():
    """NAD27 (+datum=NAD27 -> conus CTable2) matches testvarious-style
    behavior: the shift is a few hundred meters in CONUS."""
    op = create_operation("+proj=latlong +datum=NAD27")
    lam = np.array([-100.0 * DEG_TO_RAD])
    phi = np.array([40.0 * DEG_TO_RAD])
    lon2, lat2, _, _ = op.apply(lam, phi, np.zeros(1), np.zeros(1), "inv")
    dlon_m = abs(lon2[0] - lam[0]) * 6378137 * math.cos(phi[0])
    dlat_m = abs(lat2[0] - phi[0]) * 6356752
    assert 1.0 < dlon_m < 100.0
    assert 0.1 < dlat_m < 300.0  # lat shift at (-100,40) is ~0.65 m
    # roundtrip
    lon3, lat3, _, _ = op.apply(lon2, lat2, np.zeros(1), np.zeros(1), "fwd")
    assert abs(lon3[0] - lam[0]) * RAD_TO_DEG < 1e-8
    assert abs(lat3[0] - phi[0]) * RAD_TO_DEG < 1e-8


def test_hgrid_inverse_cross_grid_switching():
    """grids.cpp:3003-3026: an inverse iterate that steps outside its
    initial grid must SWITCH to the sibling grid containing the current
    estimate and converge there — not fall back to the first
    approximation.  Two adjacent grids with a longitude-dependent shift
    make the two behaviors differ by ~0.04 deg."""
    import math

    import numpy as np

    from proj_4_spark.kernels.gridshift import hgrid_apply
    from proj_4_spark.sources.grids import HGrid

    D = math.pi / 180

    def make_grid(name, w_deg, e_deg, nx):
        # delta_lon(src_lon) = -0.5deg - 0.01*(src_lon - 1deg); delta_lat=0
        w, e = w_deg * D, e_deg * D
        ny = 5
        resx = (e - w) / (nx - 1)
        resy = (1.0 * D) / (ny - 1)
        lons = w + resx * np.arange(nx)
        dl = (-0.5 * D - 0.01 * (lons - 1.0 * D)).astype(np.float32)
        return HGrid(
            name=name, west=w, south=0.0, east=e, north=1.0 * D,
            resx=resx, resy=resy, width=nx, height=ny,
            lon_shift=np.tile(dl, (ny, 1)),
            lat_shift=np.zeros((ny, nx), dtype=np.float32),
        )

    # the real-world switching shape: a refined CHILD subgrid inside a
    # coarse PARENT (both contain the target; the iterate leaves the
    # child and must continue in the parent)
    grids = [make_grid("parent", 0, 2, 21), make_grid("child", 0, 1, 41)]

    # target point at lon 0.9 deg (inside the child, the most-refined
    # containing grid): true source s solves s + d(s) = 0.9
    # -> 0.99*s = 0.9 + 0.5 - 0.01 -> s = 1.40404 deg — outside the
    # child, inside the parent; first iterate lands at 1.399 (outside
    # child); the pre-switching code froze there (0.005 deg error)
    p_lam = np.array([0.9 * D])
    p_phi = np.array([0.5 * D])
    lo, la = hgrid_apply(grids, p_lam, p_phi, "inv")
    s_expect = (0.9 + 0.5 - 0.01) / 0.99
    assert abs(lo[0] / D - s_expect) < 1e-7, lo[0] / D
    # and the roundtrip closes through the forward path
    fl, fp = hgrid_apply(grids, lo, la, "fwd")
    assert abs(fl[0] - p_lam[0]) < 1e-12
    assert abs(fp[0] - p_phi[0]) < 1e-12
