"""Coverage ratchets (VERDICT r3 #10): counts only go UP.

The gie corpus floors live in test_gie_corpus.py (hard fail==0 plus
per-file pass minimums); this file pins the driver-facing surface."""


def test_driver_query_count_monotone():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    qs = E.queries()
    os_ = E.oracle_sql()
    assert len(qs) >= 49, len(qs)
    # EVERY query is value-verified: r4 closed the last no_oracle rows
    assert set(os_) == set(qs), set(qs) ^ set(os_)


def test_epsg_catalog_size_monotone():
    from proj_4_spark.sources.epsg_generated import (
        EXTENTS,
        PRESETS,
        TRANSFORMS,
    )

    from proj_4_spark.sources.epsg_generated import (
        ESRI_PRESETS,
        IGNF_PRESETS,
    )

    assert len(PRESETS) >= 6148
    assert len(IGNF_PRESETS) >= 590
    assert len(ESRI_PRESETS) >= 2400
    assert len(EXTENTS) >= 6100
    assert sum(len(v) for v in TRANSFORMS.values()) >= 2400
    # r5: vertical + compound registries (geoid models, compound codes)
    from proj_4_spark.sources.epsg_generated import (
        COMPOUND_PRESETS,
        VERT_PRESETS,
    )

    assert len(VERT_PRESETS) >= 470
    assert len(COMPOUND_PRESETS) >= 520
    assert sum(1 for v in VERT_PRESETS.values() if v[2]) >= 100
    from proj_4_spark.sources.epsg_generated import VERT_TRANSFORMS

    assert sum(len(v) for v in VERT_TRANSFORMS.values()) >= 89


def test_registry_parity_holds():
    """175/176 pj_list ops constructible (pipeline is the 176th)."""
    from proj_4_spark.engine.plan import _registry

    assert len(_registry()) >= 175


def test_r6_twin_roster_and_text_formats():
    """r6 ratchets: the datum-pipeline twin, the widened inverse-twin
    roster, and the full CRS-text surface (WKT2 incl. BOUNDCRS, ESRI
    WKT1, PROJJSON) stay wired."""
    from proj_4_spark.engine.plan import create_operation
    from proj_4_spark.engine.spark import (
        _datum_jvm_legs,
        _inv_jvm_fast_path_ok,
    )

    op = create_operation(
        "+proj=pipeline +ellps=GRS80 +step +proj=cart "
        "+step +proj=helmert +x=1 +step +proj=cart +inv")
    assert _datum_jvm_legs(op, "fwd") is not None
    assert _datum_jvm_legs(op, "inv") is not None

    inv_twins = (
        "+proj=webmerc +ellps=WGS84",
        "+proj=merc +R=6371000",
        "+proj=eqc +ellps=WGS84",
        "+proj=cea +ellps=WGS84",       # ellipsoidal authlat series
        "+proj=laea +R=6371000 +lat_0=52",  # ellipsoidal laea moved to
        # the STAGED twin in r8 (its Column tree's 64 KB method ran
        # interpreted); asserted in the r8 block below
        "+proj=stere +R=6371000 +lat_0=90",
        "+proj=sinu +R=6371000",
        "+proj=eqdc +R=6371000 +lat_1=20 +lat_2=60",
        "+proj=cass +R=6371000",
        "+proj=ortho +R=6371000 +lat_0=40",
        "+proj=gnom +R=6371000",
    )
    for ps in inv_twins:
        assert _inv_jvm_fast_path_ok(create_operation(ps), "inv"), ps

    # fwd twin roster (15 families) keeps compiling
    fwd_twins = ("webmerc", "merc", "eqc", "cea", "lcc", "aea", "leac",
                 "stere", "ups", "laea", "sterea", "somerc", "krovak",
                 "sinu", "eqdc", "eqearth", "cass", "ortho", "gnom")
    from proj_4_spark.engine.spark import _webmerc_jvm_fast_path_ok

    ex = {"lcc": " +lat_1=33 +lat_2=45", "aea": " +lat_1=29 +lat_2=45",
          "leac": " +lat_1=29", "eqdc": " +lat_1=20 +lat_2=60",
          "krovak": "", "somerc": ""}
    for name in fwd_twins:
        ps = f"+proj={name} +ellps=GRS80" + ex.get(name, "")
        assert _webmerc_jvm_fast_path_ok(create_operation(ps), "fwd"), ps

    # CRS-text formats all dispatch through create_operation
    from proj_4_spark.sources.projjson import projstring_to_projjson
    import json

    assert create_operation(json.dumps(projstring_to_projjson(
        "proj=utm zone=32 ellps=WGS84"))).P.name == "utm"
    assert create_operation(
        'BOUNDCRS[SOURCECRS[GEOGCRS["g",DATUM["d",ELLIPSOID["e",'
        '6378137,298.257223563]]]],TARGETCRS[GEOGCRS["t",DATUM["d",'
        'ELLIPSOID["e",6378137,298.257223563]]]],'
        'ABRIDGEDTRANSFORMATION["a",METHOD["Geocentric translations '
        '(geog2D domain)",ID["EPSG",9603]],'
        'PARAMETER["X-axis translation",1],'
        'PARAMETER["Y-axis translation",2],'
        'PARAMETER["Z-axis translation",3]]]'
    ).P.params.get("towgs84") == "1,2,3,0,0,0,0"


def test_r7_iterative_inverse_twins_stay_wired():
    """r7 ratchet: the staged iterative-inverse twins (bounded phi2 /
    phi1 unroll with frozen-lane convergence) keep compiling for
    lcc / aea / leac (sphere + ellipsoid) and ellipsoidal merc; the
    remaining iterative families keep refusing (UDF path)."""
    from proj_4_spark.engine.plan import create_operation
    from proj_4_spark.engine.spark import _iter_inv_jvm_ok

    for ps in (
        "+proj=lcc +ellps=GRS80 +lat_1=33 +lat_2=45",
        "+proj=lcc +R=6371000 +lat_1=-33 +lat_2=-45",
        "+proj=aea +ellps=GRS80 +lat_1=29.5 +lat_2=45.5",
        "+proj=aea +R=6371000 +lat_1=29.5 +lat_2=45.5",
        "+proj=leac +ellps=WGS84 +lat_1=45",
        "+proj=merc +ellps=WGS84",
    ):
        assert _iter_inv_jvm_ok(create_operation(ps), "inv"), ps
    for ps in ("+proj=merc +R=6371000",          # closed-form r5 twin
               "+proj=moll +R=6371000",          # off-roster family
               "+proj=robin +R=6371000",
               # sterea measured out (0.64x the UDF path; see
               # _iter_inv_sql_ok)
               "+proj=sterea +lat_0=52.2 +lon_0=5.4 +k=0.9999079 "
               "+x_0=155000 +y_0=463000 +ellps=bessel"):
        assert not _iter_inv_jvm_ok(create_operation(ps), "inv"), ps
    # late r7: Poder-Engsager (utm roundtrips Python-free end to end),
    # ellipsoidal stere/ups and the eqearth Newton inverse join too
    for ps in ("+proj=utm +zone=32 +ellps=GRS80",
               "+proj=stere +ellps=WGS84 +lat_0=90 +lat_ts=70",
               "+proj=ups +ellps=WGS84",
               "+proj=eqearth +ellps=WGS84",
               "+proj=omerc +lat_0=4 +lonc=115 +alpha=53 "
               "+ellps=evrst69"):
        assert _iter_inv_jvm_ok(create_operation(ps), "inv"), ps
    # the omerc FORWARD has its own staged twin
    from proj_4_spark.engine.spark import _omerc_fwd_jvm_ok

    assert _omerc_fwd_jvm_ok(create_operation(
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53 +ellps=evrst69"),
        "fwd")
    # geos forward stays a closed-form column twin; its INVERSE (and
    # the ellipsoidal laea inverse) moved to the STAGED twin in r8 —
    # the raw Column trees produced a janino compile failure (geos,
    # ~22.8k-line method, silent interpreted fallback) resp. a 64,030-
    # byte method 8x over the HotSpot JIT ceiling (laea); both are now
    # served by _emit_iter_inv_kernel and gated by the codegen-health
    # test in tests/test_plans.py
    from proj_4_spark.engine.spark import (
        _inv_jvm_fast_path_ok,
        _webmerc_jvm_fast_path_ok as _fwd_ok,
    )

    geos = create_operation("+proj=geos +h=35785831.0 +ellps=GRS80")
    assert _fwd_ok(geos, "fwd")
    assert not _inv_jvm_fast_path_ok(geos, "inv")
    assert _iter_inv_jvm_ok(geos, "inv")
    laea_e = create_operation("+proj=laea +ellps=GRS80 +lat_0=52")
    assert not _inv_jvm_fast_path_ok(laea_e, "inv")
    assert _iter_inv_jvm_ok(laea_e, "inv")
    # spherical laea keeps the closed-form column twin
    assert _inv_jvm_fast_path_ok(
        create_operation("+proj=laea +R=6371000 +lat_0=52"), "inv")

    # the COMPOSED datum-modified inverse accepts the iterative
    # families too (+towgs84 conic zone inverses run Python-free)
    from proj_4_spark.engine.spark import _datum_modified_jvm_ok

    assert _datum_modified_jvm_ok(create_operation(
        "+proj=lcc +lat_1=49 +lat_2=77 +ellps=clrk66 "
        "+towgs84=-10,158,187"), "inv")
    assert _datum_modified_jvm_ok(create_operation(
        "+proj=merc +ellps=GRS80 +towgs84=1,2,3"), "inv")

    # r7 late roster: inv_mlfn twins (ellipsoidal eqdc/sinu/cass)
    for ps in ("+proj=eqdc +ellps=GRS80 +lat_1=20 +lat_2=60",
               "+proj=sinu +ellps=WGS84",
               "+proj=cass +ellps=GRS80"):
        assert _iter_inv_jvm_ok(create_operation(ps), "inv"), ps

    # moll family: closed-form inverse column twins + the staged
    # Newton forward (late r7)
    from proj_4_spark.engine.spark import _moll_fwd_jvm_ok

    for nm in ("moll", "wag4", "wag5"):
        op_m = create_operation(f"+proj={nm} +R=6371000")
        assert _inv_jvm_fast_path_ok(op_m, "inv"), nm
        assert _moll_fwd_jvm_ok(op_m, "fwd"), nm
