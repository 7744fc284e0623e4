"""Coverage ratchets (VERDICT r3 #10): counts only go UP.

The gie corpus floors live in test_gie_corpus.py (hard fail==0 plus
per-file pass minimums); this file pins the driver-facing surface."""


def test_driver_query_count_monotone():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    qs = E.queries()
    os_ = E.oracle_sql()
    assert len(qs) >= 39, len(qs)
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
