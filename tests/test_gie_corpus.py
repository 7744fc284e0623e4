"""Replay the reference's gie regression corpus (SURVEY.md §5).

Every case whose operation our engine supports must pass the reference's
own tolerance (geodesic/Euclidean meters, src/apps/gie.cpp:1017-1020).
Unsupported long-tail projections are counted, not failed.
"""

import os

import pytest

from proj_4_spark.gie import run_file, summarize

GIE_DIR = "/root/reference/test/gie"

# (file, minimum passes we lock in — ratchet upward as coverage grows)
CORPUS = [
    ("4D-API_cs2cs-style.gie", 64),
    ("DHDN_ETRS89.gie", 64),
    ("GDA.gie", 3),
    ("adams_hemi.gie", 703),
    ("adams_ws1.gie", 703),
    ("adams_ws2.gie", 724),
    ("axisswap.gie", 21),
    ("builtins.gie", 1881),
    ("defmodel.gie", 29),
    ("deformation.gie", 18),
    ("ellipsoid.gie", 22),
    ("geotiff_grids.gie", 47),
    ("guyou.gie", 705),
    ("more_builtins.gie", 134),
    ("peirce_q.gie", 391),
    ("tinshift.gie", 8),
    ("unitconvert.gie", 8),
]


@pytest.mark.parametrize("fname,min_pass", CORPUS)
def test_gie_file(fname, min_pass):
    path = os.path.join(GIE_DIR, fname)
    results = run_file(path)
    s = summarize(results)
    assert s["fail"] == 0, "\n".join(s["failures"][:20])
    assert s["pass"] >= min_pass, f"pass count regressed: {s['pass']} < {min_pass}"
