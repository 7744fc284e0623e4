"""Replay the reference's gie regression corpus (SURVEY.md §5).

Every case whose operation our engine supports must pass the reference's
own tolerance (geodesic/Euclidean meters, src/apps/gie.cpp:1017-1020).
Unsupported long-tail projections are counted, not failed.
"""

import os

import pytest

from proj_4_spark.gie import run_file, summarize

GIE_DIR = "/root/reference/test/gie"
GIGS_DIR = "/root/reference/test/gigs"

# (file, minimum passes we lock in — ratchet upward as coverage grows)
CORPUS = [
    ("4D-API_cs2cs-style.gie", 71),
    ("DHDN_ETRS89.gie", 64),
    ("GDA.gie", 3),
    ("adams_hemi.gie", 703),
    ("adams_ws1.gie", 703),
    ("adams_ws2.gie", 724),
    ("axisswap.gie", 21),
    ("builtins.gie", 1886),
    ("defmodel.gie", 29),
    ("deformation.gie", 36),
    ("ellipsoid.gie", 22),
    ("geotiff_grids.gie", 47),
    ("guyou.gie", 705),
    ("more_builtins.gie", 143),
    ("peirce_q.gie", 391),
    ("tinshift.gie", 8),
    ("unitconvert.gie", 8),
]


# GIGS suite (Geospatial Integrity of Geoscience Software): resolves
# `+init=epsg:` via the static preset catalog in sources/initfiles.py.
# Only the files the reference itself runs (non-.failing) are replayed.
GIGS_CORPUS = [
    ("5101.1-jhs.gie", 177), ("5101.2-jhs.gie", 69), ("5101.3-jhs.gie", 69),
    ("5101.4-jhs-etmerc.gie", 69), ("5102.1.gie", 57), ("5103.1.gie", 60),
    ("5103.2.gie", 30), ("5103.3.gie", 30), ("5104.gie", 60),
    ("5105.2.gie", 36), ("5106.gie", 69), ("5107.gie", 39),
    ("5109.gie", 39), ("5111.1.gie", 105), ("5112.gie", 15),
    ("5113.gie", 15), ("5201.gie", 81), ("5208.gie", 42),
]


def _replay(path, min_pass):
    s = summarize(run_file(path))
    assert s["fail"] == 0, "\n".join(s["failures"][:20])
    assert s["pass"] >= min_pass, f"pass count regressed: {s['pass']} < {min_pass}"


@pytest.mark.parametrize("fname,min_pass", CORPUS)
def test_gie_file(fname, min_pass):
    _replay(os.path.join(GIE_DIR, fname), min_pass)


@pytest.mark.parametrize("fname,min_pass", GIGS_CORPUS)
def test_gigs_file(fname, min_pass):
    _replay(os.path.join(GIGS_DIR, fname), min_pass)
