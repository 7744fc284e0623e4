"""State Plane Coordinate System golden replay: every case of the
reference's test/cli/test27 + test83 (proj app over +init=nad27:KEY /
+init=nad83:KEY) against pj_out27.dist / pj_out83.dist, compared at the
CLIs' own %.3f us-ft print precision — 490 zone/point cases covering
~130 SPCS zones (lcc 2SP, tmerc, omerc AK-1, poly, aea).

Ops are created with emulation=False: the proj app goes through pj_init
(src/apps/proj.cpp:475), and cs2cs_emulation_setup runs only in
proj_create (src/4D_api.cpp:802) — the proj app never datum-shifts,
which is why the goldens show raw projection values.
"""

import re

import numpy as np
import pytest

from proj_4_spark.engine.plan import create_operation
from proj_4_spark.engine.projstring import dmstor

CLI = "/root/reference/test/cli"


def _parse(script_path, dist_path):
    script = open(script_path).read()
    cases = []
    blocks = re.findall(
        r"\$EXE \+units=us-ft \+init=\$\{INIT_FILE\}:(\w+)[^\n]*\n(.*?)\nEOF",
        script, re.S,
    )
    for key, body in blocks:
        for line in body.splitlines():
            line = line.strip()
            if line:
                cases.append((key, line))
    dist = [l for l in open(dist_path).read().splitlines() if l.strip()]
    assert len(cases) == len(dist)
    out = []
    for (key, inp), dl in zip(cases, dist):
        parts = dl.split("\t")
        gx, gy = parts[1], parts[2].split()[0]
        toks = inp.split()
        out.append((key, toks[0], toks[1], gx, gy))
    return out


@pytest.mark.parametrize("initfile,script,dist", [
    ("nad27", f"{CLI}/test27", f"{CLI}/pj_out27.dist"),
    ("nad83", f"{CLI}/test83", f"{CLI}/pj_out83.dist"),
])
def test_stateplane_golden(initfile, script, dist):
    cases = _parse(script, dist)
    opcache = {}
    failures = []
    for key, lon, lat, gx, gy in cases:
        ps = f"+units=us-ft +init={initfile}:{key}"
        if ps not in opcache:
            opcache[ps] = create_operation(ps, emulation=False)
        op = opcache[ps]
        x, y, _, _ = op.apply(
            np.array([dmstor(lon)]), np.array([dmstor(lat)]),
            np.zeros(1), np.zeros(1),
        )
        sx, sy = f"{x[0]:.3f}", f"{y[0]:.3f}"
        if sx != gx or sy != gy:
            failures.append((key, lon, lat, sx, sy, gx, gy))
    assert not failures, failures[:10]
    assert len(cases) >= 220
