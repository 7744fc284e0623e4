"""`+init=FILE:KEY` preset resolution.

Two layers, mirroring the reference:

1. Init FILES (pj_init semantics, src/init.cpp): `+init=nad27:3901` reads
   the `<3901> ... <>` section of the `nad27` file shipped in the
   reference data directory.  Sections are whitespace-separated
   proj-string fragments; expanded params have LOWER precedence than
   explicit ones (init.cpp appends them to the paralist, and lookup is
   first-wins).

2. A minimal built-in `epsg:` catalog.  The reference resolves
   `+init=epsg:XXXX` through its SQLite CRS database; the database layer
   is out of scope here (SURVEY.md §7.7), so the well-known formulaic
   families (WGS84/NAD83/ETRS89 UTM zones, web mercator, geographic) are
   synthesized directly.  Anything else stays `unsupported`.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

INIT_SEARCH_PATHS = [
    "/root/reference/data",
]

_KNOWN_INIT_FILES = {
    "nad27", "nad83", "world", "other.extra", "GL27", "CH",
    "ITRF2000", "ITRF2008", "ITRF2014",
}


@lru_cache(maxsize=64)
def _read_init_file(name: str) -> dict[str, str]:
    """Parse an init file into {key: projstring-fragment}."""
    path = None
    for d in INIT_SEARCH_PATHS:
        cand = os.path.join(d, name)
        if os.path.exists(cand):
            path = cand
            break
    if path is None:
        raise FileNotFoundError(name)
    text = open(path, encoding="utf-8", errors="replace").read()
    # strip comments
    text = re.sub(r"#.*", "", text)
    out: dict[str, str] = {}
    for m in re.finditer(r"<([^<>\s]+)>(.*?)<>", text, flags=re.S):
        out[m.group(1)] = " ".join(m.group(2).split())
    return out


def _epsg_builtin(code: int) -> str | None:
    """Formulaic EPSG families (public EPSG dataset definitions)."""
    if code == 3857:
        return ("proj=webmerc datum=WGS84 units=m no_defs")
    if code == 4326:
        return "proj=longlat datum=WGS84 no_defs"
    if 32601 <= code <= 32660:  # WGS 84 / UTM north
        return f"proj=utm zone={code - 32600} datum=WGS84 units=m no_defs"
    if 32701 <= code <= 32760:  # WGS 84 / UTM south
        return f"proj=utm zone={code - 32700} south datum=WGS84 units=m no_defs"
    if 26901 <= code <= 26923:  # NAD83 / UTM
        return f"proj=utm zone={code - 26900} datum=NAD83 units=m no_defs"
    if 25828 <= code <= 25838:  # ETRS89 / UTM
        return (f"proj=utm zone={code - 25800} ellps=GRS80 "
                "towgs84=0,0,0,0,0,0,0 units=m no_defs")
    return None


def resolve_init(spec: str) -> str:
    """Return the proj-string fragment for an `+init=` spec.

    Raises KeyError (unknown key), FileNotFoundError (unknown file) or
    LookupError (epsg code outside the built-in families).
    """
    if ":" not in spec:
        raise KeyError(f"malformed init spec: {spec!r}")
    fname, key = spec.split(":", 1)
    if fname.lower() == "epsg":
        frag = _epsg_builtin(int(key))
        if frag is None:
            raise LookupError(f"epsg:{key} not in built-in catalog")
        return frag
    if fname not in _KNOWN_INIT_FILES:
        # try anyway: user-supplied init file living in the search path
        pass
    sections = _read_init_file(fname)
    if key not in sections:
        raise KeyError(f"{fname}:{key}")
    return sections[key]
