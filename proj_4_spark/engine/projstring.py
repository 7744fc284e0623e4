"""Proj-string tokenizer and DMS parsing.

Reference: tokenization src/init.cpp:47-73,566-580 (+key=value ->
linked paralist; first occurrence wins); DMS parsing src/dmstor.cpp.
All plan-time, driver-side.
"""

from __future__ import annotations

import re

from proj_4_spark.kernels import common as C


def _shrink(s: str) -> str:
    """pj_shrink (src/internal.cpp:198-262): ';' counts as whitespace and
    '=' greedily consumes surrounding whitespace ('x = 1; y = 2' works)."""
    s = s.replace(";", " ")
    return re.sub(r"\s*=\s*", "=", s)


def parse_projstring(s: str) -> dict[str, str | None]:
    """Tokenize '+key=value +flag ...' into a dict (first occurrence wins,
    matching paralist lookup order, src/pj_param.cpp)."""
    params: dict[str, str | None] = {}
    for tok in _shrink(s).split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
        else:
            k, v = tok, None
        if k not in params:
            params[k] = v
    return params


def split_pipeline_steps(s: str) -> tuple[dict, list[dict]]:
    """Split a '+proj=pipeline ... +step ... +step ...' string into
    (global_params, [step_params...]); src/pipeline.cpp:423-520.

    Step params take precedence over pipeline globals (paralist append
    order: step args first, then globals).
    """
    parts = re.split(r"(?:^|\s)\+?step(?:\s|$)", _shrink(s))
    global_params = parse_projstring(parts[0])
    steps = [parse_projstring(p) for p in parts[1:] if p.strip()]
    return global_params, steps


_DMS_RE = re.compile(
    r"""^\s*
    (?P<sign>[+-])?
    (?:(?P<deg>\d+(?:\.\d*)?)(?:[dD°]|$|(?=[NSEWnsew'"0-9])))?
    (?:(?P<min>\d+(?:\.\d*)?)(?:['’]|$|(?=[NSEWnsew"0-9])))?
    (?:(?P<sec>\d+(?:\.\d*)?)["”]?)?
    (?P<hemi>[NSEWnsew])?
    \s*$""",
    re.VERBOSE,
)


def dmstor(s: str) -> float:
    """DMS or decimal-degree string -> radians; src/dmstor.cpp.

    Accepts: '12.5', '-12d30', "12d30'30.5\"", '12.5W', trailing 'r' for
    radians (dmstor.cpp 'r' suffix handling).
    """
    s = s.strip()
    if not s:
        return 0.0
    if s.endswith(("r", "R")) and not s[-2:-1].isalpha():
        try:
            return float(s[:-1])
        except ValueError:
            pass
    try:
        return float(s) * C.DEG_TO_RAD
    except ValueError:
        pass
    m = _DMS_RE.match(s)
    if not m or (m.group("deg") is None and m.group("min") is None and m.group("sec") is None):
        raise ValueError(f"cannot parse angle {s!r}")
    val = 0.0
    if m.group("deg"):
        val += float(m.group("deg"))
    if m.group("min"):
        val += float(m.group("min")) / 60.0
    if m.group("sec"):
        val += float(m.group("sec")) / 3600.0
    if m.group("sign") == "-":
        val = -val
    hemi = m.group("hemi")
    if hemi and hemi.upper() in ("S", "W"):
        val = -val
    return val * C.DEG_TO_RAD


# Prime meridians, src/datums.cpp pj_prime_meridians
PRIME_MERIDIANS: dict[str, str] = {
    "greenwich": "0dE",
    "lisbon": "9d07'54.862\"W",
    "paris": "2d20'14.025\"E",
    "bogota": "74d04'51.3\"W",
    "madrid": "3d41'16.58\"W",
    "rome": "12d27'8.4\"E",
    "bern": "7d26'22.5\"E",
    "jakarta": "106d48'27.79\"E",
    "ferro": "17d40'W",
    "brussels": "4d22'4.71\"E",
    "stockholm": "18d3'29.8\"E",
    "athens": "23d42'58.815\"E",
    "oslo": "10d43'22.5\"E",
}


def prime_meridian_rad(value: str) -> float:
    if value in PRIME_MERIDIANS:
        return dmstor(PRIME_MERIDIANS[value])
    return dmstor(value)


def rtodms(r: float, pos: str = "", neg: str = "", fract: int = 3) -> str:
    """Radians -> DMS string, matching the reference formatter exactly
    (src/rtodms.cpp:44-84): field rounding at 10^-fract arc-seconds,
    trailing zeros of the seconds stripped, and collapse to "DdM'" /
    "Dd" when seconds / minutes round to zero.  `pos`/`neg` are the
    hemisphere suffixes ('E'/'W', 'N'/'S'); with no suffixes a leading
    '-' marks negatives (cs2cs -E output convention)."""
    import math as _math

    res = 10.0 ** fract
    conv = 180.0 * 3600.0 * res / _math.pi
    prefix = ""
    if r < 0:
        r = -r
        if not pos:
            sign = ""
            prefix = "-"
        else:
            sign = neg
    else:
        sign = pos
    r = _math.floor(r * conv + 0.5)
    sec = _math.fmod(r / res, 60.0)
    r = _math.floor(r / (res * 60.0))
    mn = int(_math.fmod(r, 60.0))
    deg = int(_math.floor(r / 60.0))
    if sec != 0.0:
        s_sec = f"{sec:.{fract}f}".rstrip("0").rstrip(".")
        return f"{prefix}{deg}d{mn}'{s_sec}\"{sign}"
    if mn:
        return f"{prefix}{deg}d{mn}'{sign}"
    return f"{prefix}{deg}d{sign}"
