"""OSM-style tag-value parsers, semantics-identical to the reference's
``ValueParseUtil`` (``core/.../util/ValueParseUtil.java:18-490``) and
``O2WConfig.parseColorTuple`` (``O2WConfig.java:259-293``).

Rules carried over exactly:

- null (None) on any syntax error, never an exception
  (``FaultTolerantIterationUtil`` discipline);
- integer parsing is Java ``Integer.parseInt``: optional sign, digits
  only, 32-bit bounds — no whitespace, no underscores;
- decimal parsing is the two-int scheme of ``parseOsmDecimal``
  (``ValueParseUtil.java:87-131``): int part and fraction part each
  parsed as 32-bit ints, recombined as ``abs(before) +
  10^-len(after) * after``;
- unit constants keep the reference's float32 quirks:
  ``KM_PER_MILE = 1.609344f`` and ``M_PER_INCH = 0.0254f`` are float
  literals widened to double (``ValueParseUtil.java:146,201``), so we
  use ``float64(float32(x))``; ``M_PER_MI = 1609.344`` is a true
  double;
- ``parseColor`` follows ``java.awt.Color.decode`` =
  ``Integer.decode``: ``#``/``0x`` hex, leading-0 octal, plain
  decimal, 32-bit bounds;
- ``parse_color_tuple`` replicates ``Color.getHSBColor`` (AWT
  HSBtoRGB) in float32 arithmetic.

These are per-value functions; batch pipelines wrap them in
``map_batches`` with the compiled regexes living at module scope
(compiled once per worker process).
"""

from __future__ import annotations

import math
import re

import numpy as np

INT32_MIN, INT32_MAX = -(1 << 31), (1 << 31) - 1

_INT_RE = re.compile(r"^[+-]?\d+$")
_DEC_POINT_RE = re.compile(r"^(-?\d+)\.(\d+)$")
_KMH_RE = re.compile(r"^(\d+)\s*km/h$")
_MPH_RE = re.compile(r"^(\d+)\s*mph$")
_M_RE = re.compile(r"^([\d\.]+)\s*m$")
_KM_RE = re.compile(r"^([\d\.]+)\s*km$")
_MI_RE = re.compile(r"^([\d\.]+)\s*mi$")
_FEET_INCHES_RE = re.compile(r"^(\d+)'\s*(\d+)\"")
_T_RE = re.compile(r"^([\d\.]+)\s*t$")
_INCLINE_RE = re.compile(r"^(-?\d+(?:\.\d+)?)\s*%$")
_LEVEL_RANGE_RE = re.compile(r"([-]?\d+)-([-]?\d+)")
_HSV_TUPLE_RE = re.compile(
    r"^hsv\s*\(\s*(\d{1,3})\s*,\s*(\d{1,3})\s*%\s*,\s*(\d{1,3})\s*%\s*\)"
)

KM_PER_MILE = float(np.float64(np.float32(1.609344)))
M_PER_MI = 1609.344
M_PER_INCH = float(np.float64(np.float32(0.0254)))

POSITIVE = lambda v: v > 0  # noqa: E731
NONNEGATIVE = lambda v: v >= 0  # noqa: E731


def _java_parse_int(s: str) -> int | None:
    """Integer.parseInt: sign + digits, 32-bit bounds, else None."""
    if s is None or not _INT_RE.match(s):
        return None
    v = int(s)
    if not (INT32_MIN <= v <= INT32_MAX):
        return None
    return v


def parse_uint(value: str | None) -> int | None:
    v = _java_parse_int(value) if value is not None else None
    return v if v is not None and v >= 0 else None


def parse_int(value: str | None) -> int | None:
    return _java_parse_int(value) if value is not None else None


def parse_osm_decimal(value: str | None, constraint=None) -> float | None:
    if value is None:
        return None
    v = _java_parse_int(value)
    if v is not None:
        r = float(v)
        if constraint is None or constraint(r):
            return r
    m = _DEC_POINT_RE.match(value)
    if m:
        before_s, after_s = m.group(1), m.group(2)
        before = _java_parse_int(before_s)
        after = _java_parse_int(after_s)
        if before is not None and after is not None:
            r = abs(float(before)) + math.pow(10, -len(after_s)) * after
            if before_s.startswith("-"):
                r = -r
            if constraint is None or constraint(r):
                return r
    return None


def parse_speed(value: str | None) -> float | None:
    """Speed in km/h (``ValueParseUtil.java:153-192``)."""
    if value is None:
        return None
    v = parse_osm_decimal(value, POSITIVE)
    if v is not None:
        return v
    m = _KMH_RE.match(value)
    if m:
        i = _java_parse_int(m.group(1))
        if i is not None:
            return float(i)
    m = _MPH_RE.match(value)
    if m:
        i = _java_parse_int(m.group(1))
        if i is not None:
            return KM_PER_MILE * i
    return None


def parse_measure(value: str | None, unitless_factor: float = 1.0) -> float | None:
    """Measure in meters (``ValueParseUtil.java:211-276``). The
    reference NPE-crashes on values like "1.2.3km"; we return None
    (per-row fault tolerance wins over bug parity)."""
    if value is None:
        return None
    v = parse_osm_decimal(value, POSITIVE)
    if v is not None:
        return v * unitless_factor
    m = _M_RE.match(value)
    if m:
        return parse_osm_decimal(m.group(1), POSITIVE)
    m = _KM_RE.match(value)
    if m:
        km = parse_osm_decimal(m.group(1), POSITIVE)
        return None if km is None else 1000 * km
    m = _MI_RE.match(value)
    if m:
        mi = parse_osm_decimal(m.group(1), POSITIVE)
        return None if mi is None else M_PER_MI * mi
    m = _FEET_INCHES_RE.match(value)
    if m:
        feet = _java_parse_int(m.group(1))
        inches = _java_parse_int(m.group(2))
        if (feet is not None and inches is not None
                and feet >= 0 and 0 <= inches < 12):
            return M_PER_INCH * (12 * feet + inches)
    return None


def parse_weight(value: str | None) -> float | None:
    """Weight in tonnes (``ValueParseUtil.java:286-316``)."""
    if value is None:
        return None
    v = parse_osm_decimal(value, POSITIVE)
    if v is not None:
        return v
    m = _T_RE.match(value)
    if m:
        return parse_osm_decimal(m.group(1), POSITIVE)
    return None


def parse_incline(value: str | None) -> float | None:
    """Incline in percent (``ValueParseUtil.java:324-341``)."""
    if value is None:
        return None
    m = _INCLINE_RE.match(value)
    if m:
        return parse_osm_decimal(m.group(1), None)
    return None


_CARDINALS = {
    "N": 0.0, "NNE": 22.5, "NE": 45.0, "ENE": 67.5,
    "E": 90.0, "ESE": 112.5, "SE": 135.0, "SSE": 157.5,
    "S": 180.0, "SSW": 202.5, "SW": 225.0, "WSW": 247.5,
    "W": 270.0, "WNW": 292.5, "NW": 315.0, "NNW": 337.5,
}


def parse_angle(value: str | None) -> float | None:
    """Angle in degrees from north, [0, 360) (``ValueParseUtil.java:349-391``)."""
    if value is None:
        return None
    v = parse_osm_decimal(value, NONNEGATIVE)
    if v is not None:
        return v % 360
    return _CARDINALS.get(value)


def _java_integer_decode(s: str) -> int | None:
    """Integer.decode: [sign](0x|0X|#|0)digits, 32-bit bounds."""
    if not s:
        return None
    sign = 1
    body = s
    if body[0] in "+-":
        sign = -1 if body[0] == "-" else 1
        body = body[1:]
    if body[:2] in ("0x", "0X"):
        base, digits = 16, body[2:]
    elif body[:1] == "#":
        base, digits = 16, body[1:]
    elif body.startswith("0") and len(body) > 1:
        base, digits = 8, body[1:]
    else:
        base, digits = 10, body
    if not digits:
        return None
    allowed = {16: "0123456789abcdefABCDEF", 8: "01234567", 10: "0123456789"}[base]
    if any(c not in allowed for c in digits):
        return None
    v = sign * int(digits, base)
    if not (INT32_MIN <= v <= INT32_MAX):
        return None
    return v


def parse_color(value: str | None) -> tuple[int, int, int] | None:
    """Hex/octal/decimal color -> (r, g, b) (``Color.decode`` semantics,
    ``ValueParseUtil.java:421-429``)."""
    if value is None:
        return None
    i = _java_integer_decode(value)
    if i is None:
        return None
    return ((i >> 16) & 0xFF, (i >> 8) & 0xFF, i & 0xFF)


def parse_color_named(value: str | None, names: dict[str, tuple[int, int, int]]
                      ) -> tuple[int, int, int] | None:
    """Named-color variant (``ValueParseUtil.java:404-415``): OSM
    underscore names normalized by deletion, then lowercase lookup,
    falling back to ``parse_color``."""
    if value is None:
        return None
    normalized = value.replace("_", "").lower()
    if normalized in names:
        return names[normalized]
    return parse_color(value)


def _hsb_to_rgb(hue: float, saturation: float, brightness: float
                ) -> tuple[int, int, int]:
    """java.awt.Color.HSBtoRGB in float32 arithmetic."""
    f32 = np.float32
    hue, saturation, brightness = f32(hue), f32(saturation), f32(brightness)
    if saturation == 0:
        v = int(brightness * f32(255.0) + f32(0.5))
        return (v, v, v)
    h = (hue - f32(np.floor(hue))) * f32(6.0)
    f = h - f32(np.floor(h))
    p = brightness * (f32(1.0) - saturation)
    q = brightness * (f32(1.0) - saturation * f)
    t = brightness * (f32(1.0) - saturation * (f32(1.0) - f))
    br = int(brightness * f32(255.0) + f32(0.5))
    pi = int(p * f32(255.0) + f32(0.5))
    qi = int(q * f32(255.0) + f32(0.5))
    ti = int(t * f32(255.0) + f32(0.5))
    case = int(h)
    return [
        (br, ti, pi), (qi, br, pi), (pi, br, ti),
        (pi, qi, br), (ti, pi, br), (br, pi, qi),
    ][case]


def parse_color_tuple(value: str | None) -> tuple[int, int, int] | None:
    """"hsv(h,s%,v%)" -> (r, g, b) (``O2WConfig.java:259-293``)."""
    if value is None:
        return None
    m = _HSV_TUPLE_RE.match(value)
    if not m:
        return None
    v1 = _java_parse_int(m.group(1))
    v2 = _java_parse_int(m.group(2))
    v3 = _java_parse_int(m.group(3))
    if None in (v1, v2, v3):
        return None
    f32 = np.float32
    return _hsb_to_rgb(
        float(f32(v1) / f32(360.0)), float(f32(v2) / f32(100.0)),
        float(f32(v3) / f32(100.0))
    )


def parse_levels(value: str | None) -> list[int] | None:
    """Simple Indoor Tagging levels (``ValueParseUtil.java:439-489``):
    ranges + semicolons, whitespace stripped, sorted, deduped; None if
    nothing parses."""
    if value is None:
        return None
    result: list[int] = []
    for level_range in re.sub(r"\s+", "", value).split(";"):
        m = _LEVEL_RANGE_RE.fullmatch(level_range)
        if m:
            a = _java_parse_int(m.group(1))
            b = _java_parse_int(m.group(2))
            if a is None or b is None:
                continue
            lo, hi = min(a, b), max(a, b)
            result.extend(range(lo, hi + 1))
        else:
            v = _java_parse_int(level_range)
            if v is not None:
                result.append(v)
    if not result:
        return None
    return sorted(set(result))
