"""Ports of the reference's ValueParseUtilTest golden values
(core-jvm/src/test/java/org/osm2world/util/ValueParseUtilTest.java)."""

import pytest

from osm2world_ray.functions import parsers as P


def close(a, b, tol=0.001):
    return a is not None and abs(a - b) <= tol


def test_parse_uint():
    assert P.parse_uint("5") == 5
    assert P.parse_uint("0") == 0
    assert P.parse_uint("-5") is None
    assert P.parse_uint("1.5") is None
    assert P.parse_uint("foobar") is None
    assert P.parse_uint(None) is None
    assert P.parse_uint("1_0") is None  # Java rejects underscores
    assert P.parse_uint(" 5") is None


def test_parse_speed():
    assert close(P.parse_speed("50"), 50)
    assert close(P.parse_speed("30 km/h"), 30)
    assert close(P.parse_speed("100km/h"), 100)
    assert close(P.parse_speed("25mph"), 40.234)
    assert close(P.parse_speed("25 mph"), 40.234)
    assert P.parse_speed(None) is None
    assert P.parse_speed("lightspeed") is None
    # the f-literal quirk: 25 * (double)1.609344f, not 25 * 1.609344
    assert P.parse_speed("25mph") == 25 * float(__import__("numpy").float64(
        __import__("numpy").float32(1.609344)))


def test_parse_measure():
    assert close(P.parse_measure("3.5"), 3.5)
    assert close(P.parse_measure("2m"), 2)
    assert close(P.parse_measure("5.5 m"), 5.5)
    assert close(P.parse_measure("1 km"), 1000)
    assert close(P.parse_measure("7.2km"), 7200)
    assert close(P.parse_measure("1 mi"), 1609.344)
    assert close(P.parse_measure("12'0\""), 3.6576)
    assert close(P.parse_measure("6' 6\""), 1.9812)
    assert P.parse_measure(None) is None
    assert P.parse_measure("very long") is None
    assert P.parse_measure("6' 16\"") is None


def test_parse_weight():
    assert close(P.parse_weight("3.6"), 3.6)
    assert close(P.parse_weight("30t"), 30)
    assert close(P.parse_weight("3.5 t"), 3.5)
    assert P.parse_weight(None) is None
    assert P.parse_weight("heavy") is None


def test_parse_incline():
    assert close(P.parse_incline("10%"), 10)
    assert close(P.parse_incline("-5.5 %"), -5.5)
    assert P.parse_incline("steep") is None
    assert P.parse_incline(None) is None


def test_parse_angle():
    assert close(P.parse_angle("47"), 47)
    assert close(P.parse_angle("360"), 0)
    assert close(P.parse_angle("N"), 0.0)
    assert close(P.parse_angle("SW"), 225.0)
    assert close(P.parse_angle("ESE"), 112.5)
    assert P.parse_angle(None) is None
    assert P.parse_angle("forward") is None
    assert P.parse_angle("-90") is None


def test_parse_color():
    assert P.parse_color("#ff0000") == (255, 0, 0)
    assert P.parse_color("#010203") == (1, 2, 3)
    assert P.parse_color("#") is None
    assert P.parse_color("ff0000") is None
    assert P.parse_color(None) is None
    # Integer.decode also takes decimal and octal
    assert P.parse_color("16711680") == (255, 0, 0)
    assert P.parse_color("0x0A0B0C") == (10, 11, 12)


def test_parse_color_named():
    css = {"red": (255, 0, 0), "lightblue": (173, 216, 230)}
    assert P.parse_color_named("red", css) == (255, 0, 0)
    assert P.parse_color_named("light_blue", css) == (173, 216, 230)
    assert P.parse_color_named("nosuchvalue", css) is None
    assert P.parse_color_named(None, css) is None


def test_parse_color_tuple():
    # java.awt.Color.getHSBColor golden values
    assert P.parse_color_tuple("hsv(0,100%,100%)") == (255, 0, 0)
    assert P.parse_color_tuple("hsv(120, 100%, 100%)") == (0, 255, 0)
    assert P.parse_color_tuple("hsv(240,100%,50%)") == (0, 0, 128)
    assert P.parse_color_tuple("hsv(0,0%,100%)") == (255, 255, 255)
    assert P.parse_color_tuple("rgb(1,2,3)") is None


@pytest.mark.parametrize(
    "value,expected",
    [
        ("-5", [-5]),
        ("13 - 14", [13, 14]),
        ("-1-3", [-1, 0, 1, 2, 3]),
        ("-4--3", [-4, -3]),
        ("6;5 ; 7", [5, 6, 7]),
        (" -3; 0-2 ;3", [-3, 0, 1, 2, 3]),
        ("3-1", [1, 2, 3]),
        ("0--1", [-1, 0]),
        ("-2-2; -1", [-2, -1, 0, 1, 2]),
        ("0-2;1-4", [0, 1, 2, 3, 4]),
        ("ground floor", None),
        ("5.5", None),
    ],
)
def test_parse_levels(value, expected):
    assert P.parse_levels(value) == expected


def test_parse_levels_null():
    assert P.parse_levels(None) is None
