"""TrafficSignIdentifier parity — mirrors the reference test class
(``TrafficSignIdentifierTest.java:13-42``) on the scalar reference AND
checks the vectorized batch kernel row-for-row against it."""

import numpy as np
import pyarrow as pa

from osm2world_ray.functions.traffic_signs import (
    parse_signs_batch,
    parse_traffic_sign_value,
)
from osm2world_ray.sources.synth import traffic_sign_values


def test_human_readable_value():
    r = parse_traffic_sign_value("city_limit")[0]
    assert r["country"] is None
    assert r["sign"] == "city_limit"
    assert r["bracket_text"] is None
    assert r["sub_type"] is None
    assert r["config_key"] == "SIGN_CITY_LIMIT"
    assert r["config_key_wo"] == "SIGN_CITY_LIMIT"


def test_complex_value():
    r = parse_traffic_sign_value("DE:327-50[800]")[0]
    assert r["country"] == "DE"
    assert r["sign"] == "327-50"
    assert r["bracket_text"] == "800"
    assert r["sub_type"] == "50"
    assert r["config_key"] == "SIGN_DE_327_50"
    assert r["config_key_wo"] == "SIGN_DE_327"


def test_multiple_values():
    rs = parse_traffic_sign_value("DE:260,1020-30; 265[3.8] ")
    assert len(rs) == 3
    assert (rs[0]["country"], rs[0]["sign"]) == ("DE", "260")
    assert (rs[1]["sign"], rs[1]["sub_type"]) == ("1020-30", "30")
    assert (rs[2]["sign"], rs[2]["bracket_text"]) == ("265", "3.8")


def test_replace_double_removal():
    # type digits start with the sub-type digits: String.replace removes
    # BOTH occurrences of "_50" from "SIGN_DE_503_50"
    r = parse_traffic_sign_value("DE:503-50")[0]
    assert r["config_key"] == "SIGN_DE_503_50"
    assert r["config_key_wo"] == "SIGN_DE3"


def test_batch_kernel_matches_scalar():
    cases = [
        "city_limit", "DE:327-50[800]", "DE:260,1020-30; 265[3.8] ", "",
        "stop;give_way", "US:R1-9a", "DE:503-50", "a[1]x[2]", "GB:956",
        ":260", "x;;y", "x;;", "FI:362[50]",
    ] + list(traffic_sign_values(np.arange(100)))
    got = parse_signs_batch(
        np.arange(len(cases)), pa.array(cases)
    ).to_pylist()
    want = []
    for d, v in enumerate(cases):
        for i, r in enumerate(parse_traffic_sign_value(v)):
            want.append(
                {
                    "doc_id": d,
                    "sign_idx": i,
                    "country": r["country"] or "",
                    "sign": r["sign"],
                    "bracket_text": r["bracket_text"] or "",
                    "sub_type": r["sub_type"] or "",
                    "config_key": r["config_key"],
                    "config_key_wo": r["config_key_wo"],
                }
            )
    assert got == want
