"""OSM JSON reader kernels (JsonReader.java semantics)."""

import json

import numpy as np
import pytest

from osm2world_ray.sources.osm_json import (
    normalize_version,
    parse_osm_json,
    write_synth_shards,
)


def test_version_normalization_both_dialects():
    assert '"version": "0.6"' in normalize_version('{"version": 0.6}')
    assert '"version": "0.6"' in normalize_version('{"version"  :  0.6}')
    # already-quoted stays intact
    assert normalize_version('{"version": "0.6"}') == '{"version": "0.6"}'


def test_unsupported_version_fails():
    with pytest.raises(ValueError, match="Unsupported OSM JSON version"):
        parse_osm_json('{"version": 0.7, "elements": []}')


def test_element_dispatch():
    doc = {
        "version": "0.6",
        "elements": [
            {"type": "node", "id": 1, "lat": 48.5, "lon": 13.4,
             "tags": {"natural": "tree"}},
            {"type": "way", "id": 2, "nodes": [1, 1], "tags": {}},
            {"type": "relation", "id": 3,
             "members": [{"type": "way", "ref": 2, "role": "outer"}],
             "tags": {"type": "multipolygon"}},
        ],
    }
    nodes, ways, rels = parse_osm_json(json.dumps(doc))
    assert nodes == [(1, 48.5, 13.4, {"natural": "tree"})]
    assert ways == [(2, [1, 1], {})]
    assert rels == [(3, [("way", 2, "outer")], {"type": "multipolygon"})]


def test_invalid_member_type_fails():
    doc = {"version": "0.6", "elements": [
        {"type": "relation", "id": 1,
         "members": [{"type": "area", "ref": 9, "role": ""}]}]}
    with pytest.raises(ValueError, match="Invalid member type"):
        parse_osm_json(json.dumps(doc))


def test_unsupported_element_type_fails():
    doc = {"version": "0.6", "elements": [{"type": "changeset", "id": 1}]}
    with pytest.raises(ValueError, match="Unsupported OSM element type"):
        parse_osm_json(json.dumps(doc))


def test_shards_round_trip_exact_floats(tmp_path):
    paths = write_synth_shards(np.arange(10, dtype=np.int64), str(tmp_path),
                               docs_per_shard=4)
    assert len(paths) == 3
    from osm2world_ray.sources import synth

    total_nodes = 0
    for i, p in enumerate(paths):
        text = open(p).read()
        if i % 2 == 1:
            assert '"version": 0.6' in text  # numeric dialect
        nodes, ways, rels = parse_osm_json(text)
        total_nodes += len(nodes)
        for nid, lat, lon, _tags in nodes:
            d, j = nid // 4, nid % 4
            elat, elon = synth.mention_latlon(np.array([d]), np.array([j]))
            assert lat == elat[0] and lon == elon[0]  # bit-exact round trip
    assert total_nodes == sum(int(d % 3) + 1 for d in range(10))


def test_xml_reader_agrees_with_json_reader(tmp_path):
    """Both dialect readers must produce identical entities for the
    same synthetic docs (float round-trip via repr serialization)."""
    import numpy as np
    from osm2world_ray.sources.osm_json import parse_osm_json, write_synth_shards
    from osm2world_ray.sources.osm_xml import parse_osm_xml, write_synth_xml_shards

    ids = np.arange(12, dtype=np.int64)
    jp = write_synth_shards(ids, str(tmp_path / "j"), docs_per_shard=5)
    xp = write_synth_xml_shards(ids, str(tmp_path / "x"), docs_per_shard=5)
    jn, jw, jr = [], [], []
    for p in jp:
        n, w, r = parse_osm_json(open(p).read())
        jn += n; jw += w; jr += r
    xn, xw, xr = [], [], []
    for p in xp:
        n, w, r = parse_osm_xml(open(p).read())
        xn += n; xw += w; xr += r
    assert sorted(jn) == sorted(xn)
    assert sorted(jw) == sorted(xw)
    assert sorted(jr) == sorted(xr)


def test_xml_fault_semantics():
    import pytest
    from osm2world_ray.sources.osm_xml import parse_osm_xml

    with pytest.raises(ValueError, match="version"):
        parse_osm_xml('<osm version="0.5"></osm>')
    with pytest.raises(ValueError, match="Invalid member type"):
        parse_osm_xml(
            '<osm version="0.6"><relation id="1">'
            '<member type="area" ref="2" role=""/></relation></osm>'
        )
    # bounds metadata is skipped, not an error
    n, w, r = parse_osm_xml(
        '<osm version="0.6"><bounds minlat="0" minlon="0" maxlat="1" maxlon="1"/></osm>'
    )
    assert (n, w, r) == ([], [], [])


def test_xml_compressed_shard_parity(tmp_path):
    """Suffix-sniffed gz/bz2 shards (OSMStreamReader.java:55-66 rule)
    decode to the exact same entities as the uncompressed write."""
    import numpy as np
    from osm2world_ray.sources.osm_xml import (
        parse_osm_xml, sniff_decompress, write_synth_xml_shards)

    ids = np.arange(40, dtype=np.int64)
    plain = write_synth_xml_shards(ids, str(tmp_path / "p"), docs_per_shard=5)
    mixed = write_synth_xml_shards(ids, str(tmp_path / "m"), docs_per_shard=5,
                                   compress_mix=True)
    suffixes = {p.rsplit("shard", 1)[1] for p in mixed}
    assert any(s.endswith(".gz") for s in suffixes)
    assert any(s.endswith(".bz2") for s in suffixes)
    for pp, mp in zip(plain, mixed):
        raw = sniff_decompress(mp, open(mp, "rb").read())
        assert raw == open(pp, "rb").read()
        parse_osm_xml(raw.decode("utf-8"))  # well-formed after decode
