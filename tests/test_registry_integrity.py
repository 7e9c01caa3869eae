"""Registry integrity: every query has an oracle, the sampler priority
resolves, and output conventions hold at the surface level."""
import re

from osm2world_ray.pipelines import queries as Q


def test_every_query_has_an_oracle():
    missing = [n for n in Q.QUERIES if n not in Q.ORACLES]
    assert missing == []


def test_every_oracle_has_a_query():
    orphans = [n for n in Q.ORACLES if n not in Q.QUERIES]
    assert orphans == []


def test_sample_priority_names_resolve():
    # a stale name here silently drops the query from the driver's
    # correctness sampler head (bug class: two renames found in r5)
    stale = [n for n in Q._SAMPLE_PRIORITY if n not in Q.QUERIES]
    assert stale == []


def test_sample_priority_has_no_duplicates():
    seen = set()
    dups = [n for n in Q._SAMPLE_PRIORITY if n in seen or seen.add(n)]
    assert dups == []


def test_oracle_sql_mentions_only_registered_tables():
    tables = {"region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"}
    # FROM/JOIN targets that are bare identifiers must be testdata views
    # or CTE names defined in the same statement
    for name, sql in Q.ORACLES.items():
        sql = re.sub(r"--[^\n]*", "", sql)  # FROM/JOIN inside comments
        ctes = set(re.findall(
            r"(\w+)(?:\s*\([^)]*\))?\s+AS\s+(?:MATERIALIZED\s+)?\(",
            sql, re.I,
        ))
        ctes |= set(re.findall(r"\)\s*(\w+)\s*\(", sql))  # VALUES p(...)
        refs = re.findall(r"(?:FROM|JOIN)\s+([a-zA-Z_]\w*)", sql, re.I)
        unknown = [r for r in refs
                   if r.lower() not in tables and r not in ctes]
        assert unknown == [], f"{name}: unknown relations {unknown}"
