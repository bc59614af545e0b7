"""Wikidata nested-claim extraction (reference get_events.py:19-44)."""

from __future__ import annotations

import json
import os

import pytest

from sems_event_deduplication_spark.sources.wikidata import (
    extract_event_claims,
    parse_wikidata_time,
    read_wikidata_entities,
)


def _snak(**value):
    return {"mainsnak": {"datavalue": {"value": value}}}


ENTITIES = [
    # P585 point-in-time + P131 admin location
    {
        "id": "Q1",
        "claims": {
            "P585": [_snak(time="+2014-03-17T00:00:00Z")],
            "P131": [_snak(id="Q64")],
        },
    },
    # no P585: falls back to P580 start; location falls back to P276
    {
        "id": "Q2",
        "claims": {
            "P580": [_snak(time="+1999-01-02T00:00:00Z")],
            "P276": [_snak(id="Q90")],
        },
    },
    # P585 takes priority over P580 when both exist; P131 over P17
    {
        "id": "Q3",
        "claims": {
            "P580": [_snak(time="+2001-01-01T00:00:00Z")],
            "P585": [_snak(time="+2002-02-02T00:00:00Z")],
            "P17": [_snak(id="Q183")],
            "P131": [_snak(id="Q1055")],
        },
    },
    # time only, no location
    {"id": "Q4", "claims": {"P577": [_snak(time="+2020-12-31T00:00:00Z")]}},
    # neither -> dropped
    {"id": "Q5", "claims": {"P31": [_snak(id="Q5")]}},
    # malformed / year-precision time -> null date but row kept (has loc)
    {
        "id": "Q6",
        "claims": {
            "P585": [_snak(time="+2014-00-00T00:00:00Z")],
            "P131": [_snak(id="Q7")],
        },
    },
]


@pytest.fixture(scope="module")
def entities_df(spark, tmp_path_factory):
    path = os.path.join(str(tmp_path_factory.mktemp("wd")), "entities.json")
    with open(path, "w") as f:
        for e in ENTITIES:
            f.write(json.dumps(e) + "\n")
    return read_wikidata_entities(spark, path)


def test_claim_extraction(entities_df):
    got = {
        r["entity_id"]: r.asDict()
        for r in extract_event_claims(entities_df).collect()
    }
    assert set(got) == {"Q1", "Q2", "Q3", "Q4", "Q6"}  # Q5 dropped
    assert str(got["Q1"]["event_date"]) == "2014-03-17"
    assert got["Q1"]["location_id"] == "Q64"
    assert str(got["Q2"]["event_date"]) == "1999-01-02"
    assert got["Q2"]["location_id"] == "Q90"
    # priority order: P585 over P580, P131 over P17
    assert str(got["Q3"]["event_date"]) == "2002-02-02"
    assert got["Q3"]["location_id"] == "Q1055"
    assert str(got["Q4"]["event_date"]) == "2020-12-31"
    assert got["Q4"]["location_id"] is None
    # malformed time: date is null, raw string survives
    assert got["Q6"]["event_date"] is None
    assert got["Q6"]["event_time"] == "+2014-00-00T00:00:00Z"


def test_extraction_is_native_exprs(entities_df):
    """No Python stages: the whole extraction must be scan + project."""
    plan = extract_event_claims(entities_df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_parse_wikidata_time_nulls(spark):
    df = spark.createDataFrame(
        [("+2014-03-17T00:00:00Z",), ("garbage",), (None,)], ["t"]
    )
    vals = df.select(parse_wikidata_time("t").alias("d")).collect()
    assert str(vals[0]["d"]) == "2014-03-17"
    assert vals[1]["d"] is None and vals[2]["d"] is None
