"""Wikidata entity claim extraction (SURVEY.md S4/F-adjacent gap).

Reference: ``get_events.py:19-44`` walks each entity's nested
``claims`` dict and pulls the first available **time** property
(P585 point-in-time, P580 start, P582 end, P577 publication) and
**location** property (P131 admin territory, P276 location, P17
country) to date an event and place it.

Spark-first: the claims tree is a real nested column
(``map<string, array<struct<mainsnak:…>>>``), and the per-property
walk is ``element_at`` + ``getField`` + ``coalesce`` — pure Catalyst
expressions, no Python in the loop, predicate pushdown and column
pruning intact. The JSON decode happens once at scan time with a
declared schema (never schema inference over a 100 TB dump).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# priority order mirrors the reference's property preference
TIME_PROPS = ("P585", "P580", "P582", "P577")
LOCATION_PROPS = ("P131", "P276", "P17")

_VALUE = T.StructType(
    [
        T.StructField("time", T.StringType(), True),  # time-valued snaks
        T.StructField("id", T.StringType(), True),  # item-valued snaks
    ]
)
_SNAK = T.StructType(
    [
        T.StructField(
            "mainsnak",
            T.StructType(
                [
                    T.StructField(
                        "datavalue",
                        T.StructType([T.StructField("value", _VALUE, True)]),
                        True,
                    )
                ]
            ),
            True,
        )
    ]
)
CLAIMS_TYPE = T.MapType(T.StringType(), T.ArrayType(_SNAK))
ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("claims", CLAIMS_TYPE, True),
    ]
)


def read_wikidata_entities(spark: SparkSession, path: str) -> DataFrame:
    """One JSON entity per line, claims decoded straight into the map
    schema (S4-style declared-schema scan)."""
    return spark.read.schema(ENTITY_SCHEMA).json(path)


def first_claim_value(claims, props, field: str):
    """First non-null ``claims[prop][0].mainsnak.datavalue.value.field``
    over ``props`` in priority order — the reference's dict walk as one
    coalesce expression.

    ``F.get`` (not ``getItem``): under ANSI mode (Spark 4 default, and
    this session's) an out-of-bounds array index RAISES — one entity
    with an empty statement array (``{"claims": {"P585": []}}``) would
    kill the whole extract job. ``get`` returns null out of bounds."""
    claims = F.col(claims) if isinstance(claims, str) else claims
    return F.coalesce(
        *[
            F.get(F.element_at(claims, p), 0)
            .getField("mainsnak")
            .getField("datavalue")
            .getField("value")
            .getField(field)
            for p in props
        ]
    )


def parse_wikidata_time(col):
    """'+2014-03-17T00:00:00Z' -> date (try_to_date: malformed or
    year-precision-padded values become null instead of an ANSI error)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.try_to_date(F.regexp_extract(col, r"^\+?(\d{4}-\d{2}-\d{2})", 1))


def extract_event_claims(
    entities: DataFrame,
    id_col: str = "id",
    claims_col: str = "claims",
    time_props: tuple[str, ...] = TIME_PROPS,
    location_props: tuple[str, ...] = LOCATION_PROPS,
) -> DataFrame:
    """(entity id, claims) -> (entity_id, event_time, event_date,
    location_id); rows with neither a time nor a location are dropped
    (the reference skips undatable/unplaceable entities)."""
    time_raw = first_claim_value(claims_col, time_props, "time")
    loc = first_claim_value(claims_col, location_props, "id")
    out = entities.select(
        F.col(id_col).alias("entity_id"),
        time_raw.alias("event_time"),
        parse_wikidata_time(time_raw).alias("event_date"),
        loc.alias("location_id"),
    )
    return out.filter(
        F.col("event_time").isNotNull() | F.col("location_id").isNotNull()
    )
