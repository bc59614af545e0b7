from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sems_event_deduplication_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sems-dedup-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    from sems_event_deduplication_spark.synth import make_corpus_pdf

    return make_corpus_pdf(n_base=150, seed=42)


@pytest.fixture(scope="session")
def corpus(spark, corpus_pdf):
    from sems_event_deduplication_spark.synth import AUDIO_CLIPS_SCHEMA

    return spark.createDataFrame(corpus_pdf, schema=AUDIO_CLIPS_SCHEMA).cache()
