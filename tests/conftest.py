from __future__ import annotations

import pandas as pd
import pytest

from veealign_spark import datagen, schemas
from veealign_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("veealign-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_pair() -> dict[str, pd.DataFrame]:
    return datagen.make_ontology_pair(seed=42)


@pytest.fixture(scope="session")
def fixture_transcripts(fixture_pair):
    transcripts, expected = datagen.make_transcripts(fixture_pair["triples"], seed=42)
    return transcripts, expected


@pytest.fixture(scope="session")
def transcripts_sdf(spark, fixture_transcripts):
    transcripts, _ = fixture_transcripts
    return spark.createDataFrame(transcripts, schema=schemas.TRANSCRIPTS).cache()


@pytest.fixture(scope="session")
def triples_sdf(spark, fixture_pair):
    return spark.createDataFrame(
        fixture_pair["triples"], schema=schemas.TRIPLES.fieldNames()
    ).cache()
