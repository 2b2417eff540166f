import pandas as pd
import pytest

from breg_dcat_harvester_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pytest", master="local[4]", shuffle_partitions="8")
    yield spark


@pytest.fixture(scope="session")
def golden_df(spark):
    from breg_dcat_harvester_spark.datagen import ARROW_SCHEMA, golden_transcripts

    pdf = golden_transcripts()
    return spark.createDataFrame(pdf, schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")


@pytest.fixture(scope="session")
def small_transcripts(spark, tmp_path_factory):
    from breg_dcat_harvester_spark.datagen import gen_transcripts, write_transcripts_parquet

    path = str(tmp_path_factory.mktemp("transcripts"))
    write_transcripts_parquet(gen_transcripts(1000), path)
    return spark.read.parquet(path)
