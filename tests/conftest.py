import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def golden_cells():
    import duckdb

    return duckdb.sql(
        f"SELECT * FROM '{FIXTURE_DIR}/golden_cells.parquet'"
    ).df()


@pytest.fixture(scope="session")
def constraint_fixtures():
    import json

    with open(os.path.join(FIXTURE_DIR, "constraints.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("spatialindex-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()
