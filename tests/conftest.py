from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from crypto_data_pipeline_with_kafka_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")


def _autodetect_jdbc() -> None:
    """If no JDBC environment is configured but a DuckDB JDBC driver jar
    is already on disk (public maven artifact ``org.duckdb:duckdb_jdbc``,
    often present in a local coursier/ivy/maven cache), wire it up so the
    live JDBC round-trip test runs against a real database file instead
    of skipping. Pure opt-out: any pre-set SPARK_JDBC_* var wins, and
    with no jar found the test keeps its env-gated skip."""
    import glob
    import tempfile

    if os.environ.get("SPARK_JDBC_URL") or os.environ.get("SPARK_JDBC_JARS"):
        return
    import re

    def _ver(path: str) -> tuple:
        # numeric version sort — a lexicographic sort would pick 1.9.0
        # over 1.10.0; the NEWEST driver is the one that can open files
        # written by the (current) Python duckdb module
        return tuple(int(x) for x in re.findall(r"\d+", os.path.basename(path)))

    for cache in ("~/.cache/coursier", "~/.ivy2", "~/.m2"):
        jars = glob.glob(
            os.path.expanduser(f"{cache}/**/duckdb_jdbc*.jar"), recursive=True
        )
        if jars:
            db = os.path.join(tempfile.mkdtemp(prefix="live_jdbc_"), "wh.db")
            os.environ["SPARK_JDBC_JARS"] = max(jars, key=_ver)
            os.environ["SPARK_JDBC_URL"] = f"jdbc:duckdb:{db}"
            os.environ["SPARK_JDBC_DRIVER"] = "org.duckdb.DuckDBDriver"
            return


_autodetect_jdbc()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct():
    return SF_CORRECT
