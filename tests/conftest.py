import pytest

from legal_knowledge_graph_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="lkg-tests", master="local[4]", shuffle_partitions=4,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "512"},
    )
    yield s
    s.stop()
