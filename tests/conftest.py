from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bank_statement_pdf_parser_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="engine-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_rows():
    from bank_statement_pdf_parser_spark import fixtures
    return fixtures.gen_transcripts(n_convs=40, seed=42)


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory, fixture_rows):
    from bank_statement_pdf_parser_spark import fixtures
    p = tmp_path_factory.mktemp("data") / "transcripts.parquet"
    fixtures.write_transcripts_parquet(fixture_rows, str(p))
    return str(p)
