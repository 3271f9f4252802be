"""docs/COOKBOOK.md must stay runnable: execute every SQL block from the
markdown verbatim against the bundled fixtures."""

import re
from pathlib import Path

import pytest

from sequila_tpu.session import SessionContext

COOKBOOK = Path(__file__).resolve().parent.parent / "docs" / "COOKBOOK.md"


def sql_blocks():
    text = COOKBOOK.read_text()
    return re.findall(r"```sql\n(.*?)```", text, re.S)


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    blocks = sql_blocks()
    # the Setup block registers the fixture tables
    c.sql(blocks[0])
    return c


def test_cookbook_has_blocks():
    assert len(sql_blocks()) >= 9


def test_every_sql_block_runs(ctx):
    for block in sql_blocks()[1:]:
        out = ctx.sql(block)
        assert out is None or out.num_rows >= 0, block


def test_recipe_results_sane(ctx):
    assert ctx.sql(sql_blocks()[1]).to_pylist_column(0) == [16]
    hits = ctx.sql(
        "EXECUTE hits(0)" if "hits" in ctx.prepared else sql_blocks()[1]
    ).to_pylist_column(0)
    assert hits == [16]
