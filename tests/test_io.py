"""External table IO: CSV variants, Parquet, BED — the reference's
storage-format surface (CREATE EXTERNAL TABLE ... STORED AS ...)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sequila_tpu.session import SessionContext


@pytest.fixture
def ctx():
    return SessionContext()


def test_csv_no_header_tab_delimited(ctx, tmp_path):
    p = tmp_path / "data.tsv"
    p.write_text("chr1\t10\t20\nchr2\t5\t9\n")
    ctx.sql(
        f"CREATE EXTERNAL TABLE t (contig VARCHAR NOT NULL, s BIGINT NOT NULL,"
        f" e BIGINT NOT NULL) STORED AS CSV LOCATION '{p}'"
        " OPTIONS ('delimiter' '\\t', 'has_header' 'false')"
    )
    out = ctx.sql("SELECT * FROM t ORDER BY contig")
    assert out.num_rows == 2
    assert out.column_names == ["contig", "s", "e"]
    assert out.column_np("s").tolist() == [10, 5]


def test_parquet_external_table(ctx, tmp_path):
    p = tmp_path / "data.parquet"
    pq.write_table(
        pa.table({"contig": ["chr1"] * 3, "pos_start": [1, 5, 9], "pos_end": [4, 8, 12]}),
        p,
    )
    ctx.sql(f"CREATE EXTERNAL TABLE t STORED AS PARQUET LOCATION '{p}'")
    assert ctx.sql("SELECT count(*) FROM t").column_np(0)[0] == 3


def test_bed_external_table(ctx, tmp_path):
    p = tmp_path / "regions.bed"
    p.write_text("chr1\t100\t200\tfeatureA\nchr2\t50\t80\tfeatureB\n")
    ctx.sql(f"CREATE EXTERNAL TABLE t STORED AS BED LOCATION '{p}'")
    out = ctx.sql("SELECT * FROM t ORDER BY contig")
    assert out.column_names[:3] == ["contig", "pos_start", "pos_end"]
    assert out.num_rows == 2


def test_bed_join_end_to_end(ctx, tmp_path):
    """The q1 shape over BED inputs (the reference's exons/fBrain setup)."""
    a = tmp_path / "a.bed"
    b = tmp_path / "b.bed"
    a.write_text("chr1\t10\t50\nchr1\t100\t200\n")
    b.write_text("chr1\t40\t60\nchr1\t300\t400\n")
    ctx.sql(f"CREATE EXTERNAL TABLE a STORED AS BED LOCATION '{a}'")
    ctx.sql(f"CREATE EXTERNAL TABLE b STORED AS BED LOCATION '{b}'")
    out = ctx.sql(
        "SELECT count(1) FROM a JOIN b ON a.contig = b.contig"
        " AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end"
    )
    assert out.column_np(0)[0] == 1
