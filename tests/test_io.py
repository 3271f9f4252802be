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


class TestVcfGff:
    VCF = (
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\trs1\tA\tT\t50\tPASS\tDP=10\n"
        "chr1\t200\trs2\tACGT\tA\t.\tPASS\tDP=5\n"
        "chr2\t5\t.\tG\tC\t99\tq10\t.\n"
    )
    GFF = (
        "##gff-version 3\n"
        "chr1\thavana\tgene\t50\t150\t.\t+\t.\tID=gene1\n"
        "chr1\thavana\texon\t90\t120\t.\t+\t.\tParent=gene1\n"
        "chr2\tensembl\tgene\t1\t10\t.\t-\t.\tID=gene2\n"
    )

    def test_vcf_reader(self, tmp_path):
        from sequila_tpu.io.readers import read_vcf

        p = tmp_path / "x.vcf"
        p.write_text(self.VCF)
        t = read_vcf(str(p))
        rows = t.to_pylist()
        assert rows[0]["contig"] == "chr1" and rows[0]["pos_end"] == 100
        # deletion REF=ACGT spans 4 bases end-inclusive
        assert rows[1]["pos_start"] == 200 and rows[1]["pos_end"] == 203
        assert rows[2]["qual"] == "99"

    def test_gff_reader(self, tmp_path):
        from sequila_tpu.io.readers import read_gff

        p = tmp_path / "x.gff3"
        p.write_text(self.GFF)
        t = read_gff(str(p))
        rows = t.to_pylist()
        assert [r["type"] for r in rows] == ["gene", "exon", "gene"]
        assert rows[0]["pos_start"] == 50 and rows[0]["pos_end"] == 150

    def test_vcf_gff_interval_join_sql(self, tmp_path):
        from sequila_tpu.session import SessionContext

        v = tmp_path / "x.vcf"; v.write_text(self.VCF)
        g = tmp_path / "x.gff3"; g.write_text(self.GFF)
        c = SessionContext()
        c.sql(f"CREATE EXTERNAL TABLE variants STORED AS VCF LOCATION '{v}'")
        c.sql(f"CREATE EXTERNAL TABLE genes STORED AS GFF LOCATION '{g}'")
        got = c.sql(
            "SELECT count(*) FROM variants a JOIN genes b ON a.contig = b.contig "
            "AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start"
        )
        assert got.column_np(0)[0] == 3
