"""Host table IO: CSV / Parquet / BED readers (pyarrow's native C++ engines).

The reference registers external tables through DataFusion's CSV/Parquet
scans (reference queries/q1-coitrees.sql: CREATE EXTERNAL TABLE ... STORED AS
CSV ... OPTIONS('delimiter' '\t', 'has_header' 'false')).  The equivalent
surface here supports the same storage formats and options; BED files are
the headerless tab-separated (contig, start, end) special case.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

from sequila_tpu.errors import PlanError
from sequila_tpu.models.table import Table


def read_csv(
    path: str,
    has_header: bool = True,
    delimiter: str = ",",
    column_names: list[str] | None = None,
    schema: pa.Schema | None = None,
) -> Table:
    delimiter = {"\\t": "\t"}.get(delimiter, delimiter)
    read_opts = pacsv.ReadOptions(
        autogenerate_column_names=not has_header and column_names is None,
        column_names=column_names if not has_header else None,
    )
    parse_opts = pacsv.ParseOptions(delimiter=delimiter)
    convert_opts = (
        pacsv.ConvertOptions(column_types={f.name: f.type for f in schema})
        if schema is not None
        else pacsv.ConvertOptions()
    )
    t = pacsv.read_csv(
        path, read_options=read_opts, parse_options=parse_opts,
        convert_options=convert_opts,
    )
    if column_names and has_header:
        t = t.rename_columns(column_names)
    return Table(t)


def read_parquet(path: str, columns: list[str] | None = None) -> Table:
    return Table(pq.read_table(path, columns=columns))


def read_bed(path: str, column_names=("contig", "pos_start", "pos_end")) -> Table:
    """Headerless tab-separated genomic intervals; extra BED columns kept."""
    t = pacsv.read_csv(
        path,
        read_options=pacsv.ReadOptions(autogenerate_column_names=True),
        parse_options=pacsv.ParseOptions(delimiter="\t"),
    )
    names = list(column_names) + [
        f"col{i}" for i in range(len(column_names), t.num_columns)
    ]
    return Table(t.rename_columns(names[: t.num_columns]))


def read_table(path: str, fmt: str, **options) -> Table:
    fmt = fmt.lower()
    if fmt == "csv":
        return read_csv(path, **options)
    if fmt == "parquet":
        return read_parquet(path)
    if fmt == "bed":
        return read_bed(path)
    if fmt == "json":
        import pyarrow.json as pajson

        return Table(pajson.read_json(path))
    raise PlanError(f"unsupported storage format: {fmt}")


def write_table(table: Table, path: str) -> None:
    """Write a table; format chosen by extension (.parquet/.csv/.bed/.tsv).

    Duplicate column names (SELECT * over a join) get :1 suffixes —
    parquet requires unique field names."""
    arrow = table.arrow
    names = arrow.column_names
    if len(set(names)) != len(names):
        seen: dict[str, int] = {}
        uniq = []
        for n in names:
            k = seen.get(n, 0)
            uniq.append(n if k == 0 else f"{n}:{k}")
            seen[n] = k + 1
        arrow = arrow.rename_columns(uniq)
        table = Table(arrow)
    lower = path.lower()
    if lower.endswith(".parquet"):
        pq.write_table(table.arrow, path)
    elif lower.endswith((".bed", ".tsv")):
        pacsv.write_csv(
            table.arrow, path,
            write_options=pacsv.WriteOptions(include_header=False, delimiter="\t"),
        )
    elif lower.endswith(".csv"):
        pacsv.write_csv(table.arrow, path)
    else:
        raise PlanError(f"can't infer output format from path: {path}")
