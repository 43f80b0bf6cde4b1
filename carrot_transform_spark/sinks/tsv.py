"""Output sinks: TSV directory (golden-byte-compatible) and JDBC.

The reference writes one `<out>/<name>.tsv` per target, tab-joined with no
quoting (outputs.py:96-114). Two write modes:

- ``single``     : exact single-file TSV via toLocalIterator — byte-
                   compatible with the reference goldens; streams, so the
                   driver never holds the full table.
- ``distributed``: df.write.csv with tab separator — the 100 TB path
                   (many part files, committed by the cluster).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame


class TsvDirSink:
    def __init__(self, directory: str | Path, mode: str = "single", write_mode: str = "overwrite"):
        """write_mode: 'overwrite' (reference default) or 'append' — append
        adds rows to an existing TSV without re-writing the header
        (reference v2 --write-mode)."""
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.mode = mode
        self.write_mode = write_mode

    def write(self, name: str, df: DataFrame, columns: list[str]) -> None:
        # "shorten" quirk (reference outputs.py:62-83 start/write): when the
        # last header cell is empty, the final column is dropped from the
        # header AND from every record
        if columns and columns[-1] == "":
            columns = columns[:-1]
            df = df.select(*[df.columns[i] for i in range(len(columns))])
        out = df.select(*columns)
        if self.mode == "single":
            path = self.directory / f"{name}.tsv"
            appending = self.write_mode == "append" and path.exists()
            with path.open("a" if appending else "w", encoding="utf-8") as fh:
                if not appending:
                    fh.write("\t".join(columns) + "\n")
                for row in out.toLocalIterator():
                    fh.write("\t".join("" if v is None else str(v) for v in row) + "\n")
        else:
            (
                out.write.mode("overwrite")
                .option("sep", "\t")
                .option("header", True)
                .option("emptyValue", "")
                .option("nullValue", "")
                .csv(str(self.directory / name))
            )

    def write_rows(self, name: str, header: list[str], rows: list[list[str]]) -> None:
        shorten = bool(header) and header[-1] == ""
        if shorten:
            header = header[:-1]
        path = self.directory / f"{name}.tsv"
        with path.open("w", encoding="utf-8") as fh:
            fh.write("\t".join(header) + "\n")
            for r in rows:
                fh.write("\t".join(r[:-1] if shorten else r) + "\n")


class JdbcSink:
    """CREATE-or-overwrite + bulk insert via df.write.jdbc (reference K2
    creates all-Text columns and row-by-row INSERTs; Spark's JDBC writer
    batches instead)."""

    def __init__(self, url: str, properties: dict[str, str] | None = None):
        self.url = url
        self.properties = properties or {}

    def write(self, name: str, df: DataFrame, columns: list[str]) -> None:
        writer = df.select(*columns).write.mode("overwrite").format("jdbc")
        writer = writer.option("url", self.url).option("dbtable", name)
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.save()
