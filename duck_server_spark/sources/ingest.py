"""Shared bulk-ingest helpers for the PG COPY and CH INSERT…FORMAT paths.

Reference parity: the reference's Appender fast path
(/root/reference/pg_conn.go:545-621, /root/reference/ch_server.go:236-343)
streams client rows into the engine without materializing the payload.
Our analogue is micro-batched DataFrame appends: rows accumulate to
``batch_size`` then append through one ``createDataFrame().write`` per
batch, so peak driver memory is O(batch), not O(payload).

Column-subset semantics (pg_conn.go:545-556, ch_server.go:345-362):
- the subset schema is built in the CLIENT's column-list order (a
  ``COPY t (b, a)`` binds csv cell 1 → b, cell 2 → a);
- unknown columns raise (the reference 400s/errors them);
- columns absent from the list are filled with NULL on append.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_BATCH_ROWS = 50_000


def default_fill(field: T.StructField):
    """Column expression for an OMITTED column: its declared DEFAULT
    (Spark records it as CURRENT_DEFAULT field metadata) else NULL, cast
    to the field type. Shared by every DataFrame-append path (validated
    INSERT, COPY/CH micro-batches) so they can't drift from Spark's
    native INSERT default fill."""
    dflt = (
        field.metadata.get("CURRENT_DEFAULT")
        if isinstance(field.metadata, dict)
        else None
    )
    return (F.expr(dflt) if dflt else F.lit(None)).cast(field.dataType)


def subset_schema(full_schema: T.StructType, cols: list[str] | None) -> T.StructType:
    """Schema for an explicit column list, in the CLIENT's order.

    Raises ValueError for columns not present in the table — silently
    dropping (or table-order zipping) would bind cells to wrong columns.
    """
    if not cols:
        return full_schema
    by_name = {f.name: f for f in full_schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(
            "unknown column(s) " + ", ".join(repr(c) for c in missing) + " in column list"
        )
    return T.StructType([by_name[c] for c in cols])


class BatchAppender:
    """Accumulate row tuples and append to a managed table in micro-batches.

    The write itself is one JVM call per batch (the py4j analogue of the
    reference's per-chunk Appender flush, pg_conn.go:557-619).
    """

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        full_schema: T.StructType,
        cols: list[str] | None,
        batch_size: int = DEFAULT_BATCH_ROWS,
        validator=None,
        seq_fill=None,
    ):
        self.spark = spark
        self.table = table
        self.full_schema = full_schema
        self.cols = cols
        self.schema = subset_schema(full_schema, cols)
        self.batch_size = batch_size
        self.total = 0
        self._buf: list[tuple] = []
        # constraint check run on the full-row batch DataFrame BEFORE the
        # append (engine/constraints.py) — raises PgError 23505/23502 and
        # leaves the table untouched for the violating batch
        self.validator = validator
        # {omitted column: nextval reservation fn(count) -> (base, inc)}
        # — sequence defaults can't be a per-column expression (each ROW
        # needs its own value), so flush() fills them driver-side where
        # the batch tuples already live (round 7)
        self.seq_fill = seq_fill or {}

    def add(self, row: tuple) -> bool:
        """Buffer one row; returns True when the batch is full (caller
        should flush — kept explicit so async callers can flush off-loop)."""
        self._buf.append(row)
        return len(self._buf) >= self.batch_size

    def add_many(self, rows: Iterable[tuple]) -> Iterator[None]:
        """Buffer rows, yielding once per full batch (caller flushes)."""
        for row in rows:
            if self.add(row):
                yield None

    def flush(self) -> None:
        if not self._buf:
            return
        batch, self._buf = self._buf, []
        df = self.spark.createDataFrame(batch, self.schema)
        if self.cols:
            # column-subset insert: missing columns → their declared
            # DEFAULT (PG COPY semantics), a reserved sequence range
            # (DEFAULT nextval — one fetch-and-add per batch, dense ids
            # in arrival order), else NULL; table order
            for f in self.full_schema.fields:
                if f.name not in self.cols:
                    if f.name in self.seq_fill:
                        base, inc = self.seq_fill[f.name](len(batch))
                        from pyspark.sql.window import Window

                        w = Window.orderBy(F.monotonically_increasing_id())
                        df = df.withColumn(
                            f.name,
                            (F.lit(base) + F.lit(inc) * (F.row_number().over(w) - 1))
                            .cast(f.dataType),
                        )
                    else:
                        df = df.withColumn(f.name, default_fill(f))
            df = df.select(*[f.name for f in self.full_schema.fields])
        # fingerprint-gated validate+append (ADVICE r7): re-validates
        # against the fresh base if a concurrent publish lands between
        # the key validation and the append — the mutex alone prevents
        # overwrite races, not key races
        from duck_server_spark.engine.transactions import gated_append

        gated_append(self.spark, self.table, df, validate=self.validator)
        self.total += len(batch)


def csv_rows_null_aware(text: str):
    """RFC-4180 rows with PG/duck COPY-CSV NULL semantics (round 13,
    caught by the wire-mode statement battery): an UNQUOTED empty field
    is SQL NULL, a QUOTED empty field ("") is the empty string —
    python's csv.reader erases that distinction. Fast path: a chunk
    with no '""' cannot contain a quoted-empty field (nor an escaped
    quote), so plain csv.reader + empty→None is exact. Slow path: a
    char state machine tracking per-field quotedness. Yields lists of
    str-or-None; a blank line yields [] (skipped by callers), matching
    csv.reader."""
    import csv
    import io

    if '""' not in text:
        for cells in csv.reader(io.StringIO(text)):
            yield [c if c != "" else None for c in cells]
        return
    row: list = []
    field: list[str] = []
    in_q = had_q = False
    i, n = 0, len(text)

    def _flush() -> None:
        nonlocal field, had_q
        s = "".join(field)
        row.append(s if (s or had_q) else None)
        field, had_q = [], False

    while i < n:
        ch = text[i]
        if in_q:
            if ch == '"':
                if i + 1 < n and text[i + 1] == '"':
                    field.append('"')
                    i += 2
                    continue
                in_q = False
            else:
                field.append(ch)
            i += 1
            continue
        if ch == '"' and not field:
            in_q = had_q = True
        elif ch == ",":
            _flush()
        elif ch == "\n":
            if row or field or had_q:
                _flush()
                yield row
                row = []
            else:
                yield []
        elif ch != "\r":
            field.append(ch)
        i += 1
    if row or field or had_q:
        _flush()
        yield row


class CsvChunkSplitter:
    """Incremental splitter: feed byte chunks, get back decoded text that
    ends on a record boundary (so a csv.reader can parse it standalone).

    Records may contain embedded newlines only inside quoted fields; in
    RFC-4180 CSV every quote character is either a field delimiter or a
    doubled escape, so the count of '"' before any outside-a-field
    newline is even — we split at the last such newline.
    """

    def __init__(self, quote: str | None = '"'):
        self.quote = quote
        self._text = ""
        self._pending = b""

    def feed(self, chunk: bytes) -> str:
        data = self._pending + chunk
        # don't decode a partial UTF-8 sequence at the chunk edge
        try:
            text = data.decode()
            self._pending = b""
        except UnicodeDecodeError:
            for back in range(1, 5):
                try:
                    text = data[:-back].decode()
                    self._pending = data[-back:]
                    break
                except UnicodeDecodeError:
                    continue
            else:
                raise
        self._text += text
        cut = self._safe_cut(self._text)
        if cut <= 0:
            return ""
        out, self._text = self._text[:cut], self._text[cut:]
        return out

    def finish(self) -> str:
        out, self._text = self._text, ""
        return out

    def _safe_cut(self, s: str) -> int:
        """Index just past the last newline that lies outside quotes."""
        pos = s.rfind("\n")
        if self.quote is None:
            return pos + 1
        while pos != -1:
            if s.count(self.quote, 0, pos) % 2 == 0:
                return pos + 1
            pos = s.rfind("\n", 0, pos)
        return 0
