"""Session-scoped transaction overlay: real BEGIN/COMMIT/ROLLBACK.

The reference inherits ACID transactions from embedded DuckDB — a
client's `BEGIN; UPDATE …; ROLLBACK` really rolls back because every
statement is delegated inside one engine connection
(/root/reference/pg_conn.go:215-272; README.md:21-22 "more performant
update/delete with transaction support"). Vanilla Spark parquet tables
have no transaction protocol, so we build the same visible semantics at
the session layer with staged writes:

- On the first DML touching a managed table inside a transaction, the
  table is cloned into a per-connection shadow table
  (``<name>__txn_<backend_pid>``). All DML in the transaction — UPDATE /
  DELETE copy-on-write rewrites, INSERT appends, TRUNCATE, COPY FROM
  STDIN — is redirected to the shadow by rewriting the table identifier
  (outside string literals) before dispatch, and reads from this
  connection are rewritten the same way (read-your-writes).
- Other connections keep reading the untouched base table: isolation is
  snapshot-ish at table granularity (writer sees its writes, everyone
  else sees the pre-transaction state).
- COMMIT republishes each shadow over its base table (one file-copy job
  per touched table — same stage-then-swap durability story as
  ``Engine._overwrite_table``) and drops the shadows. ROLLBACK just
  drops the shadows; the base tables were never written.

Known limitation vs the reference: DDL is NOT transactional here — a
CREATE/DROP TABLE inside BEGIN..ROLLBACK takes effect immediately
(DuckDB rolls DDL back; PostgreSQL does too). DML-only transactions —
the JDBC autocommit=false shape these exist for — have full semantics,
including statement-time PK/UNIQUE enforcement against the staged state
(engine/constraints.py resolves shadow names to base constraints).

Scale note: the first-touch clone is a full copy of the table — the
standard cost of copy-on-write transactionality without a table format.
On a production cluster the answer is Delta/Iceberg whose commit
protocol gives file-granular staging for free; this overlay keeps the
same client-visible semantics on plain parquet.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import TYPE_CHECKING

from duck_server_spark.plans.rewrites import _sub_outside_literals

if TYPE_CHECKING:  # pragma: no cover
    from duck_server_spark.engine.executor import Engine

# DML statements whose target table must be staged before the identifier
# rewrite redirects them. COPY is staged only for the FROM STDIN
# direction — COPY ... TO STDOUT is a read.
_DML_TARGETS = (
    re.compile(r"^\s*insert\s+into\s+([\w.]+)", re.IGNORECASE),
    re.compile(r"^\s*update\s+([\w.]+)", re.IGNORECASE),
    re.compile(r"^\s*delete\s+from\s+([\w.]+)", re.IGNORECASE),
    re.compile(r"^\s*truncate\s+(?:table\s+)?([\w.]+)", re.IGNORECASE),
    re.compile(r"^\s*copy\s+([\w.]+)[^;]*?\bfrom\s+stdin", re.IGNORECASE | re.DOTALL),
)


class TxnOverlay:
    """One open transaction on one PG connection."""

    def __init__(self, engine: "Engine", txn_id: int):
        self.engine = engine
        self.txn_id = txn_id
        self.status = "T"  # "T" in progress, "E" failed (aborted)
        # lowercase real name -> shadow table name
        self.staged: dict[str, str] = {}

    # ------------------------------------------------------------ staging

    def _drop_shadow(self, shadow: str) -> None:
        spark = self.engine.spark
        spark.sql(f"DROP TABLE IF EXISTS {shadow}")
        # a crashed prior transaction can leave an orphaned directory that
        # no catalog entry owns — saveAsTable refuses the location then
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(os.path.join(warehouse, shadow.rsplit(".", 1)[-1]), ignore_errors=True)

    def ensure_staged(self, table: str) -> None:
        """First DML touch: clone the managed table into its shadow."""
        key = table.lower()
        if key in self.staged:
            return
        spark = self.engine.spark
        try:
            if not spark.catalog.tableExists(table):
                return  # temp views / unknown names: not transactional
        except Exception:  # noqa: BLE001 — malformed name → let dispatch error
            return
        shadow = f"{table.replace('.', '_')}__txn_{self.txn_id}"
        self._drop_shadow(shadow)
        spark.table(table).write.mode("overwrite").saveAsTable(shadow)
        self.staged[key] = shadow

    # ----------------------------------------------------------- rewrites

    def rewrite(self, q: str) -> str:
        """Redirect staged table identifiers to their shadows (outside
        string literals). Word-boundary match, case-insensitive, so both
        reads and writes from this connection see the staged state."""
        if not self.staged:
            return q
        pat = re.compile(
            r"\b(" + "|".join(re.escape(t) for t in self.staged) + r")\b", re.IGNORECASE
        )
        return _sub_outside_literals(
            q, lambda seg: pat.sub(lambda m: self.staged[m.group(1).lower()], seg)
        )

    def prepare(self, q: str) -> str:
        """Stage the statement's DML target (if any), then rewrite all
        staged identifiers. Runs Spark jobs on first touch — call from an
        executor thread, not the event loop."""
        for rx in _DML_TARGETS:
            m = rx.match(q)
            if m:
                self.ensure_staged(m.group(1))
                break
        return self.rewrite(q)

    # ------------------------------------------------------ commit / abort

    def commit(self) -> None:
        """Republish every shadow over its base table, then drop shadows.
        Per-table publish is the same stage-then-swap as the engine's
        copy-on-write rewrites: the shadow holds the complete new contents
        until the overwrite finishes, so a crash leaves recoverable state
        (atomic multi-table commit needs a table format — documented
        non-goal)."""
        spark = self.engine.spark
        for real, shadow in self.staged.items():
            spark.table(shadow).write.mode("overwrite").saveAsTable(real)
            self._drop_shadow(shadow)
        self.staged.clear()

    def rollback(self) -> None:
        """Drop the shadows; base tables were never written."""
        for shadow in self.staged.values():
            try:
                self._drop_shadow(shadow)
            except Exception:  # noqa: BLE001 — rollback must never fail
                pass
        self.staged.clear()
