"""Typed engine errors that carry a PostgreSQL SQLSTATE.

The reference surfaces its engine's constraint violations verbatim over
the wire (embedded DuckDB rejects duplicate keys — README.md:21-22); our
enforcement layer raises these so the PG front-end can put the right
code in ErrorResponse field 'C' and the CH front-end can pick a 4xx.
"""

from __future__ import annotations


class PgError(Exception):
    """Engine error with a PG SQLSTATE (e.g. 23505 unique_violation,
    23502 not_null_violation)."""

    def __init__(self, pgcode: str, message: str):
        super().__init__(message)
        self.pgcode = pgcode
