"""duck_server_spark — a PySpark-native analytics engine with the query and
data-processing capability surface of yjhatfdu/duck_server.

The reference (see SURVEY.md) is a PostgreSQL-wire + ClickHouse-HTTP server
over an embedded DuckDB 1.0 engine; the relational surface its clients can
run is DuckDB SQL. This package re-expresses that surface Spark-first:

- ``engine``     — SparkSession factory, catalog bootstrap, compat views
- ``operators``  — the relational operator library (SURVEY.md §2B) as
                   DataFrame builders with DuckDB-oracle SQL twins
- ``sources``    — file readers/writers + the ClickHouse format codecs
- ``functions``  — scalar-function families + text/similarity functions
- ``plans``      — front-end SQL dialect shims (textual rewrites, §4.1)
- ``streaming``  — Structured Streaming extensions over the events table
- ``server``     — asyncio PG-wire (server.pg) and CH-HTTP (server.ch)
                   front-ends, replacing the reference's Go servers
"""

__version__ = "0.1.0"
