"""Run both protocol front-ends over one shared Spark engine.

Reference analogue: /root/reference/main.go:18-47 — flags for db path,
PG port, CH HTTP port; one embedded engine, two servers.

    python -m duck_server_spark.server --pg-port 5433 --ch-port 8123 \
        [--data-dir DIR] [--sf-dir /root/testdata/sf0.01] [--require-auth]

--sf-dir registers the fixture parquet tables as views so clients can
query them immediately (the reference opens its persistent .db file the
same way at startup).
"""

from __future__ import annotations

import argparse
import asyncio


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pg-port", type=int, default=5433)
    ap.add_argument("--ch-port", type=int, default=8123)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--require-auth", action="store_true")
    args = ap.parse_args()

    from duck_server_spark.engine.executor import Engine
    from duck_server_spark.engine.session import get_session, register_views
    from duck_server_spark.server.ch.http_server import serve as serve_ch
    from duck_server_spark.server.pg.wire_server import PgServer

    spark = get_session("duck_server_spark")
    if args.sf_dir:
        register_views(spark, args.sf_dir)
    engine = Engine(spark, data_dir=args.data_dir)

    serve_ch(engine, host=args.host, port=args.ch_port, require_auth=args.require_auth)
    print(f"ClickHouse HTTP listening on {args.host}:{args.ch_port}")

    pg = PgServer(engine, host=args.host, port=args.pg_port, require_auth=args.require_auth)
    print(f"PostgreSQL wire listening on {args.host}:{args.pg_port}")
    asyncio.run(pg.serve_forever())


if __name__ == "__main__":
    main()
