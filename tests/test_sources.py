"""File source/sink round-trips + the read_* table-function rewrite."""

import pytest

from duck_server_spark.sources import files as fsrc


@pytest.fixture(scope="module")
def small_df(spark, sf_dir):
    from duck_server_spark.engine.session import load_table

    return load_table(spark, sf_dir, "nation")


def test_parquet_roundtrip(spark, small_df, tmp_path):
    p = str(tmp_path / "nation_pq")
    fsrc.copy_to(small_df, p, fmt="parquet")
    back = fsrc.read_parquet(spark, p)
    assert back.count() == small_df.count()
    assert set(back.columns) == set(small_df.columns)


def test_csv_roundtrip_with_header(spark, small_df, tmp_path):
    p = str(tmp_path / "nation_csv")
    fsrc.copy_to(small_df, p, fmt="csv", single_file=True)
    back = fsrc.read_csv(spark, p)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in small_df.collect()
    )


def test_json_roundtrip(spark, small_df, tmp_path):
    p = str(tmp_path / "nation_json")
    fsrc.copy_to(small_df, p, fmt="json")
    back = fsrc.read_json(spark, p)
    assert back.count() == small_df.count()


def test_partitioned_write_layout(spark, small_df, tmp_path):
    import os

    p = str(tmp_path / "nation_part")
    fsrc.copy_to(small_df, p, fmt="parquet", partition_by=["n_regionkey"])
    subdirs = [d for d in os.listdir(p) if d.startswith("n_regionkey=")]
    assert len(subdirs) == 5  # one directory per region key
    assert fsrc.read_parquet(spark, p).count() == small_df.count()


def test_read_function_rewrite(spark, sf_dir):
    q = fsrc.rewrite_file_functions(
        f"SELECT count(*) AS n FROM read_parquet('{sf_dir}/region.parquet')"
    )
    assert "parquet.`" in q
    assert spark.sql(q).collect()[0]["n"] == 5


def test_read_csv_auto_rewrite():
    q = fsrc.rewrite_file_functions("SELECT * FROM read_csv_auto('/tmp/x.csv')")
    assert q == "SELECT * FROM csv.`/tmp/x.csv`"


def test_qualify_rewrite(spark, sf_dir):
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans.rewrites import rewrite_qualify

    register_views(spark, sf_dir)
    q = rewrite_qualify(
        "SELECT c_mktsegment, c_custkey, c_acctbal FROM customer "
        "QUALIFY row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) <= 2 "
        "ORDER BY c_mktsegment, c_acctbal DESC"
    )
    rows = spark.sql(q).collect()
    assert len(rows) == 10  # 5 segments x top-2
    assert set(rows[0].asDict()) == {"c_mktsegment", "c_custkey", "c_acctbal"}


@pytest.mark.parametrize("shape", ["nanos", "micros_ntz", "micros_utc"])
def test_events_ts_fixture_shapes(spark, tmp_path, shape):
    """load_table must normalize events.ts to TIMESTAMP for every parquet
    physical shape the driver's fixture generator has produced across
    rounds: TIMESTAMP(NANOS), TIMESTAMP(MICROS, isAdjustedToUTC=false)
    (→ Spark TIMESTAMP_NTZ), and TIMESTAMP(MICROS, isAdjustedToUTC=true).
    A regenerated fixture must never torpedo every ts-consuming operator
    again (round-2 postmortem)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from duck_server_spark.engine.session import _load_table_uncached

    unit_tz = {
        "nanos": ("ns", None),
        "micros_ntz": ("us", None),
        "micros_utc": ("us", "UTC"),
    }[shape]
    vals = [
        datetime.datetime(2024, 1, 1, 0, 0, 0),
        datetime.datetime(2024, 1, 1, 12, 34, 56, 789000),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(vals, pa.timestamp(unit_tz[0], tz=unit_tz[1])),
        }
    )
    d = tmp_path / shape
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    df = _load_table_uncached(spark, str(d), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = sorted(r.ts for r in df.collect())
    assert got == vals  # UTC session TZ → wall-clock values survive intact


# ---------------------------------------------------------------------------
# COPY … TO/FROM '<file>' (round 7) — engine/copy_file.py
# ---------------------------------------------------------------------------


def test_copy_to_from_file_roundtrip(spark):
    import shutil
    import tempfile

    from duck_server_spark.engine.executor import Engine

    eng = Engine(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("cpf1", "cpf2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    eng.execute("CREATE TABLE cpf1 (id INT, name TEXT)")
    eng.execute("INSERT INTO cpf1 VALUES (1,'a'),(2,'b'),(3,'c')")
    d = tempfile.mkdtemp()
    try:
        # single FILE at the path (DuckDB contract), not a directory
        assert eng.execute(f"COPY cpf1 TO '{d}/out.parquet'") == "COPY 3"
        import os

        assert os.path.isfile(f"{d}/out.parquet")
        assert spark.read.parquet(f"{d}/out.parquet").count() == 3
        # query form + csv options
        tag = eng.execute(
            f"COPY (SELECT id, upper(name) AS u FROM cpf1 WHERE id > 1) "
            f"TO '{d}/out.csv' (FORMAT csv, HEADER)"
        )
        assert tag == "COPY 2"
        assert open(f"{d}/out.csv").read().splitlines()[0] == "id,u"
        # json = newline-delimited objects (DuckDB's json COPY)
        assert eng.execute(f"COPY cpf1 TO '{d}/o.json'") == "COPY 3"
        assert open(f"{d}/o.json").read().count("\n") == 3
        # import back through the validated-append path
        eng.execute("CREATE TABLE cpf2 (id INT, name TEXT)")
        assert eng.execute(f"COPY cpf2 FROM '{d}/out.parquet'") == "COPY 3"
        assert sorted(tuple(r) for r in spark.table("cpf2").collect()) == [
            (1, "a"), (2, "b"), (3, "c")
        ]
        # csv import with header, aligned to the target schema
        eng.execute(f"COPY cpf1 TO '{d}/full.csv' (FORMAT csv, HEADER)")
        eng.execute("DELETE FROM cpf2")
        assert eng.execute(
            f"COPY cpf2 FROM '{d}/full.csv' (FORMAT csv, HEADER)"
        ) == "COPY 3"
        assert spark.table("cpf2").count() == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)
        for t in ("cpf1", "cpf2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_copy_to_directory_forms(spark):
    """Round 8 (VERDICT r7 punch item 6): COPY TO's directory forms —
    PARTITION_BY writes Spark's native hive layout (same <col>=<val>
    dirs DuckDB produces), PER_THREAD_OUTPUT writes a plain multi-part
    directory, neither coalesces, the roundtrip restores the original
    rows, and an unimplemented COPY option errors 0A000 loudly."""
    import os
    import shutil
    import tempfile

    import pytest as _pt

    from duck_server_spark.engine.errors import PgError
    from duck_server_spark.engine.executor import Engine

    eng = Engine(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("cpd1", "cpd2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    eng.execute("CREATE TABLE cpd1 (id INT, grp TEXT, v DOUBLE)")
    eng.execute(
        "INSERT INTO cpd1 VALUES (1,'a',1.5),(2,'a',2.5),(3,'b',3.5),(4,'c',4.5)"
    )
    d = tempfile.mkdtemp()
    try:
        tag = eng.execute(
            f"COPY cpd1 TO '{d}/part_out' (FORMAT parquet, PARTITION_BY (grp))"
        )
        assert tag == "COPY 4"
        # hive layout on disk, one dir per partition value
        assert sorted(
            n for n in os.listdir(f"{d}/part_out") if n.startswith("grp=")
        ) == ["grp=a", "grp=b", "grp=c"]
        # roundtrip: read back equals the original (partition col restored)
        back = spark.read.parquet(f"{d}/part_out")
        assert sorted(
            (r.id, r.grp, r.v) for r in back.collect()
        ) == [(1, "a", 1.5), (2, "a", 2.5), (3, "b", 3.5), (4, "c", 4.5)]
        # ... and through the validated COPY FROM path (name-aligned:
        # hive reads put partition columns last)
        eng.execute("CREATE TABLE cpd2 (id INT, grp TEXT, v DOUBLE)")
        assert (
            eng.execute(f"COPY cpd2 FROM '{d}/part_out' (FORMAT parquet)")
            == "COPY 4"
        )
        assert sorted(tuple(r) for r in spark.table("cpd2").collect()) == [
            (1, "a", 1.5), (2, "a", 2.5), (3, "b", 3.5), (4, "c", 4.5)
        ]
        # PER_THREAD_OUTPUT: a directory of part files, no single-file move
        tag = eng.execute(
            f"COPY cpd1 TO '{d}/pto_out' (FORMAT parquet, PER_THREAD_OUTPUT)"
        )
        assert tag == "COPY 4"
        assert os.path.isdir(f"{d}/pto_out")
        assert any(n.startswith("part-") for n in os.listdir(f"{d}/pto_out"))
        assert spark.read.parquet(f"{d}/pto_out").count() == 4
        # PG's WITH (…) spelling of the option list is accepted
        assert (
            eng.execute(f"COPY cpd1 TO '{d}/w.csv' WITH (FORMAT csv, HEADER)")
            == "COPY 4"
        )
        assert open(f"{d}/w.csv").read().splitlines()[0] == "id,grp,v"
        # PG's LEGACY bare option spelling (round-8 review: the option
        # validator must not reject what the pre-validator code honored)
        assert (
            eng.execute(f"COPY cpd1 TO '{d}/l.csv' CSV HEADER DELIMITER '|'")
            == "COPY 4"
        )
        assert open(f"{d}/l.csv").read().splitlines()[0] == "id|grp|v"
        with _pt.raises(PgError):
            eng.execute(f"COPY cpd1 TO '{d}/l2.csv' CSV FREEZE")
        # unknown COPY options error loudly, never silently ignored
        with _pt.raises(PgError) as ei:
            eng.execute(
                f"COPY cpd1 TO '{d}/x.parquet' (FORMAT parquet, COMPRESSION zstd)"
            )
        assert ei.value.pgcode == "0A000"
    finally:
        shutil.rmtree(d, ignore_errors=True)
        for t in ("cpd1", "cpd2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_copy_from_file_validates_constraints(spark):
    import shutil
    import tempfile

    import pytest as _pt

    from duck_server_spark.engine.errors import PgError
    from duck_server_spark.engine.executor import Engine

    eng = Engine(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("cpf3",):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    eng.execute("CREATE TABLE cpf3 (id INT PRIMARY KEY, v TEXT)")
    eng.execute("INSERT INTO cpf3 VALUES (1,'x')")
    d = tempfile.mkdtemp()
    try:
        spark.createDataFrame([(1, "dup")], "id INT, v STRING").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{d}/dir")
        import os

        part = next(f for f in os.listdir(f"{d}/dir") if f.startswith("part-"))
        os.rename(f"{d}/dir/{part}", f"{d}/dup.parquet")
        with _pt.raises(PgError) as ei:
            eng.execute(f"COPY cpf3 FROM '{d}/dup.parquet'")
        assert ei.value.pgcode == "23505"
        assert spark.table("cpf3").count() == 1  # nothing appended
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS cpf3")
        shutil.rmtree(f"{wh}/cpf3", ignore_errors=True)


def _subset_dump(src: str, dst: str, names: tuple) -> None:
    """Copy a dump directory keeping only the statements/data files that
    mention the given table/sequence names (EXPORT DATABASE is
    warehouse-global; suite runs legitimately have other tables)."""
    import os
    import re as _re
    import shutil as _sh

    os.makedirs(dst, exist_ok=True)
    pat = _re.compile(r"\b(" + "|".join(map(_re.escape, names)) + r")\b")
    for script in ("schema.sql", "load.sql"):
        with open(os.path.join(src, script)) as f:
            kept = [ln for ln in f.read().splitlines() if pat.search(ln)]
        with open(os.path.join(dst, script), "w") as f:
            f.write("\n".join(kept) + "\n")
    for fn in os.listdir(src):
        if fn.endswith((".parquet", ".csv")) and pat.search(fn):
            _sh.copy(os.path.join(src, fn), os.path.join(dst, fn))


def test_export_import_database_roundtrip(spark):
    """EXPORT DATABASE 'dir' → schema.sql (sequences + tables with
    constraints, in the engine's own dialect) + load.sql + one data file
    per table; IMPORT DATABASE replays both scripts through execute().
    Constraints, sequence high-water marks, and data all survive."""
    import shutil
    import tempfile

    import pytest as _pt

    from duck_server_spark.engine.errors import PgError
    from duck_server_spark.engine.executor import Engine

    eng = Engine(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("exp_a", "exp_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    eng.sequences.drop("exps", if_exists=True)
    eng.execute("CREATE SEQUENCE exps START 100")
    eng.execute(
        "CREATE TABLE exp_a (id INT PRIMARY KEY DEFAULT nextval('exps'), "
        "v TEXT NOT NULL, CHECK (length(v) > 0))"
    )
    eng.execute("CREATE TABLE exp_b (k INT, w DOUBLE)")
    eng.execute("INSERT INTO exp_a (v) VALUES ('x'), ('y')")
    eng.execute("INSERT INTO exp_b VALUES (1, 1.5), (2, 2.5)")
    d = tempfile.mkdtemp()
    try:
        assert eng.execute(f"EXPORT DATABASE '{d}/dump'") == "EXPORT DATABASE"
        import os

        listing = set(os.listdir(f"{d}/dump"))
        # EXPORT DATABASE is warehouse-global (DuckDB contract) — in a
        # full-suite run other modules' tables are legitimately present,
        # so assert CONTAINMENT and import a subset dump of OUR tables
        assert {"exp_a.parquet", "exp_b.parquet", "load.sql", "schema.sql"} <= listing
        _subset_dump(f"{d}/dump", f"{d}/sub", ("exp_a", "exp_b", "exps"))
        for t in ("exp_a", "exp_b"):
            eng.execute(f"DROP TABLE {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        eng.execute("DROP SEQUENCE exps")
        assert eng.execute(f"IMPORT DATABASE '{d}/sub'") == "IMPORT DATABASE"
        assert sorted(tuple(r) for r in spark.table("exp_a").collect()) == [
            (100, "x"), (101, "y")
        ]
        assert sorted(tuple(r) for r in spark.table("exp_b").collect()) == [
            (1, 1.5), (2, 2.5)
        ]
        # sequence resumes past the exported high-water mark
        assert eng.query("SELECT nextval('exps') AS n").collect()[0][0] == 102
        # PK and CHECK re-registered, not just data
        with _pt.raises(PgError) as ei:
            eng.execute("INSERT INTO exp_a VALUES (100, 'dup')")
        assert ei.value.pgcode == "23505"
        with _pt.raises(PgError) as ei:
            eng.execute("INSERT INTO exp_a VALUES (999, '')")
        assert ei.value.pgcode == "23514"
    finally:
        shutil.rmtree(d, ignore_errors=True)
        for t in ("exp_a", "exp_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        try:
            eng.execute("DROP SEQUENCE IF EXISTS exps")
        except Exception:  # noqa: BLE001
            pass


def test_copy_legacy_options_honored(spark):
    """ADVICE r8: every accepted legacy COPY word must be HONORED, not
    allow-listed and ignored — NULL 'NA' really maps nulls both ways,
    a bare CSV word really forces csv regardless of extension, and the
    unimplemented PG TEXT format errors 0A000 instead of silently
    writing something else."""
    import os
    import shutil
    import tempfile

    import pytest as _pt

    from duck_server_spark.engine.errors import PgError
    from duck_server_spark.engine.executor import Engine

    eng = Engine(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("cpl1", "cpl2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    eng.execute("CREATE TABLE cpl1 (id INT, name TEXT)")
    eng.execute("INSERT INTO cpl1 VALUES (1,'a'),(2,NULL),(3,'c')")
    eng.execute("CREATE TABLE cpl2 (id INT, name TEXT)")
    d = tempfile.mkdtemp()
    try:
        # NULL 'NA' on the writer: nulls become the token
        assert (
            eng.execute(f"COPY cpl1 TO '{d}/n.csv' (FORMAT csv, HEADER, NULL 'NA')")
            == "COPY 3"
        )
        body = open(f"{d}/n.csv").read()
        assert any(ln.endswith("NA") for ln in body.splitlines()[1:])
        # …and on the reader: the token comes back as NULL
        assert (
            eng.execute(f"COPY cpl2 FROM '{d}/n.csv' (FORMAT csv, HEADER, NULL 'NA')")
            == "COPY 3"
        )
        got = sorted(tuple(r) for r in spark.table("cpl2").collect())
        assert got == [(1, "a"), (2, None), (3, "c")]
        # legacy bare spelling honored too
        eng.execute("DELETE FROM cpl2")
        assert (
            eng.execute(f"COPY cpl1 TO '{d}/bn.csv' CSV HEADER NULL 'NA'")
            == "COPY 3"
        )
        assert (
            eng.execute(f"COPY cpl2 FROM '{d}/bn.csv' CSV HEADER NULL 'NA'")
            == "COPY 3"
        )
        assert sorted(tuple(r) for r in spark.table("cpl2").collect()) == [
            (1, "a"), (2, None), (3, "c")
        ]
        # bare CSV beats a misleading extension — no silent json output
        assert eng.execute(f"COPY cpl1 TO '{d}/x.json' CSV HEADER") == "COPY 3"
        assert open(f"{d}/x.json").read().splitlines()[0] == "id,name"
        # PG TEXT format is not implemented → loud 0A000, never a guess
        with _pt.raises(PgError) as ei:
            eng.execute(f"COPY cpl1 TO '{d}/t.txt' TEXT")
        assert ei.value.pgcode == "0A000"
    finally:
        shutil.rmtree(d, ignore_errors=True)
        for t in ("cpl1", "cpl2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    assert os.path.isdir(wh)


def test_copy_json_roundtrip_column_order(spark):
    """Spark's json reader returns fields ALPHABETICALLY — the import
    must align by NAME before the positional rename or a (name, id)
    table's own TO→FROM json round trip would put ids in the name column
    (review finding)."""
    import shutil
    import tempfile

    from duck_server_spark.engine.executor import Engine

    eng = Engine(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("cpj1", "cpj2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    # column order deliberately NON-alphabetical
    eng.execute("CREATE TABLE cpj1 (name TEXT, id INT)")
    eng.execute("INSERT INTO cpj1 VALUES ('a', 1), ('b', 2)")
    eng.execute("CREATE TABLE cpj2 (name TEXT, id INT)")
    d = tempfile.mkdtemp()
    try:
        eng.execute(f"COPY cpj1 TO '{d}/o.json'")
        assert eng.execute(f"COPY cpj2 FROM '{d}/o.json'") == "COPY 2"
        assert sorted(tuple(r) for r in spark.table("cpj2").collect()) == [
            ("a", 1), ("b", 2)
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)
        for t in ("cpj1", "cpj2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_export_preserves_defaults_and_literal_semicolons(spark):
    """Review findings: plain column DEFAULTs must survive the dump
    (schema.sql) and IMPORT must split statements literal-aware (a CHECK
    containing ';' must not break the script replay)."""
    import shutil
    import tempfile

    from duck_server_spark.engine.executor import Engine

    eng = Engine(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS exp_d")
    shutil.rmtree(f"{wh}/exp_d", ignore_errors=True)
    eng.execute(
        "CREATE TABLE exp_d (id INT, tag TEXT DEFAULT 'none', "
        "s TEXT CHECK (s <> 'a;b'))"
    )
    eng.execute("INSERT INTO exp_d VALUES (1, 'x', 'ok')")
    d = tempfile.mkdtemp()
    try:
        eng.execute(f"EXPORT DATABASE '{d}/dump'")
        assert "DEFAULT 'none'" in open(f"{d}/dump/schema.sql").read()
        _subset_dump(f"{d}/dump", f"{d}/sub", ("exp_d",))
        eng.execute("DROP TABLE exp_d")
        shutil.rmtree(f"{wh}/exp_d", ignore_errors=True)
        eng.execute(f"IMPORT DATABASE '{d}/sub'")
        # default survives: omitted column fills 'none', not NULL
        eng.execute("INSERT INTO exp_d (id, s) VALUES (2, 'fine')")
        rows = {tuple(r) for r in spark.table("exp_d").collect()}
        assert (2, "none", "fine") in rows and (1, "x", "ok") in rows
        # the semicolon CHECK survived intact and still enforces
        import pytest as _pt

        from duck_server_spark.engine.errors import PgError

        with _pt.raises(PgError) as ei:
            eng.execute("INSERT INTO exp_d VALUES (3, 't', 'a;b')")
        assert ei.value.pgcode == "23514"
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS exp_d")
        shutil.rmtree(f"{wh}/exp_d", ignore_errors=True)
