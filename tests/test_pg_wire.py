"""Live-Postgres K1/K2 validation over the wire-protocol sink.

Spins up a REAL `postgres` server (the sandbox ships Postgres 15
binaries; no JDBC jar / Python driver exists, hence the stdlib wire
client in sources/pg_wire.py) in a throwaway data dir with trust auth,
then drives the reference's sink contract against it:
DDL-from-schema overwrite (K1, flows/etl.py:256-279) and chunked
partition-parallel append (K2, chunksize ≙ 5000). Skips cleanly when
the server binaries are unavailable or refuse to start.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import time
import uuid

import pytest

from etl_project_spark.sources.pg_wire import PgError, PgWireClient, write_postgres_wire

PG_PORT = 54901
PG_USER = "pguser"


def _run(cmd: list[str] | str, **kw) -> subprocess.CompletedProcess:
    return subprocess.run(
        cmd, capture_output=True, text=True, shell=isinstance(cmd, str), **kw
    )


@pytest.fixture(scope="module")
def pg_server():
    if shutil.which("initdb") is None or shutil.which("pg_ctl") is None:
        pytest.skip("postgres server binaries not installed")
    scratch = tempfile.mkdtemp(prefix="pgwire_")
    data = os.path.join(scratch, "data")

    as_root = os.geteuid() == 0
    if as_root:
        # postgres refuses to run as root: run it as a throwaway user
        _run(["useradd", "-m", PG_USER])  # idempotent-enough (exit 9 if exists)
        _run(["chown", "-R", PG_USER, scratch])
        wrap = lambda sh: _run(["su", PG_USER, "-c", sh])  # noqa: E731
    else:
        wrap = _run

    r = wrap(f"initdb -D {data} -A trust -U {PG_USER}")
    if r.returncode != 0:
        shutil.rmtree(scratch, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    r = wrap(
        f"pg_ctl -D {data} -l {scratch}/log -o '-p {PG_PORT} -k {scratch}' start"
    )
    if r.returncode != 0:
        shutil.rmtree(scratch, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")
    # wait until the wire port answers
    for _ in range(50):
        try:
            PgWireClient("127.0.0.1", PG_PORT, PG_USER, "postgres").close()
            break
        except OSError:
            time.sleep(0.2)
    else:
        wrap(f"pg_ctl -D {data} stop -m immediate")
        shutil.rmtree(scratch, ignore_errors=True)
        pytest.skip("postgres did not become ready")
    yield {"host": "127.0.0.1", "port": PG_PORT, "user": PG_USER,
           "database": "postgres"}
    wrap(f"pg_ctl -D {data} stop -m immediate")
    shutil.rmtree(scratch, ignore_errors=True)


def test_wire_client_roundtrip(pg_server):
    cli = PgWireClient(**pg_server)
    try:
        cols, rows = cli.query("SELECT 1 AS one, 'it''s' AS s, NULL AS n")
        assert cols == ["one", "s", "n"]
        assert rows == [("1", "it's", None)]
        with pytest.raises(PgError):
            cli.query("SELECT * FROM table_that_does_not_exist")
        # connection must resync after an error
        assert cli.query("SELECT 2")[1] == [("2",)]
    finally:
        cli.close()


def test_k1_k2_live_postgres(spark, pg_server):
    """Overwrite creates the table from the DataFrame schema; append
    doubles the rows; values (quotes, NULLs, timestamps, doubles)
    survive exactly; inserts are chunked (batch_rows < partition
    size) and partition-parallel."""
    from pyspark.sql import functions as F

    table = "shops_" + uuid.uuid4().hex[:8]
    df = (
        spark.range(0, 2000, 1, 8)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("it's #"), F.col("id")).alias("name"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.col("id") * 1.5)
            .alias("score"),
            F.to_timestamp(F.lit("2024-03-01 12:00:00")).alias("seen"),
            (F.col("id") % 2 == 0).alias("flag"),
        )
    )
    write_postgres_wire(df, table=table, mode="overwrite", batch_rows=300,
                        **pg_server)
    write_postgres_wire(df, table=table, mode="append", batch_rows=300,
                        **pg_server)

    cli = PgWireClient(**pg_server)
    try:
        _c, rows = cli.query(
            f'SELECT COUNT(*), SUM(k), COUNT(score), COUNT(*) FILTER (WHERE flag) FROM "{table}"'
        )
        n, sum_k, n_score, n_flag = rows[0]
        assert int(n) == 4000
        assert int(sum_k) == 2 * sum(range(2000))
        assert int(n_score) == 2 * len([i for i in range(2000) if i % 7 != 0])
        assert int(n_flag) == 2000
        _c, r = cli.query(
            f'SELECT name, score, seen FROM "{table}" WHERE k = 3 LIMIT 1'
        )
        assert r[0][0] == "it's #3"
        assert float(r[0][1]) == 4.5
        assert r[0][2] == "2024-03-01 12:00:00"
        # K1: overwrite must reset, not append
        write_postgres_wire(df.limit(10), table=table, mode="overwrite",
                            **pg_server)
        assert int(cli.query(f'SELECT COUNT(*) FROM "{table}"')[1][0][0]) == 10
    finally:
        cli.close()


def test_lit_nonfinite_floats_and_bytes():
    """ADVICE r7: str(nan) produced the bare token `nan` — invalid SQL
    aborting the whole partition INSERT. Postgres accepts the QUOTED
    'NaN'/'Infinity' spellings for float types; bytes must be rejected
    loudly instead of serializing the b'..' repr as text."""
    from etl_project_spark.sources.pg_wire import _ident, _lit

    assert _lit(float("nan")) == "'NaN'"
    assert _lit(float("inf")) == "'Infinity'"
    assert _lit(float("-inf")) == "'-Infinity'"
    assert _lit(1.5) == "1.5"
    assert _lit(True) == "TRUE"
    assert _lit(None) == "NULL"
    assert _lit("o'brien") == "'o''brien'"
    with pytest.raises(TypeError, match="binary"):
        _lit(b"\x00\x01")
    with pytest.raises(TypeError, match="binary"):
        _lit(bytearray(b"x"))
    # identifier quoting: embedded double quotes cannot break out
    assert _ident('x" y') == '"x"" y"'
    assert _ident("plain") == '"plain"'


def test_lit_nonfinite_roundtrip_live(pg_server):
    """The quoted spellings actually insert and read back on a real
    server (DOUBLE PRECISION column)."""
    cli = PgWireClient(pg_server["host"], pg_server["port"],
                       pg_server["user"], pg_server["database"])
    try:
        cli.query('DROP TABLE IF EXISTS "t_nonfinite"')
        cli.query('CREATE TABLE "t_nonfinite" (x DOUBLE PRECISION)')
        from etl_project_spark.sources.pg_wire import _lit

        vals = [float("nan"), float("inf"), float("-inf"), 2.75]
        cli.query(
            'INSERT INTO "t_nonfinite" (x) VALUES '
            + ", ".join(f"({_lit(v)})" for v in vals)
        )
        _cols, rows = cli.query('SELECT x::text FROM "t_nonfinite" ORDER BY x')
        got = {r[0] for r in rows}
        assert got == {"NaN", "Infinity", "-Infinity", "2.75"}
    finally:
        cli.close()
