"""CLI command parity (docs/cli.md): use/list/append/query/stats."""

import os
import shutil
import uuid

import pytest

from fossil_spark.cli import Client


@pytest.fixture()
def client(spark):
    root = os.path.join("build", f"cli_test_{uuid.uuid4().hex[:8]}")
    os.makedirs(root)
    c = Client(root)
    yield c
    shutil.rmtree(root, ignore_errors=True)


def test_cli_roundtrip(client):
    assert client.execute("use events").startswith("201")
    assert client.execute("append /logs something happened") == "200 Ok"
    assert client.execute("append /logs/web GET /index") == "200 Ok"
    assert client.execute("append bare data on root topic") == "200 Ok"

    topics = client.execute("list topics")
    assert "/logs" in topics and "/logs/web" in topics and "/" in topics

    dbs = client.execute("list")
    assert "events" in dbs

    out = client.execute("query all in /logs")
    assert "something happened" in out and "GET /index" in out

    out = client.execute("query all in /logs | map log -> len(log)")
    assert "18" in out  # len("something happened")

    stats = client.execute("stats")
    assert "/logs:" in stats


def test_cli_len_exact(client):
    client.execute("use lentest")
    client.execute("append /x abcde")
    out = client.execute("query all | map s -> len(s)")
    # aligned-table format: last data row, last cell
    assert out.splitlines()[-2].strip("| ").split("|")[-1].strip() == "5"


def test_store_sql_interface(client):
    client.execute("use sqldb")
    client.execute("append /m 10")
    client.execute("append /m 20")
    rows = client.store.sql(
        "SELECT topic, count(*) AS n, sum(CAST(value AS DOUBLE)) AS total "
        "FROM store GROUP BY topic"
    ).collect()
    assert [(r["topic"], r["n"], r["total"]) for r in rows] == [("/m", 2, 30.0)]


def test_cli_errors_are_messages(client):
    out = client.execute("query frobnicate")
    assert out.startswith("500")
    out = client.execute("wat")
    assert out.startswith("400")
    # query on an empty store errors gracefully, not a traceback
    client.execute("use emptydb")
    out = client.execute("query all")
    assert out.startswith("500") or out == "(empty)"


def test_parse_connection_string():
    """Reference format parity (pkg/proto/connectionstring.go)."""
    from fossil_spark.cli import parse_connection_string as p

    assert p("./local/db") == {"local": True, "address": "./local/db",
                               "database": "default"}
    assert p("file://./path/db") == {"local": True, "address": "./path/db",
                                     "database": "default"}
    assert p("fossil://h:2001/mydb") == {"local": False, "address": "h:2001",
                                         "database": "mydb"}
    assert p("fossil://h:2001") == {"local": False, "address": "h:2001",
                                    "database": "default"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown protocol"):
        p("http://nope")


def test_format_table_variants():
    from fossil_spark.cli import format_table

    headers = ["time", "topic", "data"]
    rows = [["t1", "/a", "1.5"], ["t2", "/bb", "2"]]
    text = format_table(headers, rows)
    lines = text.splitlines()
    assert lines[0].startswith("+") and lines[0].endswith("+")
    assert "| time" in lines[1] and "| topic" in lines[1]
    assert len({len(ln) for ln in lines}) == 1  # aligned

    csv_out = format_table(headers, rows, "csv")
    assert csv_out.splitlines()[0] == "time,topic,data"
    assert csv_out.splitlines()[1] == "t1,/a,1.5"

    import json

    js = json.loads(format_table(headers, rows, "json"))
    assert js[0] == {"time": "t1", "topic": "/a", "data": "1.5"}


def test_flag_parsing_is_position_independent():
    """Flags are stripped (with validated values) before the
    positional connection string is read — a leading --format must
    never be mistaken for a database path."""
    from fossil_spark.cli import _take_flag

    rest, fmt = _take_flag(["--format", "json", "mydb"], "--format",
                           {"text", "csv", "json"})
    assert (rest, fmt) == (["mydb"], "json")
    rest, val = _take_flag(["mydb"], "--db")
    assert (rest, val) == (["mydb"], None)

    with pytest.raises(SystemExit, match="requires a value"):
        _take_flag(["mydb", "--format"], "--format", {"text"})
    with pytest.raises(SystemExit, match="must be one of"):
        _take_flag(["--format", "yaml", "mydb"], "--format",
                   {"text", "csv", "json"})


def test_main_rejects_bad_format_without_touching_fs():
    from fossil_spark import cli

    before = set(os.listdir("."))
    with pytest.raises(SystemExit):
        cli.main(["--format"])
    with pytest.raises(SystemExit):
        cli.main(["--format", "yaml", "somedb"])
    assert set(os.listdir(".")) == before
    assert not os.path.exists("--format")


# --- TOML config (reference config.default.toml parity) ---------------------

def test_load_config_reference_shape(tmp_path):
    from fossil_spark.config import load_config

    p = tmp_path / "config.toml"
    p.write_text(
        '[fossil]\nport = 9001\nprom-port = 3112\n'
        'host = "fossil://localhost:9001/default"\nlocal = true\nverbose = 2\n\n'
        '[database]\ndirectory = "./data"\n\n'
        '[database.test]\n\n'
        '[database.prod]\ndirectory = "/mnt/prod"\n'
    )
    cfg = load_config(str(p))
    assert cfg["fossil"]["port"] == 9001
    assert cfg["fossil"]["prom-port"] == 3112
    assert cfg["fossil"]["host"] == "fossil://localhost:9001/default"
    # named databases: per-db directory override, else shared/<name>
    assert cfg["databases"]["prod"] == "/mnt/prod"
    assert cfg["databases"]["test"] == os.path.join("./data", "test")
    assert "default" not in cfg["databases"]


def test_load_config_defaults_without_file():
    from fossil_spark.config import DEFAULTS, load_config

    cfg = load_config(None)  # no config anywhere on the search path
    assert cfg["fossil"]["port"] == DEFAULTS["port"]
    assert cfg["databases"] == {"default": os.path.join("./data", "default")}


def test_load_config_scalar_only_database_section(tmp_path):
    from fossil_spark.config import load_config

    p = tmp_path / "c.toml"
    p.write_text('[database]\ndirectory = "/srv/fossil"\n')
    cfg = load_config(str(p))
    assert cfg["databases"] == {"default": os.path.join("/srv/fossil", "default")}


def test_serve_database_resolution_precedence(tmp_path):
    import argparse

    from fossil_spark.__main__ import resolve_databases
    from fossil_spark.config import load_config

    p = tmp_path / "c.toml"
    p.write_text('[database]\ndirectory = "/srv"\n[database.a]\n[database.b]\n')
    cfg = load_config(str(p))
    ns = argparse.Namespace(data=None, databases=None)
    assert resolve_databases(ns, cfg) == {
        "a": os.path.join("/srv", "a"), "b": os.path.join("/srv", "b")
    }
    # CLI flags win over the config
    ns = argparse.Namespace(data="/tmp/x", databases="only")
    assert resolve_databases(ns, cfg) == {"only": os.path.join("/tmp/x", "only")}
