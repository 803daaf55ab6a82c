"""Interactive client for fossil_spark stores — command parity with
the reference CLI (/root/reference/docs/cli.md):

    USE <db>            switch store (a directory of event stores)
    LIST                list stores          LIST TOPICS   list topics
    APPEND [<topic>] <data>                  append a datum (~now)
    QUERY <fql>                              run an FQL query
    EXPLAIN <fql>                            show the compiled Spark plan
    SCHEMA <topic> [<schema>]                get / declare a topic schema
    STATS                                    per-topic stats

Usage:  python -m fossil_spark.cli <root_dir> [--db default]
        python -m fossil_spark.cli --connect host:port
        python -m fossil_spark.cli fossil://host:port/dbname
        python -m fossil_spark.cli file://./path/to/root
Each logical database is a subdirectory of <root_dir> (mirrors the
reference's `database.<name>` config blocks mapping to directories).
With --connect, commands go over the wire protocol to a running
FossilServer instead (the reference CLI's client mode: `fossil -h`).
"""

from __future__ import annotations

import os
import shlex
import sys
from datetime import datetime, timezone

from fossil_spark.session import get_spark
from fossil_spark.store import EventStore


def format_table(headers: list[str], rows: list[list], fmt: str = "text") -> str:
    """Query-output formats matching the reference writers
    (pkg/repl/writer.go): aligned text table (default), csv, json."""
    if fmt == "csv":
        import csv
        import io

        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(headers)
        w.writerows(rows)
        return buf.getvalue().rstrip("\n")
    if fmt == "json":
        import json

        return json.dumps(
            [dict(zip(headers, (str(v) for v in r))) for r in rows], indent=1
        )
    cells = [[str(v) for v in r] for r in rows]
    widths = [
        max(len(h), *(len(c[i]) for c in cells)) if cells else len(h)
        for i, h in enumerate(headers)
    ]
    def line(vals):
        return "| " + " | ".join(v.ljust(w) for v, w in zip(vals, widths)) + " |"
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, line(headers), sep]
    out += [line(c) for c in cells]
    out.append(sep)
    return "\n".join(out)


class Client:
    def __init__(self, root: str, db: str = "default", fmt: str = "text"):
        self.root = root
        self.spark = get_spark("fossil_spark-cli")
        self.spark.sparkContext.setLogLevel("ERROR")
        self.db = db
        self.fmt = fmt

    @property
    def store(self) -> EventStore:
        return EventStore(self.spark, os.path.join(self.root, self.db))

    def execute(self, line: str) -> str:
        line = line.strip()
        if not line:
            return ""
        cmd, _, rest = line.partition(" ")
        cmd = cmd.lower()
        try:
            if cmd == "use":
                self.db = rest.strip() or "default"
                return f"201 database changed to {self.db}"
            if cmd == "list":
                if rest.strip().lower() == "topics":
                    rows = self.store.topics().collect()
                    return "\n".join(r["topic"] for r in rows) or "(no topics)"
                if not os.path.isdir(self.root):
                    return "(no databases)"
                return "\n".join(sorted(
                    d for d in os.listdir(self.root)
                    if os.path.isdir(os.path.join(self.root, d))
                )) or "(no databases)"
            if cmd == "append":
                parts = shlex.split(rest, posix=False)
                if parts and parts[0].startswith("/"):
                    topic, data = parts[0], rest.split(parts[0], 1)[1].strip()
                else:
                    topic, data = "/", rest
                self.store.append_rows(
                    [(datetime.now(timezone.utc).replace(tzinfo=None), topic, data)]
                )
                return "200 Ok"
            if cmd == "format":
                self.fmt = rest.strip().lower() or "text"
                return f"200 output format {self.fmt}"
            if cmd == "query":
                df = self.store.query(rest)
                rows = df.limit(50).collect()
                if not rows:
                    return "(empty)"
                return format_table(df.columns, [list(r) for r in rows], self.fmt)
            if cmd == "stats":
                rows = self.store.stats().collect()
                return "\n".join(
                    f"{r['topic']}: n={r['n']} span=[{r['first_time']} .. {r['last_time']}]"
                    for r in rows
                ) or "(empty database)"
            if cmd == "explain":
                import contextlib
                import io

                df = self.store.query(rest)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                return buf.getvalue().strip()
            if cmd == "schema":
                parts = rest.split(None, 1)
                if len(parts) == 1:
                    return self.store.schema_for_topic(parts[0]).text
                topic, schema_text = parts
                self.store.set_schema(topic, schema_text)
                return f"200 schema set on {topic}"
            if cmd in ("quit", "exit"):
                raise EOFError
            return f"400 unknown command {cmd!r} (use/list/append/query/schema/stats)"
        except EOFError:
            raise
        except Exception as e:  # surface engine errors like the reference does
            return f"500 {type(e).__name__}: {e}"


class RemoteClient:
    """Same command surface, executed over the wire protocol against a
    running FossilServer (reference client mode, api/remote.go).
    Backed by a FossilClientPool — `pool_size` connections with
    reconnect-with-backoff, so a server restart mid-session retries
    instead of killing the REPL (reference api/api.go NewClient =
    NewClientPool(connstr, 1))."""

    def __init__(self, host: str, port: int, fmt: str = "text",
                 pool_size: int = 1, db: str | None = None):
        from fossil_spark.server import FossilClientPool

        self.conn = FossilClientPool(host, port, size=pool_size, db=db)
        self.fmt = fmt

    def execute(self, line: str) -> str:
        line = line.strip()
        if not line:
            return ""
        cmd, _, rest = line.partition(" ")
        cmd = cmd.lower()
        try:
            if cmd == "use":
                return "201 " + self.conn.use(rest.strip() or "default")
            if cmd == "list":
                obj = rest.strip().lower() or "databases"
                return "\n".join(self.conn.list(obj)) or f"(no {obj})"
            if cmd == "append":
                parts = shlex.split(rest, posix=False)
                if parts and parts[0].startswith("/"):
                    topic, data = parts[0], rest.split(parts[0], 1)[1].strip()
                else:
                    topic, data = "/", rest
                # reference REPL parity (pkg/repl/parser.go:55): encode
                # the typed literal per the topic schema before sending
                self.conn.append_literal(topic, data)
                return "200 Ok"
            if cmd == "format":
                self.fmt = rest.strip().lower() or "text"
                return f"200 output format {self.fmt}"
            if cmd == "query":
                rows = self.conn.query(rest)
                if not rows:
                    return "(empty)"
                # reference column order: time, topic, schema, data
                # (proto/message.go QueryResponse.Headers)
                return format_table(
                    ["time", "topic", "schema", "data"],
                    [[r["time"], r["topic"], r["schema"], r["data"]]
                     for r in rows[:50]],
                    self.fmt,
                )
            if cmd == "stats":
                st = self.conn.stats()
                return (f"segments={st['segments']} topics={st['topics']} "
                        f"uptime={st['uptime']}")
            if cmd == "schema":
                parts = rest.split(None, 1)
                if len(parts) == 2:
                    self.conn.create(parts[0], parts[1])
                    return f"200 schema set on {parts[0]}"
                from fossil_spark.schema import TopicRegistry

                reg = TopicRegistry()
                for s in self.conn.list("schemas"):
                    topic, text = s.split(" ", 1)
                    reg.set(topic, text)
                return reg.get(parts[0]).text
            if cmd in ("quit", "exit"):
                raise EOFError
            return f"400 unknown command {cmd!r} (use/list/append/query/schema/stats)"
        except EOFError:
            raise
        except Exception as e:
            return f"500 {type(e).__name__}: {e}"


def parse_connection_string(conn: str) -> dict:
    """Reference connection-string formats
    (pkg/proto/connectionstring.go ParseConnectionString):

        ./path/to/local/db          -> local
        file://./path/to/local/db   -> local
        fossil://host:port[/dbname] -> remote (db defaults to 'default')

    Any other scheme is an error; everything else parses."""
    from urllib.parse import urlparse

    if "://" not in conn:
        return {"local": True, "address": conn, "database": "default"}
    u = urlparse(conn)
    if u.scheme == "file":
        return {
            "local": True,
            "address": (u.netloc + u.path) or ".",
            "database": "default",
        }
    if u.scheme == "fossil":
        return {
            "local": False,
            "address": u.netloc,
            "database": u.path.strip("/") or "default",
        }
    raise ValueError(f"unknown protocol {u.scheme!r} (use fossil:// or file://)")


def _take_flag(
    args: list[str], name: str, valid: set[str] | None = None
) -> tuple[list[str], str | None]:
    """Remove `name value` from args and return (rest, value). A flag
    with no following value, or a value outside `valid`, is a usage
    error — never silently treated as the connection string."""
    if name not in args:
        return args, None
    i = args.index(name)
    if i + 1 >= len(args):
        raise SystemExit(f"{name} requires a value")
    value = args[i + 1]
    if valid is not None and value not in valid:
        raise SystemExit(
            f"{name} must be one of {', '.join(sorted(valid))}; got {value!r}"
        )
    return args[:i] + args[i + 2:], value


def main(argv: list[str] | None = None) -> int:
    args = list(argv) if argv is not None else sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    # text | csv | json (pkg/repl/writer.go); flags are stripped before
    # the positional connection string is read, so a leading flag can't
    # masquerade as a database path
    args, fmt = _take_flag(args, "--format", {"text", "csv", "json"})
    args, connect = _take_flag(args, "--connect")
    args, db_flag = _take_flag(args, "--db")
    args, config_flag = _take_flag(args, "--config")
    if connect is None and not args:
        # no target on the command line: fall back to the TOML config's
        # fossil.host connection string (reference cmd/fossil/client.go)
        from fossil_spark.config import load_config

        cfg = load_config(config_flag)
        if cfg["fossil"]["host"]:
            args = [str(cfg["fossil"]["host"])]
            fmt = fmt or str(cfg["fossil"].get("output") or "text")
    fmt = fmt or "text"
    if fmt not in {"text", "csv", "json"}:
        fmt = "text"
    if connect is not None:
        host, _, port = connect.partition(":")
        client = RemoteClient(host, int(port), fmt)
        print(f"fossil_spark client — connected to {host}:{port}")
    else:
        if not args:
            print(__doc__)
            return 2
        cs = parse_connection_string(args[0])
        if not cs["local"]:
            host, _, port = cs["address"].partition(":")
            client = RemoteClient(host, int(port), fmt)
            client.execute(f"use {cs['database']}")
            print(f"fossil_spark client — connected to {cs['address']}"
                  f" (database {cs['database']!r})")
        else:
            root = cs["address"]
            db = db_flag if db_flag is not None else cs["database"]
            client = Client(root, db, fmt)
            print(f"fossil_spark client — database {db!r} at {root}")
    while True:
        try:
            line = input("> ")
        except EOFError:
            print()
            return 0
        try:
            out = client.execute(line)
        except EOFError:
            return 0
        if out:
            print(out)


if __name__ == "__main__":
    raise SystemExit(main())
