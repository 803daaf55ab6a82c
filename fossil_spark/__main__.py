"""Daemon entry point: `python -m fossil_spark serve` runs the wire
server + Prometheus metrics endpoint — the long-running process the
deploy/ Dockerfile and Kubernetes manifests package (the reference
ships the same trio: server daemon, /metrics, dashboards —
reference cmd/, deploy/kubernetes, deploy/grafana).

    python -m fossil_spark serve \
        --data /data --databases default,events \
        --host 0.0.0.0 --port 8001 --metrics-port 2112

On a cluster, launch via spark-submit so the session picks up the
cluster master; locally it falls back to local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import threading


def resolve_databases(args, cfg: dict) -> dict[str, str]:
    """CLI flags override the TOML config (reference precedence:
    viper flags > config file > defaults). --databases/--data given
    -> flag layout; otherwise the config's [database.*] sections."""
    if args.databases is not None or args.data is not None:
        data = args.data or "./data"
        names = (args.databases or "default").split(",")
        return {n.strip(): os.path.join(data, n.strip())
                for n in names if n.strip()}
    return dict(cfg["databases"])


def _serve(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="fossil_spark serve")
    ap.add_argument("--config", default=None,
                    help="TOML config (reference config.default.toml shape);"
                         " also searched in config/, /etc/fossil, ~/.fossil, .")
    ap.add_argument("--data", default=None,
                    help="root directory; each database is a subdirectory")
    ap.add_argument("--databases", default=None,
                    help="comma-separated database names")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--metrics-port", type=int, default=None)
    ap.add_argument("--flush-every", type=int, default=1000,
                    help="micro-batch size (rows) per parquet commit")
    ap.add_argument("--compact-every", type=int, default=50,
                    help="compact fragmented partitions every N flushes; 0 off")
    ap.add_argument("--max-query-rows", type=int, default=100_000)
    args = ap.parse_args(argv)

    from fossil_spark.config import load_config
    from fossil_spark.server import FossilServer
    from fossil_spark.session import get_spark

    cfg = load_config(args.config)
    if args.port is None:
        args.port = int(cfg["fossil"]["port"])
    if args.metrics_port is None:
        args.metrics_port = int(cfg["fossil"]["prom-port"])

    spark = get_spark("fossil_spark-server")
    dbs = resolve_databases(args, cfg)
    srv = FossilServer(
        spark, dbs, host=args.host, port=args.port,
        flush_every=args.flush_every, compact_every=args.compact_every,
        max_query_rows=args.max_query_rows,
    ).start()
    mport = srv.start_metrics_http(args.host, args.metrics_port)
    print(f"fossil_spark server on {srv.host}:{srv.port}"
          f" (metrics :{mport}, databases: {', '.join(dbs)})", flush=True)

    stop = threading.Event()

    def _sig(signum, _frame):
        print(f"signal {signum}: flushing and shutting down", flush=True)
        stop.set()

    signal.signal(signal.SIGTERM, _sig)
    signal.signal(signal.SIGINT, _sig)
    stop.wait()
    srv.stop()  # flushes every database's micro-batch before exit
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = list(argv) if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "serve":
        return _serve(rest)
    if cmd == "repl":
        from fossil_spark.cli import main as cli_main

        return cli_main(rest)
    print(f"unknown command {cmd!r} (use: serve, repl)", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
