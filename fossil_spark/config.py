"""TOML configuration, byte-compatible with the reference's
config.default.toml (cmd/fossil/config.go):

    [fossil]
    port = 8001
    prom-port = 2112
    host = "fossil://localhost:8001/default"
    local = true
    verbose = 2

    [database]
    directory = "./data"

    [database.test]          # named databases; optional per-db
    [database.prod]          # directory overrides the shared root
    directory = "/mnt/prod"

Search order mirrors the reference (first hit wins, explicit path
overrides): ./config, /etc/fossil, /usr/local/etc/fossil, ~/.fossil,
then the working directory. Parsed with stdlib tomllib — no new
dependencies.
"""

from __future__ import annotations

import os
import tomllib

SEARCH_PATHS = (
    "config",
    "/etc/fossil",
    "/usr/local/etc/fossil",
    os.path.expanduser("~/.fossil"),
    ".",
)

DEFAULTS = {
    "port": 8001,
    "prom-port": 2112,
    "host": "",
    "local": True,
    "verbose": 0,
    "output": "text",
}


def find_config(explicit: str | None = None) -> str | None:
    if explicit:
        return explicit
    for d in SEARCH_PATHS:
        for name in ("config.toml", "config.default.toml"):
            p = os.path.join(d, name)
            if os.path.isfile(p):
                return p
    return None


def load_config(path: str | None = None) -> dict:
    """Load and normalize. Returns
    {"fossil": {...DEFAULTS merged...},
     "databases": {name: directory}}.

    Database resolution follows cmd/fossil/config.go:44-63 +
    server.go:45-54: every [database.NAME] sub-table is a named
    database whose directory is its own `directory` key if present,
    else <shared directory>/<NAME>; scalar keys directly under
    [database] (e.g. `directory`) configure the shared root; if no
    sub-tables exist, the single database is `default`."""
    raw: dict = {}
    p = find_config(path)
    if p is not None:
        with open(p, "rb") as f:
            raw = tomllib.load(f)
    fossil = {**DEFAULTS, **raw.get("fossil", {})}
    dbsec = raw.get("database", {})
    shared = str(dbsec.get("directory", "./data"))
    names = [k for k, v in dbsec.items() if isinstance(v, dict)]
    if not names:
        names = ["default"]
    databases = {}
    for name in names:
        sub = dbsec.get(name, {}) if isinstance(dbsec.get(name), dict) else {}
        databases[name] = str(sub.get("directory") or os.path.join(shared, name))
    return {"fossil": fossil, "databases": databases, "path": p}
