"""Name → path catalog (the reference's ``table_relation`` short-name
mapping, meta/MetaTableManage.scala:228-244, and the catalog half of
catalog/StarLakeCatalog.scala:51-546).

A JSON file in the warehouse directory maps short table names to table
paths; `StarTable.for_name` resolves through it. Single-file atomic
rename keeps it consistent for the single-driver test rig; the API is
the swap point for a real catalog service.
"""

from __future__ import annotations

import json
import os
import uuid

DEFAULT_WAREHOUSE = os.environ.get("STARLAKE_WAREHOUSE", "/tmp/starlake_warehouse")


def _catalog_path(warehouse: str | None = None) -> str:
    wh = warehouse or DEFAULT_WAREHOUSE
    os.makedirs(wh, exist_ok=True)
    return os.path.join(wh, "_catalog.json")


def _load(warehouse: str | None = None) -> dict[str, str]:
    p = _catalog_path(warehouse)
    if not os.path.isfile(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _save(d: dict[str, str], warehouse: str | None = None) -> None:
    p = _catalog_path(warehouse)
    tmp = f"{p}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(d, f, indent=1, sort_keys=True)
    os.rename(tmp, p)


def register(name: str, path: str, warehouse: str | None = None) -> None:
    d = _load(warehouse)
    existing = d.get(name)
    if existing is not None and os.path.abspath(existing) != os.path.abspath(path):
        raise ValueError(f"short name '{name}' already maps to {existing}")
    d[name] = os.path.abspath(path)
    _save(d, warehouse)


def resolve(name: str, warehouse: str | None = None) -> str:
    d = _load(warehouse)
    if name not in d:
        raise KeyError(f"unknown table name '{name}'")
    return d[name]


def unregister(name: str, warehouse: str | None = None) -> None:
    d = _load(warehouse)
    d.pop(name, None)
    _save(d, warehouse)


def list_tables(warehouse: str | None = None) -> dict[str, str]:
    return dict(_load(warehouse))
