"""Solr URL construction (reference: tasks.py:73-106 ``get_solr_url`` —
scheme and port defaulting from a connection-like object)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Connection:
    """Minimal stand-in for an Airflow connection."""

    host: str
    schema: str | None = None  # 'http' / 'https'
    port: int | None = None
    login: str | None = None
    password: str | None = None


def get_solr_url(conn: Connection, core: str) -> str:
    """scheme defaults to http unless the host already carries one; port is
    appended only when set (tasks.py:73-106 semantics)."""
    host = conn.host or ""
    if not host.startswith(("http://", "https://")):
        scheme = conn.schema if conn.schema in ("http", "https") else "http"
        host = f"{scheme}://{host}"
    if conn.port:
        host = f"{host}:{conn.port}"
    return f"{host}/solr/{core}"


def get_solr_url_template(conn_id: str, core: str) -> str:
    """Jinja-templated variant for orchestrator connection resolution
    (reference: tasks.py get_solr_url_template — the URL is assembled at
    task-render time from a named connection)."""
    host = f"{{{{ conn.{conn_id}.host }}}}"
    schema = f"{{{{ conn.{conn_id}.schema }}}}"
    port = f"{{{{ conn.{conn_id}.port }}}}"
    return f"{schema}://{host}:{port}/solr/{core}"


def should_trigger(condition_param: str, config: dict) -> bool:
    """Conditional downstream-pipeline trigger predicate (reference:
    tasks.py:108-118 conditionally_trigger): truthy config[condition_param]
    → run the downstream job."""
    return bool(config.get(condition_param))
