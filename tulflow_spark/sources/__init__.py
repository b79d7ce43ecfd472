"""Sources: OAI-PMH harvest, XML collection files, Alma SFTP tarballs,
boundwith lookup CSV (SURVEY.md §2.1).

Re-exports are lazy (PEP 562): the streaming lake sources live in this
package, so every Python DataSource worker spawn (planner, streaming
runner, read tasks) imports ``tulflow_spark.sources`` — an eager
``tarball`` import here dragged pandas+numpy (~0.3 s) into each of those
short-lived processes.
"""

_EXPORTS = {
    "read_boundwith_lookup": "tulflow_spark.sources.lookup",
    "read_alma_tarballs": "tulflow_spark.sources.tarball",
}


def __getattr__(name: str):
    target = _EXPORTS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target), name)


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
