"""Rule-set fetching (reference: process.py:94-103 ``get_github_content`` —
XSL/Schematron rule files pulled from a repo at task start).

Driver-side by design: rule sets are query *configuration*, fetched once and
broadcast into compiled column expressions — never fetched per record or per
executor.  Unlike the reference, an HTTP failure raises a typed error
instead of ``sys.exit(1)`` (a library must not kill the interpreter).
"""

from __future__ import annotations

import urllib.error
import urllib.request

TIMEOUT_S = 30


class RuleFetchError(RuntimeError):
    pass


def raw_github_url(repository: str, filename: str, branch: str = "main") -> str:
    """``owner/repo`` + path → raw.githubusercontent.com URL (the reference's
    URL shape)."""
    return (
        f"https://raw.githubusercontent.com/{repository}/{branch}/{filename}"
    )


def fetch_ruleset(url: str) -> bytes:
    """GET a rule file (XSL / Schematron).  file:// URLs work too, which is
    how tests and air-gapped runs supply rules."""
    try:
        with urllib.request.urlopen(url, timeout=TIMEOUT_S) as resp:
            return resp.read()
    except (urllib.error.URLError, OSError) as exc:
        raise RuleFetchError(f"cannot fetch ruleset {url}: {exc}") from exc


def fetch_github_content(
    repository: str, filename: str, branch: str = "main"
) -> bytes:
    return fetch_ruleset(raw_github_url(repository, filename, branch))
