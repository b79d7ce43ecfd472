"""SolrCloud Collections-API client.

Same control-plane semantics as the reference's ``SolrApiUtils``
(solr_api_utils.py:12-245), written fresh for this engine:

- collection lifecycle: list / exists / create / idempotent delete
  (solr_api_utils.py:94-157; CREATE defaults numShards=1 like tasks.py:20-23)
- alias introspection & membership edits, comma-joined membership strings,
  refusal to empty an alias (solr_api_utils.py:159-235, guard at :219)
- configset listing + latest-version-per-name (``name-N`` suffix parse,
  solr_api_utils.py:65-92)
- blue/green reindex cycle ``remove_and_recreate_collection_from_alias``
  (solr_api_utils.py:12-43)
- ``-init`` bootstrap-collection filtering (solr_api_utils.py:237-245)

Errors reported by Solr inside a 200 JSON body are unwrapped and raised.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import requests

TIMEOUT_S = 30


class SolrApiError(RuntimeError):
    pass


def parse_configset_version(name: str) -> tuple[str, int]:
    """``tul_cob-catalog-10`` → (``tul_cob-catalog``, 10); no numeric suffix
    → version -1 (sorts before any real version)."""
    m = re.match(r"^(.*)-(\d+)$", name)
    if m:
        return m.group(1), int(m.group(2))
    return name, -1


def most_recent_configsets(configsets: list[str]) -> list[str]:
    """Latest version per base name — the reference's one real
    group-by+max (solr_api_utils.py:81-92)."""
    best: dict[str, tuple[int, str]] = {}
    for cs in configsets:
        base, version = parse_configset_version(cs)
        if base not in best or version > best[base][0]:
            best[base] = (version, cs)
    return [best[b][1] for b in sorted(best)]


def filter_init_collection(collections: list[str]) -> list[str]:
    """Drop the ``-init`` bootstrap collection (solr_api_utils.py:237-245)."""
    return [c for c in collections if not c.endswith("-init")]


@dataclass
class SolrCloudClient:
    solr_url: str  # e.g. http://host:8983/solr
    auth_user: str | None = None
    auth_pass: str | None = None
    session: requests.Session = field(default_factory=requests.Session)

    # -- transport ----------------------------------------------------------

    def _get(self, path: str, **params) -> dict:
        auth = (
            (self.auth_user, self.auth_pass)
            if self.auth_user is not None
            else None
        )
        resp = self.session.get(
            f"{self.solr_url.rstrip('/')}{path}",
            params={**params, "wt": "json"},
            auth=auth,
            timeout=TIMEOUT_S,
        )
        resp.raise_for_status()
        body = resp.json()
        # Solr loves HTTP 200 + an error payload; unwrap it
        if isinstance(body, dict) and body.get("error"):
            raise SolrApiError(str(body["error"].get("msg", body["error"])))
        return body

    def _collections_api(self, action: str, **params) -> dict:
        return self._get("/admin/collections", action=action, **params)

    # -- collections --------------------------------------------------------

    def get_collections(self) -> list[str]:
        return self._collections_api("LIST").get("collections", [])

    def collection_exists(self, name: str) -> bool:
        return name in self.get_collections()

    def create_collection(
        self,
        name: str,
        configset: str,
        num_shards: int = 1,
        replication_factor: int = 1,
    ) -> None:
        self._collections_api(
            "CREATE",
            name=name,
            **{
                "collection.configName": configset,
                "numShards": num_shards,
                "replicationFactor": replication_factor,
                "maxShardsPerNode": 1,
            },
        )

    def delete_collection(self, name: str) -> None:
        """Idempotent: deleting a missing collection is a no-op."""
        if self.collection_exists(name):
            self._collections_api("DELETE", name=name)

    # -- aliases -------------------------------------------------------------

    def get_aliases(self) -> dict[str, str]:
        return self._collections_api("LISTALIASES").get("aliases", {})

    def alias_exists(self, alias: str) -> bool:
        return alias in self.get_aliases()

    def get_alias_collections(self, alias: str) -> list[str]:
        joined = self.get_aliases().get(alias, "")
        return [c for c in joined.split(",") if c]

    def get_alias_collections_without_init(self, alias: str) -> list[str]:
        return filter_init_collection(self.get_alias_collections(alias))

    def is_collection_in_alias(self, collection: str, alias: str) -> bool:
        return collection in self.get_alias_collections(alias)

    def set_alias_collections(self, alias: str, collections: list[str]) -> None:
        if not collections:
            raise ValueError(
                f"refusing to point alias {alias!r} at zero collections"
            )
        self._collections_api(
            "CREATEALIAS", name=alias, collections=",".join(collections)
        )

    def swap_alias(self, alias: str, collection: str) -> None:
        """Point an alias at exactly one collection (tasks.py:33-50)."""
        self.set_alias_collections(alias, [collection])

    def add_collection_to_alias(self, collection: str, alias: str) -> None:
        # base membership on the init-filtered list so the '-init' bootstrap
        # collection is dropped when the alias is (re)written — the reference's
        # deliberate blue/green semantics (solr_api_utils.py:227-235)
        current = self.get_alias_collections_without_init(alias)
        if collection not in current:
            current = current + [collection]
        self.set_alias_collections(alias, current)

    def remove_collection_from_alias(self, collection: str, alias: str) -> None:
        remaining = [c for c in self.get_alias_collections(alias) if c != collection]
        # the empty-alias guard lives in set_alias_collections
        self.set_alias_collections(alias, remaining)

    # -- configsets ----------------------------------------------------------

    def get_configsets(self) -> list[str]:
        return self._get("/admin/configs", action="LIST").get("configSets", [])

    def most_recent_configsets(self) -> list[str]:
        return most_recent_configsets(self.get_configsets())

    # -- blue/green reindex cycle ---------------------------------------------

    def remove_and_recreate_collection_from_alias(
        self,
        collection: str,
        alias: str,
        configset: str,
        num_shards: int = 1,
        replication_factor: int = 1,
    ) -> None:
        """Take a collection out of its serving alias, rebuild it empty, and
        put it back (solr_api_utils.py:12-43)."""
        if self.is_collection_in_alias(collection, alias):
            self.remove_collection_from_alias(collection, alias)
        self.delete_collection(collection)
        self.create_collection(
            collection,
            configset,
            num_shards=num_shards,
            replication_factor=replication_factor,
        )
        self.add_collection_to_alias(collection, alias)
