"""Control-plane: SolrCloud Collections-API client and URL helpers
(reference: solr_api_utils.py, tasks.py — SURVEY §2.10).  Driver-side HTTP,
no Spark mapping needed; the data-plane indexing sink lives in
tulflow_spark.sinks.solr."""

from tulflow_spark.admin.solr_api import SolrCloudClient, most_recent_configsets  # noqa: F401
from tulflow_spark.admin.urls import get_solr_url  # noqa: F401
