"""Sources: OAI-PMH harvest, XML collection files, Alma SFTP tarballs,
boundwith lookup CSV (SURVEY.md §2.1)."""

from tulflow_spark.sources.lookup import read_boundwith_lookup  # noqa: F401
from tulflow_spark.sources.tarball import read_alma_tarballs  # noqa: F401
