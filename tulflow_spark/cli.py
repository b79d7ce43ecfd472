"""Command-line entry points — the engine's analog of the reference's
Airflow task surface: each subcommand is one pipeline stage, runnable
standalone or from any orchestrator.

    python -m tulflow_spark harvest   --endpoint URL --out DIR --dag-id D --timestamp T
    python -m tulflow_spark transform --src DIR --dest DIR --stylesheet FILE_OR_URL
    python -m tulflow_spark validate  --src DIR --dest DIR --report DIR --schematron FILE_OR_URL
    python -m tulflow_spark index     --src DIR --solr-url URL --collection NAME

Rule files accept local paths or URLs (fetched via sources.rules).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_rules(ref: str) -> bytes:
    if "://" in ref:
        from tulflow_spark.sources.rules import fetch_ruleset

        return fetch_ruleset(ref)
    with open(ref, "rb") as fh:
        return fh.read()


def _spark(app: str):
    from tulflow_spark.session import get_spark

    return get_spark(app_name=app)


def cmd_harvest(args) -> dict:
    from tulflow_spark import pipelines as P
    from tulflow_spark.sources.oai import harvest_oai

    spark = _spark("tulflow-harvest")
    opts = {}
    if args.sets:
        opts["includedSets"] = args.sets
    if args.from_date:
        opts["from"] = args.from_date
    if args.until_date:
        opts["until"] = args.until_date
    records = harvest_oai(spark, args.endpoint, **opts)
    res = P.harvest_to_staging(
        records, args.out, args.dag_id, args.timestamp,
        records_per_file=args.records_per_file, stage_format=args.stage_format,
    )
    return {"updated": res.updated, "deleted": res.deleted}


def cmd_transform(args) -> dict:
    from tulflow_spark import pipelines as P

    spark = _spark("tulflow-transform")
    n = P.transform_staging(
        spark, args.src, args.dest, _load_rules(args.stylesheet),
        stage_format=args.stage_format,
    )
    return {"transformed": n}


def cmd_validate(args) -> dict:
    from tulflow_spark import pipelines as P

    spark = _spark("tulflow-validate")
    res = P.validate_staging(
        spark, args.src, args.dest, args.report, _load_rules(args.schematron),
        stage_format=args.stage_format,
    )
    return {"total": res.total, "valid": res.valid, "filtered": res.filtered}


def cmd_index(args) -> dict:
    from tulflow_spark.pipelines import _read_stage
    from tulflow_spark.sinks.solr import index_to_solr

    spark = _spark("tulflow-index")
    df = _read_stage(spark, args.src)
    index_to_solr(
        df.select("identifier", "metadata_xml"),
        args.solr_url, args.collection, batch_size=args.batch_size,
    )
    return {"indexed": df.count()}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tulflow_spark")
    sub = p.add_subparsers(dest="command", required=True)

    h = sub.add_parser("harvest", help="OAI-PMH harvest → routed staging")
    h.add_argument("--endpoint", required=True)
    h.add_argument("--out", required=True)
    h.add_argument("--dag-id", required=True)
    h.add_argument("--timestamp", required=True)
    h.add_argument("--sets", help="comma-separated setSpecs")
    h.add_argument("--from-date")
    h.add_argument("--until-date")
    h.add_argument("--records-per-file", type=int, default=1000)
    h.add_argument("--stage-format", choices=["xml", "parquet"], default="xml")
    h.set_defaults(fn=cmd_harvest)

    t = sub.add_parser("transform", help="XSLT-subset transform of a stage")
    t.add_argument("--src", required=True)
    t.add_argument("--dest", required=True)
    t.add_argument("--stylesheet", required=True, help="path or URL")
    t.add_argument("--stage-format", choices=["xml", "parquet"], default="xml")
    t.set_defaults(fn=cmd_transform)

    v = sub.add_parser("validate", help="Schematron-subset filter of a stage")
    v.add_argument("--src", required=True)
    v.add_argument("--dest", required=True)
    v.add_argument("--report", required=True)
    v.add_argument("--schematron", required=True, help="path or URL")
    v.add_argument("--stage-format", choices=["xml", "parquet"], default="xml")
    v.set_defaults(fn=cmd_validate)

    i = sub.add_parser("index", help="index a stage into SolrCloud")
    i.add_argument("--src", required=True)
    i.add_argument("--solr-url", required=True)
    i.add_argument("--collection", required=True)
    i.add_argument("--batch-size", type=int, default=500)
    i.set_defaults(fn=cmd_index)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    result = args.fn(args)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
