"""MARC-record operators as pure column expressions over the parsed struct
model (model.schemas.MARC_TYPE) — no Python in the hot path.

Reference parity:
- ``record_001``: exactly-one-nonempty 001 controlfield, else NULL
  (reference: process.py:66-80 — missing/empty/duplicated 001 → None).
- ``generate_bw_parent_field``: synthetic ``ADF`` datafield carrying the
  boundwith parent id (reference: process.py:83-92).
- ``boundwith_enrich``: the lookup join — broadcast left join on
  001 == child_id with int coercion, ``||``-split of packed parent XML
  (reference: harvest.py:218-250).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def controlfield_values(marc: Column, tag: str) -> Column:
    """All values of a control field tag (repeated tags preserved)."""
    return F.transform(
        F.filter(marc["controlfields"], lambda cf: cf["tag"] == tag),
        lambda cf: cf["value"],
    )


def record_001(marc: Column) -> Column:
    """The 001 value iff exactly one non-null, non-empty 001 exists; NULL
    otherwise (missing, empty, or duplicated — process.py:70-80)."""
    vals = controlfield_values(marc, "001")
    first = F.get(vals, 0)  # F.get tolerates empty arrays under ANSI mode
    return F.when(
        (F.size(vals) == 1) & first.isNotNull() & (F.trim(first) != ""),
        first,
    )


def subfield_values(marc: Column, tag: str, code: str) -> Column:
    """Flattened subfield values for (datafield tag, subfield code) — e.g.
    the 774-$w boundwith child pointers."""
    dfs = F.filter(marc["datafields"], lambda d: d["tag"] == tag)
    return F.flatten(
        F.transform(
            dfs,
            lambda d: F.transform(
                F.filter(d["subfields"], lambda s: s["code"] == code),
                lambda s: s["value"],
            ),
        )
    )


def generate_bw_parent_field(parent_id: Column) -> Column:
    """Synthetic ``<datafield tag="ADF" ind1=" " ind2=" "><subfield code="a">
    parent_id</subfield></datafield>`` as a MARC datafield struct
    (reference: process.py:83-92)."""
    return F.struct(
        F.lit("ADF").alias("tag"),
        F.lit(" ").alias("ind1"),
        F.lit(" ").alias("ind2"),
        F.array(
            F.struct(
                F.lit("a").alias("code"),
                parent_id.cast("string").alias("value"),
            )
        ).alias("subfields"),
    )


def append_datafield(marc: Column, field: Column) -> Column:
    """New MARC struct with ``field`` appended to datafields."""
    return F.struct(
        marc["leader"].alias("leader"),
        marc["controlfields"].alias("controlfields"),
        F.concat(
            F.coalesce(marc["datafields"], F.array().cast("array<struct<tag:string,ind1:string,ind2:string,subfields:array<struct<code:string,value:string>>>>")),
            F.array(field),
        ).alias("datafields"),
    )


def boundwith_enrich(
    records: DataFrame,
    lookup: DataFrame,
    marc_col: str = "marc",
) -> DataFrame:
    """Boundwith parent enrichment (reference: harvest.py:218-250).

    - join key: int-coerced 001 == lookup.child_id (harvest.py:238) — records
      with a non-numeric or invalid 001 keep NULL and never match;
    - left outer: records without a lookup row pass through unchanged;
    - ``parent_xml`` is ``||``-packed fragments → split to an array
      (harvest.py:241); malformed-fragment handling happens at parse time in
      the XML layer (logged + skipped, harvest.py:243-247);
    - every matched parent also contributes a synthetic ADF datafield.

    The lookup side is a small CSV in the reference (fetched once per
    process, harvest.py:224-231) → ``F.broadcast``: the fact stream is never
    shuffled, which is what makes this viable at 100 TB.
    """
    m = F.col(marc_col)
    # try_cast: non-numeric 001s become NULL keys (never match) instead of
    # failing the job under ANSI mode — int(record_id) ValueError analog.
    keyed = records.withColumn("_rec001", record_001(m)).withColumn(
        "_rec001", F.expr("try_cast(_rec001 AS bigint)")
    )
    # one lookup row per child: the reference probes the pandas frame and uses
    # only the first match (harvest.py:239-241); a duplicated child_id must
    # not multiply record rows.  Deterministic "first" = lowest parent_id.
    lookup = lookup.groupBy("child_id").agg(
        F.min("parent_id").alias("parent_id"),
        F.expr("min_by(parent_xml, parent_id)").alias("parent_xml"),
    )
    joined = keyed.join(
        F.broadcast(lookup),
        keyed["_rec001"] == lookup["child_id"],
        "left",
    )
    enriched = joined.withColumn(
        "parent_fragments",
        F.when(
            F.col("parent_xml").isNotNull(),
            F.split(F.col("parent_xml"), r"\|\|"),
        ),
    ).withColumn(
        marc_col,
        F.when(
            F.col("parent_id").isNotNull(),
            append_datafield(m, generate_bw_parent_field(F.col("parent_id"))),
        ).otherwise(m),
    )
    return enriched.drop("_rec001", "child_id", "parent_xml")
