"""JVM-native XML parsing via Spark 4's built-in ``from_xml`` — the fast
path for MARC ingest (no Python in the loop; whole plan stays in Tungsten).

``parse_marc_native`` produces the SAME struct shape as the Python
``model.xml_parse.parse_marc`` UDF (equivalence-tested), so downstream
operators (record_001, subfield_values, boundwith_enrich) work with either.
One representational difference: whitespace-only element text parses as NULL
here vs the literal whitespace string in the Python parser — equivalent for
every operator (record_001 rejects both).
Use the native path for the bulk ingest hot loop; the Python UDF remains the
fallback for payloads that need custom per-record hooks (the reference's
``parser`` kwarg surface, harvest.py:172).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# from_xml representation: attributes prefixed with '_', text as _VALUE.
_RAW_MARC_DDL = (
    "struct<"
    "leader:string,"
    "controlfield:array<struct<_tag:string,_VALUE:string>>,"
    "datafield:array<struct<_tag:string,_ind1:string,_ind2:string,"
    "subfield:array<struct<_code:string,_VALUE:string>>>>"
    ">"
)

_FROM_XML_OPTIONS = {
    # keep text exactly as written — the Python parser does not trim either
    "ignoreSurroundingSpaces": "false",
}


def parse_marc_native(xml: Column | str) -> Column:
    """MARC21/slim XML string → model.schemas.MARC_TYPE struct, JVM-side."""
    c = F.col(xml) if isinstance(xml, str) else xml
    raw = F.from_xml(c, _RAW_MARC_DDL, _FROM_XML_OPTIONS)
    empty_cf = F.array().cast("array<struct<_tag:string,_VALUE:string>>")
    empty_df = F.array().cast(
        "array<struct<_tag:string,_ind1:string,_ind2:string,"
        "subfield:array<struct<_code:string,_VALUE:string>>>>"
    )
    controlfields = F.transform(
        F.coalesce(raw["controlfield"], empty_cf),
        lambda cf: F.struct(
            cf["_tag"].alias("tag"), cf["_VALUE"].alias("value")
        ),
    )
    datafields = F.transform(
        F.coalesce(raw["datafield"], empty_df),
        lambda df_: F.struct(
            df_["_tag"].alias("tag"),
            df_["_ind1"].alias("ind1"),
            df_["_ind2"].alias("ind2"),
            F.transform(
                F.coalesce(
                    df_["subfield"],
                    F.array().cast("array<struct<_code:string,_VALUE:string>>"),
                ),
                lambda sf: F.struct(
                    sf["_code"].alias("code"), sf["_VALUE"].alias("value")
                ),
            ).alias("subfields"),
        ),
    )
    return F.when(
        c.isNotNull(),
        F.struct(
            raw["leader"].alias("leader"),
            controlfields.alias("controlfields"),
            datafields.alias("datafields"),
        ),
    )
