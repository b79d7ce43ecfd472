"""Record transformation: XSLT-subset stylesheets compiled to Spark column
expressions over the DC field map (reference: transform.py — SURVEY.md §2.3
P6/P7).  The reference forks one Saxon JVM per record; here the stylesheet
becomes JVM column algebra (or, for stylesheets outside the subset, a
per-partition compiled engine — never a subprocess)."""

from tulflow_spark.transform.rules import (  # noqa: F401
    FieldTemplate,
    RecordFilter,
    ValueCase,
    apply_templates,
)
from tulflow_spark.transform.xslt import (  # noqa: F401
    UnsupportedXslt,
    compile_xslt,
    transform_records,
)
