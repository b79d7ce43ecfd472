"""Token-level sequence packing (GPT-style "concat and chunk"): lay every
document's token ids end-to-end in a deterministic global order and cut
the stream into fixed-length training sequences, SPLITTING documents
across sequence boundaries.  Distinct from ext.mixing.pack_sequences,
which assigns each whole document to the sequence its first token lands
in — this operator materializes the actual id sequences a trainer reads.

Scale shape:

- The global offset of every document comes from
  ext.mixing.grouped_prefix_sum (256-way range-bucketed running total —
  no single-partition ROW_NUMBER/ORDER BY window), with the md5 order key
  so any engine reproduces the same layout byte for byte.
- Each document then emits one SLICE per sequence it overlaps — pure
  map-side array algebra (sequence/explode/slice) after the offset join;
  a document touching s sequences emits s rows.
- Sequence assembly is one groupBy(seq_id) whose shuffle volume is the
  output token volume itself (irreducible: the result IS those tokens),
  with in-row ordering via array_sort on (start, piece) structs.
- Offsets and sequence ids stay in LONG arithmetic (`div`, not floating
  floor) — token offsets at 100 TB exceed the 2^53 double mantissa.

The ids are opaque longs; pair with ext.bpe's encoder (or any tokenizer)
upstream.  No reference-repo analogue; LLM-pipeline extension surface
beside ext.mixing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tulflow_spark.ext.mixing import grouped_prefix_sum, order_key


def pack_token_ids(
    df: DataFrame, id_col: str, ids_col: str, seq_len: int = 2048
) -> DataFrame:
    """Pack (id, ids array<long>) into fixed-length sequences.

    Output: (seq_id, ids array<long>, n_tokens, n_docs) — every sequence
    holds exactly ``seq_len`` tokens except the last (the stream tail).
    Documents with empty id arrays contribute nothing."""
    L = int(seq_len)
    d = df.select(
        F.col(id_col).alias("_id"), F.col(ids_col).alias("_ids")
    ).filter(F.size("_ids") > 0)
    pre = grouped_prefix_sum(
        d, [], order_key("_id"), "_id", F.size("_ids"), out_col="_cum"
    )
    pre = pre.withColumn("_n", F.size("_ids").cast("long")).withColumn(
        "_start", F.col("_cum") - F.col("_n")
    )
    pieces = pre.select(
        "_ids",
        "_start",
        "_n",
        F.explode(
            F.sequence(
                F.expr(f"_start DIV {L}"),
                F.expr(f"(_start + _n - 1) DIV {L}"),
            )
        ).alias("seq_id"),
    )
    lo = F.greatest(F.col("seq_id") * L, F.col("_start"))
    hi = F.least((F.col("seq_id") + 1) * L, F.col("_start") + F.col("_n"))
    pieces = pieces.select(
        "seq_id",
        "_start",
        F.slice(
            F.col("_ids"),
            (lo - F.col("_start") + 1).cast("int"),
            (hi - lo).cast("int"),
        ).alias("_piece"),
    )
    return (
        pieces.groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_start").alias("s"),
                                F.col("_piece").alias("p"),
                            )
                        )
                    ),
                    lambda x: x["p"],
                )
            ).alias("ids"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .withColumn("n_tokens", F.size("ids").cast("long"))
        .select("seq_id", "ids", "n_tokens", "n_docs")
    )


__all__ = ["pack_token_ids"]
