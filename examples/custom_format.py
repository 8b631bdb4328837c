#!/usr/bin/env python
"""Custom user format — the analogue of the reference's
``examples/custom-format`` app: a CSV-line codec implemented inline
(no format module, no schema registry), showing what a format owes the
pipeline and what it doesn't.

The reference contract is two functions (serialize/deserialize on
``byte[]``); the columnar translation is a decode EXPRESSION from the
``value`` bytes column to typed fields — wire-format details stay in
the format, the pipeline operates on the decoded columns. Malformed
lines route through the standard error path (Failed + DLQ), not
swallowed — same contract as the reference's throwing deserializer.

Wire shape (one record per message): ``id,sku,quantity``; whitespace
around fields is trimmed.

Run: python examples/custom_format.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.pipeline import Pipeline  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402


def decode_csv_order(df):
    """The custom format: value bytes -> (id, sku, quantity) columns.

    ANSI-safe: try_element_at/try_cast turn short lines and malformed
    numerics into nulls, which the pipeline's field-count guard and
    require_field elevate to the Failed terminal — the
    throwing-deserializer contract without a Python UDF (plain
    element_at/cast would kill the whole task under ANSI mode).
    """
    parts = F.split(F.col("value").cast("string"), ",")
    return df.select(
        "value",
        F.trim(F.try_element_at(parts, F.lit(1))).try_cast("bigint").alias("id"),
        F.trim(F.try_element_at(parts, F.lit(2))).alias("sku"),
        F.trim(F.try_element_at(parts, F.lit(3))).try_cast("int").alias("quantity"),
        F.size(parts).alias("_n_fields"),
    )


def main() -> None:
    spark = get_spark(app_name="example-custom-format")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        b"1, widget-a, 3",
        b"2, gadget-b, 0",      # filtered (quantity must be > 0)
        b"3, doohickey-c, 7",
        b"not,a,number",        # malformed id -> Failed
        b"5, trinket-e",        # missing field -> Failed
    ]
    df = decode_csv_order(
        spark.createDataFrame([(ln,) for ln in lines], "value binary")
    )

    # a throwing deserializer maps to fail_when: malformed wire data is
    # an ERROR (DLQ-bound), not a business-rule filter
    pipeline = (
        Pipeline()
        .fail_when(F.col("_n_fields") != 3, "malformed CSV: wrong field count")
        .fail_when(
            F.col("id").isNull() | F.col("quantity").isNull(),
            "malformed CSV: non-numeric field",
        )
        .filter(F.col("quantity") > 0)
        .pipe("sku", F.upper("sku"))
    )
    passed, filtered, failed = pipeline.split(df)

    orders = [(r["id"], r["sku"], r["quantity"]) for r in passed.collect()]
    print("delivered orders:", sorted(orders))
    print("filtered:", filtered.count(), "failed:", failed.count())
    assert sorted(orders) == [(1, "WIDGET-A", 3), (3, "DOOHICKEY-C", 7)]
    assert filtered.count() == 1 and failed.count() == 2
    print("custom CSV format: decode + error-path contract = True")


if __name__ == "__main__":
    main()
