"""Warehouse lifecycle: the snapshot table's full verb set in one run.

    python examples/warehouse_lifecycle.py [testdata_dir]

Walks the round-2 warehouse surface end-to-end on a temp warehouse:
ingest → DML (DELETE / UPDATE / MERGE) → incremental materialized view
→ data-skipping reads → sorted compaction → change feed → time travel.
Every step prints what a table operator would check after running it.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.session import get_spark
from covid_data_pipeline_spark.sources.matview import MaterializedAggregate
from covid_data_pipeline_spark.sources.snapshots import SnapshotWarehouse


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="warehouse-lifecycle")
    with tempfile.TemporaryDirectory() as root:
        wh = SnapshotWarehouse(spark, root)

        # 1. ingest two daily batches of orders
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        wh.append(orders.filter(F.col("o_orderkey") % 2 == 0), "orders")
        wh.append(orders.filter(F.col("o_orderkey") % 2 == 1), "orders")
        print("ingested:", wh.read("orders").count(), "rows,",
              "version", wh.current_version("orders"))

        # 2. incremental materialized view over the change feed
        mv = MaterializedAggregate(
            wh, "orders", keys=["o_orderkey"],
            group_cols=["o_orderstatus"], sum_cols=["o_totalprice"],
        )
        print("mv refresh:", mv.refresh())

        # 3. row-level DML — copy-on-write, only hit files rewritten
        deleted = wh.delete_where("orders", F.col("o_totalprice") < 30000)
        updated = wh.update_where(
            "orders", F.col("o_orderstatus") == "F",
            {"o_totalprice": F.col("o_totalprice") * 1.1},
        )
        print(f"dml: deleted={deleted} updated={updated}")
        src = wh.read("orders").limit(3).withColumn(
            "o_totalprice", F.lit(0.0)
        )
        print("merge:", wh.merge_into("orders", src, on=["o_orderkey"]))

        # 4. the view catches up incrementally — only changed files read
        print("mv refresh after DML:", mv.refresh())
        mv.read().orderBy("o_orderstatus").show()

        # 5. sorted compaction restores clustering, then skipping works
        wh.compact("orders", sort_by=["o_orderkey"], target_file_rows=300)
        kept, total = wh.prune_files("orders", "o_orderkey", lo=100, hi=200)
        print(f"data skipping after sorted compact: {len(kept)}/{total} files")

        # 6. row-level change feed between any two versions
        v = wh.current_version("orders")
        feed = wh.changes("orders", 1, v, keys=["o_orderkey"])
        feed.groupBy("_change_type").count().show()

        # 7. time travel: version 1 still reads its original files
        print("v1 rows (time travel):", wh.read("orders", version=1).count())
    spark.stop()


if __name__ == "__main__":
    main()
