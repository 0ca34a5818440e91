from customer_segmentation_pyspark_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    read_csv_strict,
    spread,
)

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "read_csv_strict", "spread"]
