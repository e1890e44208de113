"""connected_data_lake_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing capabilities of
SmartX-Team/connected-data-lake ("CDL", a Rust/DataFusion/Lance engine) on
Apache Spark. The reference's effective query surface is "arbitrary SQL over
a registered columnar table" (reference: crates/cdl-fs/src/lib.rs:78-81);
here that surface is Spark SQL / the DataFrame API, with Catalyst + AQE
providing the optimizer the reference delegates to DataFusion.

Public API parity with the reference's Python bindings (python/cdlake):

    from connected_data_lake_spark import Cdl
    cdl = Cdl()                      # ~ cdlake.Cdl(**catalog)
    fs = cdl.open("local:///data")   # ~ cdl.open(url)
    fs.sql("SELECT ... FROM rootfs") # ~ fs.sql(sql) -> DataFrame
    fs.read_dir("/some/dir")         # listing queries
    fs.read_files("size > 100")      # condition splice
    fs.copy_to("local:///out")       # dataset copy

plus Spark-first extensions (dedup, similarity search, text analysis,
multimodal columns, structured streaming over events).
"""

from connected_data_lake_spark.catalog import DatasetCatalog, GlobalPath
from connected_data_lake_spark.filesystem import Cdl, CdlFS
from connected_data_lake_spark.session import get_spark, prepare_session

__all__ = [
    "Cdl",
    "CdlFS",
    "DatasetCatalog",
    "GlobalPath",
    "get_spark",
    "prepare_session",
]

__version__ = "0.1.0"
