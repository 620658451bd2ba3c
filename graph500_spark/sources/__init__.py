from graph500_spark.sources.testdata import EDGE_VIEWS, load_table, load_tables

__all__ = ["EDGE_VIEWS", "load_table", "load_tables"]
