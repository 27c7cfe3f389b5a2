from hbacker_spark.catalog.catalog import Catalog

__all__ = ["Catalog"]
