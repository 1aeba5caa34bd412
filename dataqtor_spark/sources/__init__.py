from dataqtor_spark.sources.synthetic import SyntheticEventsDataSource, register_sources

__all__ = ["SyntheticEventsDataSource", "register_sources"]
