from inde1_spark.sources.readers import load_table, load_tables, read_parking_events_json

__all__ = ["load_table", "load_tables", "read_parking_events_json"]
