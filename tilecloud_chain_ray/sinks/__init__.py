"""Sinks: WMTS-layout filesystem writer, tiles Parquet table, lineage."""
