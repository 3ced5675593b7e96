"""Ray Data sinks: Dataset → WARC/ARC shard files + CDX index."""
