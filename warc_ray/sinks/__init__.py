"""Ray Data sinks: Dataset → WARC/ARC shard files + CDX index."""

from .arc_sink import WriteArcShard, write_arc_shards
from .warc_sink import WriteWarcShard, write_warc_shards

__all__ = ["WriteWarcShard", "write_warc_shards",
           "WriteArcShard", "write_arc_shards"]
