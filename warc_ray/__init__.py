"""warc_ray — a Ray-Data-native crawl substrate with the record-format
capabilities of internetarchive/warc (WARC 1.0 + ARC v1/v2), plus a
from-scratch URL-frontier + fetch scheduler and large-scale
training-data operators.

Layout:
  core/       pure-py3 WARC/ARC parse/serialize (byte-parity layer)
  sources/    Ray Data datasources (read .warc[.gz] / .arc[.gz] → Dataset)
  sinks/      Ray Data sinks (Dataset → record-per-gzip-member shards + CDX index)
  stages/     stateless map_batches transforms (URLs, assembly, text, dedup, ANN)
  state/      stateful components (cuckoo filter, frontier shard actors, checkpoints)
  pipelines/  end-to-end drivers (archive slice, crawl loop, oracle simulator,
              relational/reporting queries)

Nothing in this package calls ``ray.init``; sessions are owned by the
caller (driver, tests, bench.py).
"""

__version__ = "0.1.0"
