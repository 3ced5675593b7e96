"""Ray Data datasources: WARC/ARC archives → Dataset of record rows."""

from .arc_source import read_arc
from .warc_source import read_warc

__all__ = ["read_warc", "read_arc"]
