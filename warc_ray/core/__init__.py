"""warc_ray.core — pure-py3 WARC/ARC format layer (no Ray dependency).

Byte-level parity with internetarchive/warc v0.2.0 is asserted by
``tests/test_conformance_*.py`` (the reference's golden test vectors,
ported to py3 bytes).
"""

from .arcrec import ARCFile, ARCHeader, ARCRecord
from .opener import detect_format, open_archive
from .utils import CaseInsensitiveDict, FilePart
from .warcfile import WARCFile
from .warcrec import (
    CONTENT_TYPES,
    KNOWN_HEADERS,
    WARCHeader,
    WARCReader,
    WARCRecord,
    canonical_header_name,
    parse_record_bytes,
    sha1_digest,
)

__all__ = [
    "ARCFile", "ARCHeader", "ARCRecord",
    "WARCFile", "WARCHeader", "WARCReader", "WARCRecord",
    "CaseInsensitiveDict", "FilePart",
    "CONTENT_TYPES", "KNOWN_HEADERS",
    "canonical_header_name", "parse_record_bytes", "sha1_digest",
    "detect_format", "open_archive",
]
