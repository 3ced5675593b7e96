"""ARC v1/v2 record model and file API (py3, bytes-based).

Reimplements the semantics of the reference's ``warc/arc.py``:

  * v1 header = 5 positional space-separated fields
    ``url ip_address date content_type length`` (arc.py:16);
    v2 adds ``result_code checksum location offset filename``
    before ``length`` (arc.py:17).  Parsing uses the same
    ``\\S*``-field regexes — including their tolerance of *empty*
    fields (the ``alexa_short_header`` fixture has a missing
    content_type, parsed as ``""``).
  * ``ARCHeader`` validates/normalizes the date (``YYYYmmddHHMMSS``,
    arc.py:47-53) and exposes typed accessors (arc.py:97-135).
  * ``ARCRecord.write_to`` = header + ``\\n`` + payload + ``\\n``
    (arc.py:181-193); ``ARCFile.write`` adds one more ``\\n`` separator
    (arc.py:305).
  * ``ARCFile`` synthesizes a ``filedesc://<name>`` file-header record on
    first write with warned defaults org="Unknown", ip="127.0.0.1"
    (arc.py:264-295) — including the reference's quirk of computing the
    v2 header-record length *before* interpolating ``%(org)s`` into the
    payload (arc.py:288 vs :294, pinned by test_arc.py:181).
  * version autodetection on read from the file header's second line
    (arc.py:307-335); the reference's always-latent int-vs-str version
    comparison bug (arc.py:319) is fixed here (compare as ints).

Determinism: the archival date for the synthesized file header is
injectable; the utcnow fallback (arc.py:270-272) is kept for API parity
but never used by the pipelines.
"""

from __future__ import annotations

import builtins
import datetime
import io
import os
import re
import warnings

from .utils import CaseInsensitiveDict

ARC1_HEADER_RE = re.compile(
    rb"(?P<url>\S*)\s(?P<ip_address>\S*)\s(?P<date>\S*)\s(?P<content_type>\S*)\s(?P<length>\S*)"
)
ARC2_HEADER_RE = re.compile(
    rb"(?P<url>\S*)\s(?P<ip_address>\S*)\s(?P<date>\S*)\s(?P<content_type>\S*)\s"
    rb"(?P<result_code>\S*)\s(?P<checksum>\S*)\s(?P<location>\S*)\s(?P<offset>\S*)\s"
    rb"(?P<filename>\S*)\s(?P<length>\S*)"
)

V1_FIELDS = ("url", "ip_address", "date", "content_type", "length")
V2_FIELDS = (
    "url", "ip_address", "date", "content_type", "result_code",
    "checksum", "location", "offset", "filename", "length",
)


class ARCHeader(CaseInsensitiveDict):
    """Fields of one ARC v1/v2 record header."""

    def __init__(self, url="", ip_address="", date="", content_type="",
                 result_code="", checksum="", location="", offset="",
                 filename="", length="", version=2):
        if isinstance(date, datetime.datetime):
            date = date.strftime("%Y%m%d%H%M%S")
        else:
            try:
                datetime.datetime.strptime(date, "%Y%m%d%H%M%S")
            except ValueError:
                raise ValueError("Couldn't parse the date '%s' in file header" % date)
        self.version = version
        super().__init__(
            url=url, ip_address=ip_address, date=date, content_type=content_type,
            result_code=result_code, checksum=checksum, location=location,
            offset=offset, filename=filename, length=length,
        )

    def header_string(self, version=None) -> str:
        version = version or self.version
        fields = V1_FIELDS if version == 1 else V2_FIELDS
        return " ".join(str(self[f]) for f in fields)

    def write_to(self, f, version=None) -> None:
        f.write(self.header_string(version).encode("latin-1"))

    @property
    def url(self):
        return self["url"]

    @property
    def ip_address(self):
        return self["ip_address"]

    @property
    def date(self):
        return datetime.datetime.strptime(self["date"], "%Y%m%d%H%M%S")

    @property
    def content_type(self):
        return self["content_type"]

    @property
    def result_code(self):
        return self["result_code"]

    @property
    def checksum(self):
        return self["checksum"]

    @property
    def location(self):
        return self["location"]

    @property
    def offset(self):
        return int(self["offset"])

    @property
    def filename(self):
        return self["filename"]

    @property
    def length(self):
        return int(self["length"])

    def __str__(self):
        return self.header_string()

    def __repr__(self):
        return "<ARCHeader(%s)>" % ", ".join(
            '%s = "%s"' % (k, v) for k, v in self.items()
        )


class ARCRecord:
    def __init__(self, header=None, payload=None, headers=None, version=None):
        if not (header or headers):
            raise TypeError("Can't create an ARC record without a header")
        self.header = header or ARCHeader(version=version, **(headers or {}))
        if isinstance(payload, str):
            payload = payload.encode("latin-1")
        self.payload = payload
        self.version = version

    @classmethod
    def from_string(cls, string, version):
        """Build a record from ``header\\npayload`` text (arc.py:160-179)."""
        data = string.encode("latin-1") if isinstance(string, str) else string
        header, payload = data.split(b"\n", 1)
        if payload[:1] == b"\n":  # tolerate an extra separator newline
            payload = payload[1:]
        header_re = ARC1_HEADER_RE if int(version) == 1 else ARC2_HEADER_RE
        matches = header_re.search(header)
        headers = {k: v.decode("latin-1") for k, v in matches.groupdict().items()}
        return cls(header=ARCHeader(**headers), payload=payload, version=version)

    def to_bytes(self, version=None) -> bytes:
        version = version or self.version or 2
        out = [self.header.header_string(version).encode("latin-1"), b"\n"]
        payload = self.payload
        if payload is None:
            payload = b""
        if hasattr(payload, "read"):
            payload = payload.read()
        out.append(payload)
        out.append(b"\n")
        return b"".join(out)

    def write_to(self, f, version=None) -> None:
        f.write(self.to_bytes(version))

    def __getitem__(self, name):
        return self.header[name]

    def __setitem__(self, name, value):
        self.header[name] = value

    def __str__(self):
        return self.to_bytes().decode("latin-1")


V1_FILEHEADER_FIELDNAMES = "URL IP-address Archive-date Content-type Archive-length"
V2_FILEHEADER_FIELDNAMES = (
    "URL IP-address Archive-date Content-type Result-code Checksum "
    "Location Offset Filename Archive-length"
)


class ARCFile:
    """Read/write ARC v1/v2 files with the mandatory filedesc header."""

    def __init__(self, filename=None, mode=None, fileobj=None, version=None,
                 file_headers=None, compress=None):
        if fileobj is None:
            mode = mode or "rb"
            if "b" not in mode:
                mode += "b"
            fileobj = builtins.open(filename, mode)
        # Transparent gzip for ``.arc.gz`` (the reference's ARCFile never
        # wraps — its test wraps manually, test_common.py:33-40 — but
        # warc.open() on a .arc.gz would hand it raw bytes; we extend
        # WARCFile's .gz convention, warc/warc.py:250-254, to ARC).
        if compress is None and filename and filename.endswith(".gz"):
            compress = True
        if compress:
            import gzip as _gzip
            # mode is None when a bare fileobj is passed — fall back to
            # the fileobj's own mode so ARCFile(fileobj=buf, mode="wb",
            # compress=True) (or a file opened for writing) wraps for
            # WRITING, not unconditionally "rb"
            eff_mode = mode or getattr(fileobj, "mode", None) or "rb"
            eff_mode = eff_mode if isinstance(eff_mode, str) else "rb"
            fileobj = _gzip.GzipFile(
                fileobj=fileobj,
                mode="rb" if "r" in eff_mode else "wb")
        self.fileobj = fileobj
        if version is not None and int(version) not in (1, 2):
            raise TypeError("ARC version has to be 1 or 2")
        self.version = version
        self.file_headers = dict(file_headers or {})
        self.header_written = False
        self.header_read = False

    # -- write path -----------------------------------------------------

    def _write_header(self):
        if "org" not in self.file_headers:
            warnings.warn("Using 'unknown' for Archiving organisation name")
            self.file_headers["org"] = "Unknown"
        if "date" not in self.file_headers:
            now = datetime.datetime.utcnow()
            warnings.warn("Using '%s' for Archiving time" % now)
            self.file_headers["date"] = now
        if "ip_address" not in self.file_headers:
            warnings.warn("Using '127.0.0.1' as IP address of machine that's archiving")
            self.file_headers["ip_address"] = "127.0.0.1"
        if self.version == 1:
            # v1 interpolates org immediately (reference arc.py:277)
            payload = "1 0 %(org)s\n%(f)s" % dict(org=self.file_headers["org"],
                                                  f=V1_FILEHEADER_FIELDNAMES)
        elif self.version == 2:
            # v2 leaves %(org)s in place; interpolated below AFTER the
            # length is computed (reference arc.py:279,288,294 quirk)
            payload = "2 0 %%(org)s\n%s" % V2_FILEHEADER_FIELDNAMES
        else:
            raise IOError("Can't write an ARC file with version '\"%s\"'" % self.version)

        fname = os.path.basename(getattr(self.fileobj, "name", "unknown.arc"))
        header = ARCHeader(
            url="filedesc://%s" % fname,
            ip_address=self.file_headers["ip_address"],
            date=self.file_headers["date"],
            content_type="text/plain",
            length=len(payload),
            result_code="200",
            checksum="-",
            location="-",
            offset=str(self.fileobj.tell()),
            filename=fname,
        )
        self.write(ARCRecord(header, payload % self.file_headers))

    def write(self, arc_record: ARCRecord) -> None:
        if not self.version:
            self.version = 2
        if not self.header_written:
            self.header_written = True
            self._write_header()
        arc_record.write_to(self.fileobj, self.version)
        self.fileobj.write(b"\n")  # record separator (arc.py:305)

    # -- read path ------------------------------------------------------

    def _read_file_header(self):
        header = self.fileobj.readline()
        payload1 = self.fileobj.readline()
        self.fileobj.readline()  # field-names line
        version, _reserved, organisation = payload1.split(None, 2)
        self.fileobj.readline()  # separator newline
        self.header_read = True
        version = version.decode("latin-1")
        if self.version and int(self.version) != int(version):
            raise IOError(
                "Version mismatch. Requested version was '%s' but version in file was '%s'"
                % (self.version, version)
            )
        if version == "1":
            _url, ip_address, date, _ct, _length = header.split()
        elif version == "2":
            (_url, ip_address, date, _ct, _rc, _ck, _loc, _off, _fn,
             _length) = header.split()
        else:
            raise IOError("Unknown ARC version '%s'" % version)
        self.file_headers = {
            "ip_address": ip_address.decode("latin-1"),
            "date": datetime.datetime.strptime(date.decode("latin-1"), "%Y%m%d%H%M%S"),
            "org": organisation.decode("latin-1").rstrip("\n"),
        }
        self.version = int(version)

    def _read_arc_record(self):
        # skip blank separator lines, then parse one header line
        header = self.fileobj.readline()
        while header and header.strip() == b"":
            header = self.fileobj.readline()
        if header == b"":
            return None
        header_re = ARC1_HEADER_RE if int(self.version) == 1 else ARC2_HEADER_RE
        matches = header_re.search(header)
        headers = {k: v.decode("latin-1") for k, v in matches.groupdict().items()}
        arc_header = ARCHeader(**headers)
        payload = self.fileobj.read(int(headers["length"]))
        self.fileobj.readline()  # separator newline
        return ARCRecord(header=arc_header, payload=payload)

    def read(self):
        if not self.header_read:
            self._read_file_header()
        return self._read_arc_record()

    # WARCFile-compatible aliases (reference arc.py:375-376)
    read_record = read
    write_record = write

    def __iter__(self):
        record = self.read()
        while record:
            yield record
            record = self.read()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def close(self):
        self.fileobj.close()
