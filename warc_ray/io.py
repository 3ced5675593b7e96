"""Table I/O with a Lance-first, Parquet-fallback abstraction.

BASELINE.json mandates Lance tables of interleaved docs; this sandbox
has no ``pylance`` (pip is sealed), so the layer selects at import time:

  * pylance importable → ``ray.data.read_lance`` / ``Dataset.write_lance``
  * otherwise          → ``ray.data.read_parquet`` / ``write_parquet``

Both paths carry the identical Arrow schema (schema.DOC_SCHEMA et al.),
so pipelines are format-agnostic.  Never calls ``ray.init``.
"""

from __future__ import annotations

import ray.data as rd

try:  # pragma: no cover - environment-dependent
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def table_format() -> str:
    return "lance" if HAVE_LANCE else "parquet"


def read_docs(path: str, **kwargs) -> "rd.Dataset":
    """Read a docs table (directory of bucket files or single file)."""
    if HAVE_LANCE and path.endswith(".lance"):
        return rd.read_lance(path, **kwargs)
    return rd.read_parquet(path, **kwargs)


def read_table(path: str, **kwargs) -> "rd.Dataset":
    return read_docs(path, **kwargs)


def write_table(ds: "rd.Dataset", path: str, **kwargs) -> None:
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)
