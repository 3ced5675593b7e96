"""Multimodal columns: opaque binary payloads + typed metadata, with
actor-pool decode / feature-extract / frame-sample stages.

The container has no image/audio codecs (no PIL/ffmpeg), so the codec
call itself is STUBBED (clearly marked): when a real decoder import
succeeds it is used; otherwise a deterministic header-parse fake stands
in.  Everything AROUND the codec — schema, batch sizing, actor-pool
signature (`__init__` loads the "model" once), zero-copy binary
columns, output layout — is real and tested, so swapping in a real
codec is a one-function change.

Media blobs come from the synthetic corpus fetcher
(stages/fetch.py: ``media_body``) whose first 20 bytes act as the
"container header" for the fake decoder.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("url", pa.string()),
    ("media_type", pa.string()),      # image | video | audio
    ("payload", pa.large_binary()),
])

FEATURE_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),
    ("n_bytes", pa.int64()),
    ("header_sha1", pa.string()),
    ("width", pa.int32()),            # fake-decoded dimensions
    ("height", pa.int32()),
    ("n_frames", pa.int32()),         # 1 for images
    ("feature", pa.list_(pa.float32(), 16)),  # fixed-size feature vector
])

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB decoder: derives deterministic (width, height) from the
    payload header.  Replace with a real codec when available —
    raise NotImplementedError semantics are documented here, but the
    deterministic fake keeps the pipeline testable end-to-end."""
    h = hashlib.sha1(payload[:20]).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


class DecodeMediaFeatures:
    """Actor-pool map_batches stage: binary payload → features.

    __init__ is the once-per-actor setup point (real decoders/models
    load here); __call__ is vectorized over the batch.
    """

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim
        self.use_real_codec = HAVE_PIL  # False in this container

    def _feature(self, payload: bytes) -> np.ndarray:
        # histogram of byte values folded to feature_dim buckets, L2-normed
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr % self.feature_dim, minlength=self.feature_dim)
        v = hist.astype(np.float32)
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        n_bytes = np.empty(n, dtype=np.int64)
        widths = np.empty(n, dtype=np.int32)
        heights = np.empty(n, dtype=np.int32)
        n_frames = np.empty(n, dtype=np.int32)
        shas = []
        feats = np.empty((n, self.feature_dim), dtype=np.float32)
        for i, (mtype, payload) in enumerate(zip(types, payloads)):
            payload = payload or b""
            d = hashlib.sha1(payload[:20])
            h = d.digest()
            shas.append(d.hexdigest())
            n_bytes[i] = len(payload)
            widths[i] = 64 + h[0] % 192     # _fake_decode, digest reused
            heights[i] = 64 + h[1] % 192
            n_frames[i] = 1 if mtype == "image" else 1 + len(payload) // 1024
            feats[i] = self._feature(payload)
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "n_bytes": pa.array(n_bytes),
            "header_sha1": pa.array(shas, type=pa.string()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "n_frames": pa.array(n_frames),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), self.feature_dim),
        }, schema=FEATURE_SCHEMA)


class FrameSampler:
    """Actor-pool stage: sample ≤ max_frames deterministic "frames" per
    video payload (byte-slices standing in for decoded frames)."""

    def __init__(self, max_frames: int = 4, frame_bytes: int = 64):
        self.max_frames = max_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_frame = [], [], []
        for mid, mtype, payload in zip(batch["media_id"].to_pylist(),
                                       batch["media_type"].to_pylist(),
                                       batch["payload"].to_pylist()):
            if mtype != "video" or not payload:
                continue
            n = min(self.max_frames, max(1, len(payload) // self.frame_bytes))
            step = max(1, len(payload) // n)
            for i in range(n):
                off = i * step
                out_id.append(mid)
                out_idx.append(i)
                out_frame.append(bytes(payload[off:off + self.frame_bytes]))
        return pa.table({
            "media_id": pa.array(out_id, type=pa.string()),
            "frame_idx": pa.array(out_idx, type=pa.int32()),
            "frame": pa.array(out_frame, type=pa.large_binary()),
        })


def media_table_from_corpus(corpus_dir: str, n_buckets: int, limit_docs: int | None = None):
    """Build a media Dataset from the corpus' media URLs (fetch stage
    synthesizes the payloads) — the input for the decode pipeline."""
    import ray.data as rd

    from .. import corpus as corpus_mod
    from ..stages.fetch import media_bodies
    from ..stages.urls import extract_links

    import pyarrow.compute as pc

    def to_media_urls(batch: pa.Table) -> pa.Table:
        # distinct-per-batch URL rows only — payload synthesis happens
        # AFTER the global dedup so blobs never enter the shuffle
        links = extract_links(batch, doc_col="doc_id")
        media = links.filter(pc.match_substring(links["url"], "/media/"))
        return pa.table({"url": pc.unique(media["url"].combine_chunks())})

    def synthesize(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        ids, types = [], []
        for u in urls:
            _kind, idx = corpus_mod.parse_synthetic_url(u)
            ids.append(f"media-{idx}")
            types.append("video" if idx % 3 == 0 else "image")
        payloads = media_bodies(urls)
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "url": batch["url"],
            "media_type": pa.array(types, type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
        }, schema=MEDIA_SCHEMA)

    ds = rd.read_parquet(corpus_mod.docs_path(corpus_dir))
    if limit_docs:
        ds = ds.limit(limit_docs)
    urls = ds.map_batches(to_media_urls, batch_format="pyarrow")
    # global distinct on the (small) URL rows via a vectorized Count
    # aggregate (NOT map_groups — one Python call per URL), then
    # synthesize payloads; synthesize rebuilds the table so the count
    # column never leaves this stage.
    from ray.data.aggregate import Count

    distinct = urls.groupby("url").aggregate(Count(alias_name="_c"))
    return distinct.map_batches(synthesize, batch_format="pyarrow")
