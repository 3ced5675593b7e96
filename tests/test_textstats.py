"""Linear quality-classifier stage (q62): per-row pure-Python parity,
weight injection, and the integer-exactness contract."""

import re

import numpy as np
import pyarrow as pa

from warc_ray.stages.textstats import QUALITY_MODEL, QualityModel

TEXTS = [
    "",
    "the quick brown fox jumps over the lazy dog " * 4,
    "a of and in the " * 30,
    "xxxxxxxx 12345 999 000 111",
    "!!! ??? ...",
    "word " * 2000,          # over the token cap
    "päyload é ünicode the of",
]


def _ref_logit(text: str) -> int:
    n_tok = len(re.findall(r"[A-Za-z0-9]+", text))
    n_chars = len(text)
    alpha = len(re.findall(r"[A-Za-z]", text))
    digit = len(re.findall(r"[0-9]", text))
    alnum = len(re.findall(r"[A-Za-z0-9]", text))
    stop = len(re.findall(r"\b(the|a|of|and|in)\b", text))
    sc, st = max(n_chars, 1), max(n_tok, 1)
    w = QUALITY_MODEL
    return (w["bias"]
            + w["cap_tokens"] * min(n_tok, 1000)
            + w["alpha_ppm"] * (alpha * 1_000_000 // sc)
            + w["stop_ppm"] * (stop * 1_000_000 // st)
            + w["digit_ppm"] * (digit * 1_000_000 // sc)
            + w["tok_len_milli"] * (alnum * 1000 // st))


def test_quality_model_matches_reference():
    batch = pa.table({"doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
                      "text": TEXTS})
    out = QualityModel()(batch)
    got = out["logit_micro"].to_pylist()
    want = [_ref_logit(t) for t in TEXTS]
    assert got == want
    assert out["is_keep"].to_pylist() == [v > 0 for v in want]


def test_quality_model_weight_injection():
    """The 'model' is constructor state (the load-once actor-pool
    contract): different weights → different decisions, same batch."""
    batch = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                      "text": ["the quick brown fox the of and"]})
    base = QualityModel()(batch)["logit_micro"][0].as_py()
    bumped = dict(QUALITY_MODEL, bias=QUALITY_MODEL["bias"] + 123)
    got = QualityModel(bumped)(batch)["logit_micro"][0].as_py()
    assert got == base + 123


def test_quality_model_discriminative_on_corpus():
    """The fixed weights must split the testdata corpus non-trivially
    (a degenerate all-keep/all-drop boundary would make q62 vacuous)."""
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    keep = QualityModel()(t)["is_keep"].to_numpy(zero_copy_only=False)
    rate = keep.mean()
    assert 0.2 < rate < 0.8, rate


def test_weighted_sample_laws(ray_session, tmp_path):
    """q63 Efraimidis–Spirakis sample: matches a pure-python reference,
    is invariant to block partitioning, and a dominant weight wins."""
    import os

    import pyarrow.parquet as pq

    from warc_ray.pipelines.training import _splitmix64, weighted_sample

    ids = np.arange(1, 401, dtype=np.int64)
    w = np.ones(len(ids), dtype=np.int64) * 10
    w[ids == 77] = 10_000_000          # dominant weight
    tab = pa.table({"doc_id": pa.array(ids),
                    "text": ["x"] * len(ids),
                    "lang": ["en"] * len(ids),
                    "source": ["s"] * len(ids),
                    "n_chars": pa.array(w)})
    pq.write_table(tab, os.path.join(tmp_path, "documents.parquet"))

    got = weighted_sample(str(tmp_path)).to_pandas()

    h = _splitmix64(ids)
    u = (h.astype(np.float64) + 0.5) / 2.0**64
    ky = -np.log(u) / np.maximum(w, 1)
    order = np.lexsort((ids, ky))[:20]
    assert got.doc_id.tolist() == ids[order].tolist()
    assert got["rank"].tolist() == list(range(1, 21))
    # dominance: the 10^6x weight makes this key ~10^6x smaller
    assert got.doc_id.iloc[0] == 77

    got2 = weighted_sample(str(tmp_path)).to_pandas()
    assert got.values.tolist() == got2.values.tolist()


def test_compression_signal_per_row_reference():
    import zlib

    import pyarrow as pa

    from warc_ray.stages.textstats import (COMP_LEVEL, COMP_RATIO_HI,
                                           COMP_RATIO_LO, compression_signal)

    texts = ["word " * 500,                    # hyper-repetitive → low ratio
             "The quick brown fox jumps over the lazy dog. " * 4,
             "kf93jzx1qv8wmt4hy6bn0eds72rcap5guoli",   # noise → high ratio
             ""]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = compression_signal(t)
    for i, s in enumerate(texts):
        raw = len(s.encode())
        comp = len(zlib.compress(s.encode(), COMP_LEVEL))
        ratio = comp * 1_000_000 // max(raw, 1)
        assert out["raw_len"][i].as_py() == raw
        assert out["comp_len"][i].as_py() == comp
        assert out["ratio_ppm"][i].as_py() == ratio
        assert out["keep"][i].as_py() == \
            (COMP_RATIO_LO <= ratio <= COMP_RATIO_HI)
    # the signal discriminates: repetition fails low, noise fails high
    assert not out["keep"][0].as_py()
    assert out["keep"][1].as_py()
    assert not out["keep"][2].as_py()
