"""Byte-bigram LM perplexity — deterministic KenLM stand-in.

KenLM is not installable here, so the LM is a byte-level bigram model with
add-one smoothing built from the embedded allowed-language corpora
(graft/synth.py WORDS minus the disallowed language). The 257×257 log-prob
table makes scoring fully numpy-vectorizable: a caption scores as
``exp(-mean(log P(b_i | b_{i-1})))`` via two fancy-indexed lookups — no
per-character Python.

Role in the reference: the graft analogue of numerical outlier scoring
(`/root/reference/mipqctool/model/qctypes/numerical.py:73-102` bounds) —
a scalar quality score thresholded by the rule engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F, types as T

BOS = 256  # virtual start-of-text byte


class BigramLM:
    def __init__(self, corpus: str):
        counts = np.ones((257, 257))  # add-one smoothing
        arr = np.frombuffer(corpus.encode("utf-8"), dtype=np.uint8)
        prev = np.concatenate([[BOS], arr[:-1].astype(np.int64)])
        np.add.at(counts, (prev, arr.astype(np.int64)), 1)
        self.logp = np.log(counts / counts.sum(axis=1, keepdims=True))

    def perplexity(self, s: str | None) -> float:
        if not isinstance(s, str) or not s:  # None/NaN/empty
            return float("inf")
        arr = np.frombuffer(s.lower().encode("utf-8"), dtype=np.uint8).astype(np.int64)
        prev = np.concatenate([[BOS], arr[:-1]])
        return float(np.exp(-self.logp[prev, arr].mean()))

    def batch(self, series: pd.Series) -> pd.Series:
        return series.map(self.perplexity).astype("float64")


_LM: BigramLM | None = None


def get_lm() -> BigramLM:
    global _LM
    if _LM is None:
        from dataqualitycontroltool_spark.graft.synth import ALLOWED_LANGS, WORDS

        corpus = " ".join(" ".join(WORDS[lang]) for lang in sorted(ALLOWED_LANGS))
        _LM = BigramLM(corpus)
    return _LM


@F.pandas_udf(T.DoubleType())
def perplexity_udf(captions: pd.Series) -> pd.Series:
    return get_lm().batch(captions)


def perplexity(caption: Column) -> Column:
    return perplexity_udf(caption)
