"""Embedding-encoder plumbing (X6) with a pluggable model hook.

The reference encodes text with a local MiniLM-L6-v2 model
(``agents/slack_search_agent.py:38-44``, ``save_models_locally.py``);
that model isn't in this container, so the default encoder is a
deterministic hash fake behind the same contract: an Arrow-batched
``pandas_udf`` mapping ``string -> array<float>`` of fixed dimension.

Swapping a real model in is a PUBLIC hook, not a code edit:

    register_encoder("my-model", lambda: MyModel().encode)   # factory
    df.select(encoder_udf("my-model")(F.col("text")))

The factory runs LAZILY, once per executor process, inside the UDF —
exactly where a sentence-transformers model must be loaded (loading on
the driver and shipping the weights through the closure would serialize
hundreds of MB per task).  A ``"minilm"`` factory is pre-registered and
raises a helpful ImportError where sentence-transformers is absent;
tests skip on that, and a locally-registered fake exercises the hook
end-to-end either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 64

#: An encoder maps a batch of strings to equal-length float vectors.
Encoder = Callable[[Sequence[str]], Sequence[Sequence[float]]]
#: Factories defer model loading to first use on each executor.
EncoderFactory = Callable[[], Encoder]


def _hash_encode_one(text: str) -> list[float]:
    out = []
    data = (text or "").encode("utf-8", "ignore")
    for i in range(EMBED_DIM):
        h = hashlib.sha256(data + bytes([i])).digest()
        out.append((int.from_bytes(h[:4], "big") % 20_001 - 10_000) / 10_000.0)
    return out


def _hash_encoder() -> Encoder:
    return lambda texts: [_hash_encode_one(t) for t in texts]


def _minilm_encoder() -> Encoder:
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:  # pragma: no cover - absent in this container
        raise ImportError(
            "the 'minilm' encoder needs sentence-transformers; install it "
            "or register_encoder() a custom factory"
        ) from e
    model = SentenceTransformer("all-MiniLM-L6-v2")
    return lambda texts: model.encode(list(texts)).tolist()


_ENCODERS: dict[str, EncoderFactory] = {
    "hash": _hash_encoder,
    "minilm": _minilm_encoder,
}


def register_encoder(name: str, factory: EncoderFactory) -> None:
    """Register a lazily-loaded encoder under ``name`` for
    :func:`encoder_udf`."""
    _ENCODERS[name] = factory


def encoder_udf(model: str | EncoderFactory = "hash"):
    """Arrow-batched ``string -> array<float>`` UDF for the given model.

    ``model`` is a registered name or a factory callable; the factory is
    invoked once per executor process on first batch (lazy singleton) and
    its result reused for every subsequent batch.
    """
    factory = _ENCODERS[model] if isinstance(model, str) else model
    state: dict[str, Encoder] = {}

    def _batch(texts: pd.Series) -> pd.Series:
        enc = state.get("enc")
        if enc is None:
            enc = state["enc"] = factory()
        return pd.Series(list(enc(texts.tolist())), index=texts.index)

    return F.pandas_udf(_batch, T.ArrayType(T.FloatType()))


#: Default instance (deterministic hash encoder) — the drop-in used by
#: the relevance/similarity queries.
encode_text = encoder_udf("hash")
