"""Batched embedding seam: a real sentence-transformer model when importable,
the deterministic hash-embedding otherwise.

The reference embeds chunks with MiniLM-L6-v2
(/root/reference/scripts/processing/context_extractor.py:33). This sandbox has
no model weights, so the engine runs on `kernel.hash_embed` — but the seam is
ACTIVATABLE, import-gated exactly like PIL (kgx/ops/multimodal.py) and
openpyxl (kgx/sources.py): install ``sentence-transformers`` and every
embedding call site upgrades, with no plumbing change.

Worker-side contract (the part that matters at scale):
- the model is constructed ONCE PER PYTHON WORKER PROCESS (lazy cache keyed by
  pid), then reused across every Arrow batch / pandas group that worker
  handles — never per batch, never per row;
- call sites embed a BATCH of texts per call (list in, matrix out), so a real
  model gets its GPU/BLAS batching;
- the factory is carried in the UDF CLOSURE (``current_factory()`` at plan
  build time), not read from module globals on the worker — module globals
  re-initialize on worker import, so a driver-side injection would otherwise
  silently vanish. This is also the test seam: inject a fake heavy model with
  ``set_model_factory`` and the workers provably load it once each.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from kgx import kernel

# a model = any object with .encode(list[str]) -> sequence of vectors
ModelFactory = Callable[[], object]

_FACTORY: ModelFactory | None = None  # driver-side injection (tests/custom)
_CACHE: dict[tuple[int, int], object] = {}  # (pid, id-ish of factory) -> model


class _HashEmbedModel:
    """Fallback model: kernel.hash_embed per text — pure, deterministic, and
    byte-identical to the golden single-process extractor's embeddings (the
    redundancy-filter parity tests depend on this)."""

    dim = 64

    def encode(self, texts: list[str]) -> list[list[float]]:
        return [kernel.hash_embed(t) for t in texts]


def _default_factory() -> object:
    try:
        from sentence_transformers import SentenceTransformer  # noqa: F401
    except Exception:
        return _HashEmbedModel()
    # all-MiniLM-L6-v2: the reference's model (context_extractor.py:33)
    return SentenceTransformer("sentence-transformers/all-MiniLM-L6-v2")


def set_model_factory(factory: ModelFactory | None) -> None:
    """Inject a model factory (None restores the import-gated default).
    Driver-side: call BEFORE building the plan — UDFs capture the factory in
    their closure at construction time."""
    global _FACTORY
    _FACTORY = factory
    _CACHE.clear()


def current_factory() -> ModelFactory:
    """The factory a plan built right now should ship to workers."""
    return _FACTORY or _default_factory


def load_model(factory: ModelFactory) -> object:
    """Once-per-worker-process model load: cached by (pid, factory identity).
    The pid key makes the cache correct under fork-based worker reuse AND
    lets tests assert exactly-one-load-per-worker."""
    key = (os.getpid(), id(factory))
    model = _CACHE.get(key)
    if model is None:
        model = factory()
        _CACHE[key] = model
    return model


def embed_batch(
    texts: list[str], factory: ModelFactory | None = None
) -> list[list[float]]:
    """Embed one batch of texts with the once-per-worker model."""
    model = load_model(factory or current_factory())
    return [list(map(float, v)) for v in model.encode(list(texts))]


def embed_udf():
    """Column-level embedding as an Arrow-batched pandas UDF:
    ``df.withColumn("emb", embed_udf()("text"))``. The factory active at
    plan-build time rides the closure; the model loads once per worker."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    factory = current_factory()

    def emb(texts: pd.Series) -> pd.Series:
        model = load_model(factory)
        return pd.Series(
            [list(map(float, v)) for v in model.encode(texts.fillna("").tolist())]
        )

    # explicit Series->Series hints via a plain signature: the module uses
    # `from __future__ import annotations`, under which pyspark can't resolve
    # locally-imported names in stringified hints — so declare the eval type
    # through pandas_udf's functional form with concrete annotations attached
    emb.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(emb, T.ArrayType(T.DoubleType()))
