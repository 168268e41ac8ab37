"""The import-gated embedding seam (kgx.embedder): fallback parity with the
pure kernel, once-per-worker model loads, and real end-to-end plumbing through
the redundancy-filter path with an injected fake model."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kgx import embedder, fixtures, kernel, sections, textextract


@pytest.fixture(autouse=True)
def _reset_factory():
    yield
    embedder.set_model_factory(None)
    sections.release_context_caches()


def test_fallback_is_hash_embed_byte_identical():
    texts = ["Solar farm in Gujarat", "", "a b c " * 50]
    got = embedder.embed_batch(texts)
    assert got == [kernel.hash_embed(t) for t in texts]


def test_default_factory_import_gated():
    # sentence-transformers is absent in this sandbox: default must be the
    # deterministic fallback, not an ImportError
    model = embedder.current_factory()()
    assert isinstance(model, embedder._HashEmbedModel)


def test_embed_udf_matches_kernel(spark):
    df = spark.createDataFrame(
        [("solar power plant",), ("wind farm",)], "text string"
    )
    rows = df.select("text", embedder.embed_udf()("text").alias("e")).collect()
    for r in rows:
        assert r.e == pytest.approx(kernel.hash_embed(r.text))


def _multi_chunk_bodies(spark, n_groups: int = 6):
    """Bodies whose chunk_text split yields >=2 DISTINCT chunks per group —
    the fixture corpus bodies are mostly single-chunk and would bypass the
    embedding path entirely (the single-chunk fast path)."""
    import random
    from datetime import datetime

    rng = random.Random(7)
    words_a = ["solar", "grid", "inverter", "panel", "megawatt", "tariff"]
    words_b = ["forest", "canopy", "biomass", "seedling", "hectare", "carbon"]
    rows = []
    for i in range(n_groups):
        para_a = " ".join(rng.choice(words_a) for _ in range(400))
        para_b = " ".join(rng.choice(words_b) for _ in range(400))
        rows.append(
            (
                f"https://ex.org/proj/{i:06d}",
                datetime(2026, 1, 1),
                f"sha{i:064d}"[:64],
                0,
                "sector",
                para_a + "\n" + para_b,
            )
        )
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, content_sha string, sec_idx int, "
        "category string, body string",
    )


def test_injected_model_loads_once_per_worker_and_flows(spark, tmp_path):
    bodies = _multi_chunk_bodies(spark).localCheckpoint()
    n_groups = bodies.count()

    log = str(tmp_path / "loads.log")

    # defined INSIDE the test so cloudpickle ships it by value — workers
    # cannot import the tests package
    class CountingFakeModel:
        """Stand-in for a heavy model: records one line per CONSTRUCTION in a
        shared file (workers are separate processes; the file is the witness
        that each loaded it exactly once), then embeds every text identically
        so the redundancy filter provably consumes these vectors."""

        def __init__(self, log_path: str = log):
            with open(log_path, "a") as f:
                f.write(f"{os.getpid()}\n")

        def encode(self, texts):
            return [[1.0] + [0.0] * 63 for _ in texts]

    embedder.set_model_factory(CountingFakeModel)
    fake_rows = {
        (r.url, r.category): r.context
        for r in sections.contexts_refined(bodies, mode="redundant").collect()
    }
    assert len(fake_rows) == n_groups

    embedder.set_model_factory(None)
    best1 = {
        (r.url, r.category): r.context
        for r in sections.contexts_refined(bodies, mode="best1").collect()
    }
    fallback = {
        (r.url, r.category): r.context
        for r in sections.contexts_refined(bodies, mode="redundant").collect()
    }
    # plumbing proof: constant injected embeddings make every chunk a near-dup
    # of the best one, collapsing 'redundant' to the best1 output — while the
    # hash-embed fallback keeps the dissimilar chunks apart
    assert fake_rows == best1
    assert fallback != fake_rows
    assert any("\n" in c for c in fallback.values())

    with open(log) as f:
        pids = [line.strip() for line in f if line.strip()]
    assert pids, "fake model never constructed on any worker"
    # once per worker PROCESS: no pid constructed the model twice, and the
    # total construction count is bounded by workers, not by groups/batches
    assert len(pids) == len(set(pids))
    assert len(pids) < n_groups


def test_default_factory_selects_real_model_when_importable(monkeypatch):
    """The import-gated seam's REAL branch, exercised without network/weights:
    inject a stub sentence_transformers module and the default factory must
    pick it (with the reference's model name, context_extractor.py:33) and
    plumb whole batches through .encode — proving an install upgrades every
    call site with no plumbing change."""
    import sys
    import types

    from kgx import embedder

    class FakeST:
        def __init__(self, name):
            self.name = name
            self.batches = []

        def encode(self, texts):
            self.batches.append(list(texts))
            return [[float(len(t)), 1.0] for t in texts]

    mod = types.ModuleType("sentence_transformers")
    mod.SentenceTransformer = FakeST
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    embedder._CACHE.clear()
    try:
        model = embedder._default_factory()
        assert isinstance(model, FakeST)
        assert model.name == "sentence-transformers/all-MiniLM-L6-v2"
        out = embedder.embed_batch(["ab", "abcd"], factory=embedder._default_factory)
        assert out == [[2.0, 1.0], [4.0, 1.0]]
    finally:
        embedder._CACHE.clear()
