"""Embedding-backend isolation tests (reference tests/test_remote.py
strategy: mock the provider module, no network)."""

import sys
import types

import numpy as np
import pytest

from cordon_spark.config import AnalysisConfig
from cordon_spark.functions import embeddings as E


def test_factory_selects_backend():
    assert callable(E.create_embedder(AnalysisConfig(backend="hash")))
    assert callable(E.create_embedder(AnalysisConfig(backend="sentence-transformers")))
    assert callable(E.create_embedder(AnalysisConfig(backend="remote")))


def test_remote_batch_normalizes(monkeypatch):
    fake = types.ModuleType("litellm")
    calls = {}

    def embedding(model, input, api_key, api_base, timeout):
        calls["model"] = model
        calls["n"] = len(input)
        return {"data": [{"embedding": [3.0, 4.0]} for _ in input]}

    fake.embedding = embedding
    monkeypatch.setitem(sys.modules, "litellm", fake)
    mat = E.remote_embed_batch(["a", "b"], "m1", None, "key", 5.0)
    assert calls == {"model": "m1", "n": 2}
    assert np.allclose(mat, [[0.6, 0.8], [0.6, 0.8]])


def test_remote_errors_become_runtime(monkeypatch):
    fake = types.ModuleType("litellm")

    def embedding(**kwargs):
        raise TimeoutError("slow provider")

    fake.embedding = embedding
    monkeypatch.setitem(sys.modules, "litellm", fake)
    with pytest.raises(RuntimeError, match="remote embedding failed"):
        E.remote_embed_batch(["a"], "m1", None, None, 1.0)


def test_remote_zero_vector_guard(monkeypatch):
    fake = types.ModuleType("litellm")
    fake.embedding = lambda **kw: {"data": [{"embedding": [0.0, 0.0]}]}
    monkeypatch.setitem(sys.modules, "litellm", fake)
    mat = E.remote_embed_batch(["a"], "m", None, None, 1.0)
    assert np.allclose(mat, [[0.0, 0.0]])


def test_sentence_transformers_gated():
    # backend exists behind an import guard; absent lib -> UDF would fail
    # at executor import time, the factory itself must not require it
    fn = E.create_embedder(AnalysisConfig(backend="sentence-transformers"))
    assert callable(fn)


def test_llama_batch_mocked(monkeypatch):
    fake = types.ModuleType("llama_cpp")

    class FakeLlama:
        def __init__(self, model_path, embedding, verbose):
            self.model_path = model_path

        def create_embedding(self, text):
            return {"data": [{"embedding": [1.0, 1.0, 1.0, 1.0]}]}

    fake.Llama = FakeLlama
    monkeypatch.setitem(sys.modules, "llama_cpp", fake)
    E._llama_model_cache.clear()
    mat = E.llama_embed_batch(["a", "b"], "fake.gguf")
    assert mat.shape == (2, 4)
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0)  # llama_cpp.py:62-64
    # model cached once per worker
    assert len(E._llama_model_cache) == 1


def test_llama_factory():
    from cordon_spark.config import AnalysisConfig

    assert callable(E.create_embedder(AnalysisConfig(backend="llama-cpp")))
