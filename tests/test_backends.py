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
        def __init__(self, model_path, embedding, n_ctx, n_threads, n_gpu_layers,
                     n_batch, verbose):
            self.model_path = model_path
            # reference constructor surface (llama_cpp.py:35-43)
            assert n_batch == n_ctx
            self.knobs = (n_ctx, n_threads, n_gpu_layers)

        def create_embedding(self, text):
            return {"data": [{"embedding": [1.0, 1.0, 1.0, 1.0]}]}

    fake.Llama = FakeLlama
    monkeypatch.setitem(sys.modules, "llama_cpp", fake)
    E._llama_model_cache.clear()
    mat = E.llama_embed_batch(["a", "b"], "fake.gguf", n_ctx=512, n_threads=2)
    assert E._llama_model_cache[("fake.gguf", 512, 2, 0)].knobs == (512, 2, 0)
    assert mat.shape == (2, 4)
    # different knobs -> different cached model (no silent reuse)
    E.llama_embed_batch(["a"], "fake.gguf", n_ctx=1024, n_threads=2)
    assert ("fake.gguf", 1024, 2, 0) in E._llama_model_cache
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0)  # llama_cpp.py:62-64
    # model cached per (path, knobs) per worker
    assert len(E._llama_model_cache) == 2


def test_llama_factory():
    from cordon_spark.config import AnalysisConfig

    cfg = AnalysisConfig(backend="llama-cpp", model_name="/models/x.gguf")
    assert callable(E.create_embedder(cfg))


def test_gguf_resolve_explicit_path_passthrough():
    assert E.resolve_gguf_model("/models/y.gguf") == "/models/y.gguf"


def test_gguf_autodownload_mocked(monkeypatch):
    """Default model auto-download seam (reference llama_cpp.py:68-95):
    mocked hf_hub_download returns a cached path; download failures and
    a missing huggingface_hub both map to RuntimeError with manual
    guidance."""
    fake = types.ModuleType("huggingface_hub")
    calls = {}

    def hf_hub_download(repo_id, filename):
        calls["args"] = (repo_id, filename)
        return f"/cache/{filename}"

    fake.hf_hub_download = hf_hub_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    got = E.resolve_gguf_model(None)
    assert got == f"/cache/{E.DEFAULT_GGUF_FILENAME}"
    assert calls["args"] == (E.DEFAULT_GGUF_REPO_ID, E.DEFAULT_GGUF_FILENAME)

    def boom(repo_id, filename):
        raise OSError("no network")

    fake.hf_hub_download = boom
    with pytest.raises(RuntimeError, match="manually download"):
        E.resolve_gguf_model(None)


def test_gguf_autodownload_requires_hub(monkeypatch):
    monkeypatch.setitem(sys.modules, "huggingface_hub", None)
    with pytest.raises(RuntimeError, match="huggingface_hub is required"):
        E.resolve_gguf_model(None)


def test_truncation_warning_heuristic():
    """Reference transformer.py:149-199: avg tokens > 1.2 x max_seq ->
    warn once with coverage guidance; short inputs stay silent."""
    import warnings

    class FakeTok:
        def encode(self, text, add_special_tokens=True):
            return text.split()  # 1 token per word

    class FakeModel:
        tokenizer = FakeTok()
        max_seq_length = 10

    E._truncation_warned = False
    long_texts = [" ".join(["tok"] * 50) + "\nline2 here"] * 12
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert E.check_truncation_warning(long_texts, FakeModel(), "mini") is True
        assert any("TRUNCATION" in str(x.message) for x in w)
    # warn-once latch
    assert E.check_truncation_warning(long_texts, FakeModel(), "mini") is False

    E._truncation_warned = False
    short = ["few tokens only"] * 5
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert E.check_truncation_warning(short, FakeModel(), "mini") is False
        assert not w
