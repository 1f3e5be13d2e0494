"""Real-model inference path (A12-A14) exercised with an injected stub
model — the batching/singleton/schema logic of the mapInPandas pipeline
(reference generate_embeddings.py:69-107) runs for real; only the model
weights are absent (torch not in image)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvector_db_spark.functions.embedding import (
    DeterministicStubModel,
    _MODEL_CACHE,
    _load_model,
    embed_text,
)


def test_load_model_caches_singleton():
    """The factory runs ONCE per (process, name) — the per-executor
    singleton contract the reference's load-once pattern maps to."""
    calls = []

    def factory():
        calls.append(1)
        return DeterministicStubModel()

    _MODEL_CACHE.pop("stub-cache-test", None)
    m1 = _load_model("stub-cache-test", factory)
    m2 = _load_model("stub-cache-test", factory)
    assert m1 is m2
    assert len(calls) == 1
    _MODEL_CACHE.pop("stub-cache-test", None)


def test_same_qualname_factories_get_distinct_cache_slots():
    """Two factory closures built in a loop share a __qualname__ but carry
    different captured config — the cache key must include object
    identity so the second never silently reuses the first's model
    (r3 ADVICE: embedding.py cache-key collision)."""
    from pgvector_db_spark.functions.embedding import _factory_cache_key

    factories = []
    for dim in (2, 3):
        def factory(d=dim):
            m = DeterministicStubModel()
            m.dim = d
            return m

        factories.append(factory)
    k1 = _factory_cache_key("loop-stub", factories[0])
    k2 = _factory_cache_key("loop-stub", factories[1])
    assert k1 != k2
    m1 = _load_model("loop-stub", factories[0], cache_key=k1)
    m2 = _load_model("loop-stub", factories[1], cache_key=k2)
    assert m1 is not m2
    assert (m1.dim, m2.dim) == (2, 3)
    _MODEL_CACHE.pop(k1, None)
    _MODEL_CACHE.pop(k2, None)


def test_factory_key_survives_gc_address_reuse():
    """id() can be reused after a factory is garbage-collected; the
    weakref-token scheme must give a dead factory's successor a DIFFERENT
    key even if CPython reallocates the same address (code-review finding:
    the old id()-based key aliased the successor to the dead factory's
    cached model)."""
    import gc

    from pgvector_db_spark.functions.embedding import _factory_cache_key

    def make(dim):
        def factory(d=dim):
            m = DeterministicStubModel()
            m.dim = d
            return m

        return factory

    f1 = make(2)
    k1 = _factory_cache_key("gc-test", f1)
    del f1
    gc.collect()
    f2 = make(3)  # may land at the same address as f1
    k2 = _factory_cache_key("gc-test", f2)
    assert k1 != k2


def test_model_cache_is_bounded():
    """Per-worker model cache must not grow one entry per factory object
    forever — a long-lived executor fed fresh (equivalent) factories per
    call would OOM with real model weights."""
    from pgvector_db_spark.functions.embedding import (
        _MODEL_CACHE_MAX,
        _factory_cache_key,
    )

    before = dict(_MODEL_CACHE)
    _MODEL_CACHE.clear()
    try:
        keep_alive = []
        for i in range(_MODEL_CACHE_MAX + 3):
            def factory(j=i):
                m = DeterministicStubModel()
                m.dim = j
                return m

            keep_alive.append(factory)
            k = _factory_cache_key("bound-test", factory)
            _load_model("bound-test", factory, cache_key=k)
        assert len(_MODEL_CACHE) == _MODEL_CACHE_MAX
    finally:
        _MODEL_CACHE.clear()
        _MODEL_CACHE.update(before)


def test_load_model_without_deps_raises_gated_error():
    _MODEL_CACHE.pop("definitely-not-cached", None)
    try:
        _load_model("definitely-not-cached")
        raised = False
    except NotImplementedError as exc:
        raised = True
        assert "sentence-transformers" in str(exc)
    assert raised


def test_embed_text_injected_model_values_and_schema(spark):
    """End-to-end through mapInPandas: Arrow batches in, model.encode
    per batch, array<float> out; values match the stub's definition
    computed independently in the JVM."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "a"), (3, ""), (4, None), (5, "x y z")],
        "id bigint, text string",
    )
    out = embed_text(
        df, model="stub-unit", model_factory=DeterministicStubModel,
        batch_size=2,
    )
    assert dict(out.dtypes)["embedding"] == "array<float>"
    rows = {r["id"]: r["embedding"] for r in out.collect()}
    # null text -> fillna("") -> zero features
    assert rows[4] == [0.0, 0.0, 0.0, 1.0]
    assert rows[3] == [0.0, 0.0, 0.0, 1.0]
    assert rows[1] == [11.0, float(ord("h")), 1.0, 1.0]
    assert rows[5] == [5.0, float(ord("x")), 2.0, 1.0]
    # independent JVM check over the whole output: length/first-codepoint/
    # space-count recomputed as Catalyst expressions must agree row-wise
    joined = out.withColumn(
        "ok",
        (F.col("embedding")[0] == F.length(F.coalesce("text", F.lit("")))
         .cast("float"))
        & (F.col("embedding")[2]
           == (F.length(F.coalesce("text", F.lit("")))
               - F.length(F.replace(F.coalesce("text", F.lit("")),
                                    F.lit(" "), F.lit("")))).cast("float")),
    )
    assert joined.filter(~F.col("ok")).count() == 0


def test_embed_text_preserves_input_columns(spark, tables):
    docs = tables["documents"].select("doc_id", "source", "text").limit(20)
    out = embed_text(
        docs, model="stub-cols", model_factory=DeterministicStubModel
    )
    assert out.columns == ["doc_id", "source", "text", "embedding"]
    assert out.count() == 20


@pytest.mark.realmodel
def test_real_sentence_transformers_inference(spark):
    """The torch-weights upgrade path, ready to light up: if a future
    image ships sentence-transformers, embed_text needs ZERO code changes
    — this test then runs real inference end-to-end (shape, dtype,
    non-degeneracy). Today it skips cleanly (r3 verdict item #7)."""
    pytest.importorskip(
        "sentence_transformers",
        reason="sentence-transformers/torch not installed in this image",
    )
    df = spark.createDataFrame(
        [(1, "a small test sentence"), (2, "another, rather different one")],
        "id bigint, text string",
    )
    out = embed_text(
        df, model="sentence-transformers/all-MiniLM-L6-v2", batch_size=8
    )
    assert dict(out.dtypes)["embedding"] == "array<float>"
    rows = {r["id"]: r["embedding"] for r in out.collect()}
    assert len(rows) == 2
    dims = {len(v) for v in rows.values()}
    assert dims == {384}  # MiniLM-L6-v2 output width
    assert rows[1] != rows[2]  # distinct inputs -> distinct vectors
    assert all(isinstance(x, float) for x in rows[1][:4])


def test_download_distribute_embed_pipeline(spark, tmp_path):
    """A17 + A12 composed end-to-end without torch: inject a downloader
    that materializes a 'model dir' (weights file = the stub's config),
    distribute it to executors via addFile, and run the REAL mapInPandas
    inference path with a factory that loads its parameters from the
    distributed dir — the exact production wiring, deterministic parts
    swapped in."""
    import json
    import os

    from pgvector_db_spark.utils import distribute_model_dir, download_model

    def fake_downloader(name, dest):
        os.makedirs(dest, exist_ok=True)
        with open(os.path.join(dest, "config.json"), "w") as f:
            json.dump({"dim": 4, "name": name}, f)
        return dest

    local_dir = download_model(
        "org/stub-model", str(tmp_path), downloader=fake_downloader
    )
    basename = distribute_model_dir(spark, local_dir)

    class DirLoadedStub(DeterministicStubModel):
        def __init__(self):
            import json as _json

            from pyspark import SparkFiles

            path = SparkFiles.get(basename)
            with open(os.path.join(path, "config.json")) as f:
                cfg = _json.load(f)
            assert cfg["dim"] == 4  # the distributed weights are readable

    df = spark.createDataFrame([(1, "ab"), (2, "c d")], "id bigint, text string")
    out = embed_text(
        df, model="dir-stub", model_factory=DirLoadedStub, batch_size=8
    )
    rows = {r["id"]: r["embedding"] for r in out.collect()}
    assert rows[1] == [2.0, float(ord("a")), 0.0, 1.0]
    assert rows[2] == [3.0, float(ord("c")), 1.0, 1.0]
