"""Embedding generation (reference generate_embeddings.py:22-109), Spark-first.

Two paths:

1. **Deterministic fake embedder** — pure Catalyst expression (md5-derived
   floats), replacing the reference's random test vectors
   (demo/test_db_connection.py:42-46). Being SQL-expressible, the SAME
   computation runs in the DuckDB oracle, so embedding pipelines are
   hash-checkable end-to-end. It is also JVM-side + codegen'd, i.e. far
   faster than any Python UDF.

2. **Real model path** — ``mapInPandas`` with a per-executor model
   singleton, mirroring the reference's batched ``model.encode``
   (generate_embeddings.py:69-92, batch_size=500 default at :27). The
   heavy libs (torch/sentence-transformers) are not in this image, so the
   loader is gated behind an import-try and tests use the fake path; the
   Spark-side plumbing (schema, Arrow batching, partition-parallel
   inference) is real.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "123456789abcdef"  # instr() yields 0 for '0', 1-15 for '1'-'f'


def _hex4_to_unit(h: Column) -> Column:
    """First 4 hex chars of a digest → double in [-1, 1)."""
    val = reduce(
        lambda acc, j: acc + F.instr(F.lit(_HEX), F.substring(h, j + 1, 1)).cast("double")
        * float(16 ** (3 - j)),
        range(4),
        F.lit(0.0),
    )
    return val / F.lit(32768.0) - F.lit(1.0)


def fake_embedding(text: Column | str, dim: int = 8) -> Column:
    """Deterministic pseudo-embedding of ``text`` as array<double>.

    Component i = md5(text || '_i')[0:4] scaled to [-1, 1). Entirely
    JVM-side; vectorized; identical in the DuckDB oracle via
    :func:`fake_embedding_component_sql`.
    """
    t = F.col(text) if isinstance(text, str) else text
    comps = [
        _hex4_to_unit(F.md5(F.concat(t, F.lit(f"_{i}")))) for i in range(dim)
    ]
    return F.array(*comps)


def fake_embedding_component_sql(text_expr: str, i: int, dialect: str = "spark") -> str:
    """SQL for component ``i`` of the fake embedding — valid in both Spark
    SQL and DuckDB (same md5, substr, instr semantics)."""
    concat = f"concat({text_expr}, '_{i}')"
    h = f"md5({concat})"
    terms = " + ".join(
        f"CAST(instr('{_HEX}', substr({h}, {j + 1}, 1)) AS DOUBLE) * {16 ** (3 - j)}.0"
        for j in range(4)
    )
    return f"(({terms}) / 32768.0 - 1.0)"


def fake_embedding_sql(text_expr: str, dim: int = 8, dialect: str = "spark") -> str:
    comps = ", ".join(
        fake_embedding_component_sql(text_expr, i, dialect) for i in range(dim)
    )
    return f"array({comps})" if dialect == "spark" else f"[{comps}]"


# ---------------------------------------------------------------------------
# Real-model path (A12-A14): mapInPandas + per-executor singleton.
# ---------------------------------------------------------------------------

# Per-python-worker model cache. OrderedDict + a size cap: injected
# factories get identity-distinct keys (below), so an unbounded dict
# would retain one model per factory object a long-lived executor ever
# saw — with real sentence-transformers weights that's an OOM, not a
# leak. LRU order: re-use moves an entry to the back, eviction pops the
# front.
from collections import OrderedDict as _OrderedDict  # noqa: E402

_MODEL_CACHE: "_OrderedDict[str, object]" = _OrderedDict()
_MODEL_CACHE_MAX = 4

# Driver-side identity tokens for injected factories: a WeakKeyDictionary
# plus a monotonic counter gives every factory OBJECT a stable, unique,
# never-reused token — unlike raw id(), which CPython reuses after GC,
# silently aliasing a NEW factory to a DEAD one's cached model.
import itertools as _itertools  # noqa: E402
import weakref as _weakref  # noqa: E402

_FACTORY_TOKENS: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
_FACTORY_COUNTER = _itertools.count()


class DeterministicStubModel:
    """Injectable stand-in for a sentence-transformers model: same
    ``encode(texts, batch_size=)`` surface (reference
    generate_embeddings.py:69-92), deterministic SQL-expressible output —
    component 0 = codepoint length, 1 = first codepoint, 2 = space count,
    3 = 1.0 — so the REAL inference pipeline (mapInPandas, Arrow batching,
    per-worker singleton, schema handling) is exercised and
    oracle-checked end-to-end where torch is absent."""

    dim = 4

    def encode(self, texts, batch_size: int = 32):
        import numpy as np

        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            out[i, 0] = float(len(t))
            out[i, 1] = float(ord(t[0])) if t else 0.0
            out[i, 2] = float(t.count(" "))
            out[i, 3] = 1.0
        return out


def _factory_cache_key(model_name: str, factory) -> str:
    """Driver-side cache key for an injected factory. Includes the
    factory OBJECT identity, not just its qualname: two distinct closures
    built in a loop share a qualname but must not share a cached model.
    Identity comes from a weakref-keyed token map with a monotonic
    counter — NOT ``id()``, which CPython reuses once a factory is
    garbage-collected (a later, different factory allocated at the same
    address would silently inherit the dead one's cached model). The key
    is computed on the driver and closed over into the worker-side task,
    so every task of one ``embed_text`` call agrees on it and the
    per-worker singleton still holds."""
    try:
        tok = _FACTORY_TOKENS.get(factory)
        if tok is None:
            tok = next(_FACTORY_COUNTER)
            _FACTORY_TOKENS[factory] = tok
    except TypeError:
        # not weak-referenceable (rare: e.g. some builtins) — fall back
        # to id(); such callers should pass an explicit cache_key
        tok = f"id{id(factory):#x}"
    return (
        f"{model_name}#injected:"
        f"{getattr(factory, '__module__', '?')}."
        f"{getattr(factory, '__qualname__', repr(factory))}"
        f"@{tok}"
    )


def _load_model(model_name: str, factory=None, cache_key: str | None = None):
    """Per-executor-process model singleton (the reference loads once per
    process at generate_embeddings.py:52-67; on Spark that becomes once per
    executor python worker). ``factory`` — an injected zero-arg callable
    returning an object with ``.encode(texts, batch_size=)`` — takes
    precedence over the sentence-transformers hub path, so the full
    mapInPandas pipeline (Arrow batching, cache, schema) runs with any
    model implementation, including deterministic stubs in tests.
    ``cache_key`` should be precomputed DRIVER-side via
    ``_factory_cache_key`` when a factory is injected (worker-side
    ``id()`` would differ per unpickled copy and defeat the cache)."""
    # key includes the factory identity: caching by name alone would let
    # an injected stub poison the name for a later factory-less call
    # (silently returning stub vectors where real ones were expected)
    if cache_key is not None:
        key = cache_key
    elif factory is None:
        key = model_name
    else:
        key = _factory_cache_key(model_name, factory)
    if key not in _MODEL_CACHE:
        if factory is not None:
            _MODEL_CACHE[key] = factory()
        else:
            try:
                from sentence_transformers import SentenceTransformer  # type: ignore
            except ImportError as exc:  # pragma: no cover - heavy dep absent in CI
                raise NotImplementedError(
                    "sentence-transformers is not installed in this environment; "
                    "use embed_text(..., model='fake') for the deterministic "
                    "path or inject model_factory"
                ) from exc
            _MODEL_CACHE[key] = SentenceTransformer(model_name)
        while len(_MODEL_CACHE) > _MODEL_CACHE_MAX:
            _MODEL_CACHE.popitem(last=False)  # evict least-recently used
    else:
        _MODEL_CACHE.move_to_end(key)
    return _MODEL_CACHE[key]


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    model: str = "fake",
    dim: int = 8,
    batch_size: int = 500,
    model_factory=None,
) -> DataFrame:
    """Append an embedding column for ``text_col``.

    ``model='fake'`` → native-expression deterministic embedding (tests,
    oracle). Any other name → the REAL inference path: ``mapInPandas``
    (Arrow-batched, model cached per executor python worker; reference
    generate_embeddings.py:69-92). The model object comes from
    ``model_factory`` when given (shipped by cloudpickle to the workers —
    anything exposing ``.encode(texts, batch_size=)``, e.g. a
    deterministic stub where torch is absent) else from
    sentence-transformers by name.
    """
    if model == "fake":
        return df.withColumn(out_col, fake_embedding(F.col(text_col), dim))

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<float>"
    # key fixed driver-side so all tasks of this call share one cache slot
    cache_key = (
        _factory_cache_key(model, model_factory)
        if model_factory is not None
        else None
    )

    def infer(batches: Iterator) -> Iterator:
        mdl = _load_model(model, model_factory, cache_key=cache_key)
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            embs = mdl.encode(texts, batch_size=batch_size)  # type: ignore[attr-defined]
            pdf = pdf.copy()
            pdf[out_col] = [
                e.tolist() if hasattr(e, "tolist") else list(e) for e in embs
            ]
            yield pdf

    # NOTE(r13): measured A/B rejected repartitioning before the
    # mapInPandas — per-task Python worker + model-init overhead beats
    # the parallelism gain for cheap encoders on tiny scans; a caller
    # with a genuinely heavy model repartitions its own input
    return df.mapInPandas(infer, schema=out_schema)
