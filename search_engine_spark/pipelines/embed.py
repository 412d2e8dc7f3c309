"""Document embedding stage: a pluggable batch-embedder UDF slot.

Reference parity (P8): the reference extracts per-document "vector points"
during indexing (``/root/reference/src/update/index_documents/extract/
extract_vector_points.rs``) and fills them by calling a configured embedding
model — HuggingFace / OpenAI / Ollama / arbitrary REST, all batch APIs
(``src/vector/mod.rs:227-268`` ``Embedder::embed`` / ``embed_chunks``,
backends under ``src/vector/{hf,openai,ollama,rest}.rs``). External model
services don't exist in this sandbox, so the MODEL is replaced by a
deterministic stand-in while the Spark-side plumbing is the real thing a
model UDF needs:

* Arrow-batched ``mapInPandas`` — texts arrive as a pandas batch, the
  embedder returns an ``(n, dim)`` matrix (exactly the reference's
  ``embed_chunks`` shape);
* per-executor weight caching — the default embedder memoizes its token
  projection vectors across batches on each executor, the same lifecycle a
  loaded ONNX/torch model would have;
* column pruning — only (id, text) is shipped to Python;
* the embedder is a plain callable, so swapping in a real model is one
  constructor argument (``embed_documents(df, embedder=my_model)``).

The default :class:`HashedBowEmbedder` is an md5-projection bag-of-words:
token ``t`` contributes the vector ``v(t)[d] = md5(f"{t}:{d}")`` scaled to
``[-1, 1)`` (the same md5 formula as the LSH hyperplanes in
``pipelines/similarity.py``, so the DuckDB oracle can reproduce it exactly),
and the document embedding is the L2-normalized tf-weighted sum. It is a
real (if crude) embedding — near-duplicate documents land near each other —
which makes the downstream ANN / near-dup operators exercisable end-to-end
without any external service.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_SCALE = float(1 << 59)


class HashedBowEmbedder:
    """Deterministic md5-projection bag-of-words embedder.

    ``__call__(texts) -> np.ndarray (n, dim)`` — the batch contract a real
    model UDF implements. Token projection vectors are memoized in
    ``self._weights`` (per-executor, across Arrow batches — the "loaded
    model weights" analogue; the UDF closure keeps one instance alive per
    worker).
    """

    def __init__(self, dim: int = 16):
        self.dim = dim
        self._weights: dict[str, np.ndarray] = {}

    def _token_vec(self, tok: str) -> np.ndarray:
        v = self._weights.get(tok)
        if v is None:
            v = np.array(
                [
                    int(hashlib.md5(f"{tok}:{d}".encode()).hexdigest()[:15], 16)
                    / _SCALE
                    - 1.0
                    for d in range(self.dim)
                ],
                dtype=np.float64,
            )
            self._weights[tok] = v
        return v

    def __call__(self, texts: list) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        # factorize the batch's tokens so each distinct token's projection
        # is looked up once, then accumulate with one np.add.at
        all_toks: list[str] = []
        doc_idx: list[int] = []
        for i, t in enumerate(texts):
            toks = _TOKEN_RE.findall(t) if t else []
            all_toks.extend(toks)
            doc_idx.extend([i] * len(toks))
        if not all_toks:
            return out
        codes, uniques = pd.factorize(np.asarray(all_toks, dtype=object))
        mat = np.empty((len(uniques), self.dim), dtype=np.float64)
        for j, tok in enumerate(uniques):
            mat[j] = self._token_vec(tok)
        np.add.at(out, np.asarray(doc_idx), mat[codes])
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)


def embed_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
    out_col: str = "embedding",
    embedder=None,
    template=None,
) -> DataFrame:
    """Attach an ``array<double>`` embedding column to each document.

    ``embedder``: any callable ``list[str] -> np.ndarray (n, dim)``; one
    instance is pickled into the UDF closure and reused for every Arrow
    batch on an executor (model-weight lifecycle). Defaults to
    :class:`HashedBowEmbedder`.

    ``template``: a :class:`~search_engine_spark.pipelines.prompt.
    PromptTemplate` (or template string) rendered per document INSTEAD of
    the raw ``text_col`` — the reference's prompt layer
    (``src/prompt/mod.rs``): the model embeds ``"{{title}}: {{body}}"``,
    not a fixed column. Rendering is JVM-side (one codegen ``concat``);
    referenced fields are schema-checked up front (template_checker
    parity) and only those columns ship to Python.

    Scale shape: embarrassingly parallel map — no shuffle, input pruned to
    (id, prompt text); output partitioning inherited, so a downstream
    ``.write.parquet`` streams without an exchange.
    """
    if embedder is None:
        embedder = HashedBowEmbedder(dim)
    id_type = df.schema[id_col].dataType.simpleString()

    if template is not None:
        from .prompt import PromptTemplate

        if not isinstance(template, PromptTemplate):
            template = PromptTemplate(template)
        template.check(df)
        src = df.select(
            id_col, template.column().alias("_prompt")
        )
        text_key = "_prompt"
    else:
        src = df.select(id_col, text_col)
        text_key = text_col

    def run(batches):
        for pdf in batches:
            vecs = embedder(pdf[text_key].fillna("").tolist())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: list(vecs),
                }
            )

    return src.mapInPandas(
        run, schema=f"{id_col} {id_type}, {out_col} array<double>"
    )


class RetryableEmbedderError(RuntimeError):
    """Transport signaled a retryable failure (HTTP 429/5xx analogue)."""


class RestEmbedder:
    """Batching/retrying REST embedder adapter (reference
    ``src/vector/rest.rs`` semantics: fixed-size request batches, retries
    with exponential backoff on retryable statuses, response-shape
    validation; ``src/vector/mod.rs:24`` runs these on a 40-way thread
    pool — Spark's task parallelism replaces the pool, one adapter
    instance per executor).

    No live HTTP happens in this sandbox, so the transport is INJECTED:
    ``transport(payload: dict) -> dict`` does the actual POST and returns
    the decoded JSON. Point it at ``requests.post(url, json=payload,
    headers=...).json()`` in a networked deployment; tests pass a local
    fake. A transport raising :class:`RetryableEmbedderError` is retried
    up to ``max_retries`` times with exponential backoff
    (``backoff_s * 2**attempt``); any other exception propagates
    immediately (the reference treats non-retryable statuses the same
    way).

    Request/response shape (OpenAI-compatible, like the reference's rest
    backend default): request ``{"input": [texts...]}`` (+ ``extra``
    merged in, e.g. ``{"model": ...}``); response
    ``{"data": [{"embedding": [...]}, ...]}`` in input order.
    """

    def __init__(
        self,
        transport,
        dim: int,
        max_batch: int = 128,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        extra: dict | None = None,
        sleep=None,
    ):
        if transport is None:
            raise ValueError(
                "RestEmbedder needs a transport callable "
                "(payload dict -> decoded-JSON dict); this sandbox has no "
                "network, so none is provided by default"
            )
        self.transport = transport
        self.dim = dim
        self.max_batch = max_batch
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.extra = dict(extra or {})
        import time

        self._sleep = sleep if sleep is not None else time.sleep

    def _call_once(self, payload: dict) -> dict:
        attempt = 0
        while True:
            try:
                return self.transport(payload)
            except RetryableEmbedderError:
                if attempt >= self.max_retries:
                    raise
                self._sleep(self.backoff_s * (2 ** attempt))
                attempt += 1

    # -- per-service request/response shapes, overridable hooks ----------
    def build_payload(self, chunk: list) -> dict:
        """Request body for one batch (OpenAI-compatible default)."""
        return {"input": list(chunk), **self.extra}

    def parse_response(self, resp: dict, n: int) -> list:
        """Decoded-JSON response -> ``n`` embedding rows in INPUT order.
        Raise ``ValueError`` on any shape mismatch — a response the
        adapter half-understands must never become silent zero vectors."""
        data = resp.get("data")
        if data is None or len(data) != n:
            raise ValueError(
                f"embedder response shape mismatch: expected {n} rows, "
                f"got {None if data is None else len(data)}"
            )
        return [row["embedding"] for row in data]

    def __call__(self, texts: list) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for start in range(0, len(texts), self.max_batch):
            chunk = texts[start : start + self.max_batch]
            resp = self._call_once(self.build_payload(list(chunk)))
            rows = self.parse_response(resp, len(chunk))
            for i, row in enumerate(rows):
                vec = np.asarray(row, dtype=np.float64)
                if vec.shape != (self.dim,):
                    raise ValueError(
                        f"embedding dim mismatch: expected {self.dim}, "
                        f"got {vec.shape}"
                    )
                out[start + i] = vec
        return out


class OpenAIEmbedder(RestEmbedder):
    """OpenAI embeddings API shape (reference ``src/vector/openai.rs``):
    request ``{"model": ..., "input": [texts...]}`` (+ optional
    ``dimensions`` for Matryoshka truncation); response rows carry an
    ``index`` and are NOT guaranteed to arrive in input order — the
    adapter reorders by index and rejects duplicate/missing indices."""

    def __init__(self, transport, dim: int, model: str,
                 dimensions: int | None = None, **kw):
        extra = {"model": model}
        if dimensions is not None:
            extra["dimensions"] = dimensions
        super().__init__(transport, dim, extra=extra, **kw)

    def parse_response(self, resp: dict, n: int) -> list:
        data = resp.get("data")
        if data is None or len(data) != n:
            raise ValueError(
                f"openai response shape mismatch: expected {n} rows, "
                f"got {None if data is None else len(data)}"
            )
        rows: list = [None] * n
        for item in data:
            i = item.get("index")
            if not isinstance(i, int) or not (0 <= i < n) or rows[i] is not None:
                raise ValueError(f"openai response index invalid: {i!r}")
            rows[i] = item["embedding"]
        return rows


class OllamaEmbedder(RestEmbedder):
    """Ollama ``/api/embed`` shape (reference ``src/vector/ollama.rs``):
    request ``{"model": ..., "input": [texts...]}``; response
    ``{"embeddings": [[...], ...]}`` in input order."""

    def __init__(self, transport, dim: int, model: str, **kw):
        super().__init__(transport, dim, extra={"model": model}, **kw)

    def parse_response(self, resp: dict, n: int) -> list:
        rows = resp.get("embeddings")
        if rows is None or len(rows) != n:
            raise ValueError(
                f"ollama response shape mismatch: expected {n} rows, "
                f"got {None if rows is None else len(rows)}"
            )
        return rows


class HFEmbedder(RestEmbedder):
    """HuggingFace text-embeddings-inference shape (reference
    ``src/vector/hf.rs`` embeds locally via candle; the served analogue
    is TEI's ``/embed``): request ``{"inputs": [texts...]}`` (+ extra,
    e.g. ``{"truncate": true}``); response is a bare JSON array of
    embedding rows in input order — the transport must wrap it as
    ``{"embeddings": rows}`` or return the list itself (both accepted)."""

    def build_payload(self, chunk: list) -> dict:
        return {"inputs": list(chunk), **self.extra}

    def parse_response(self, resp, n: int) -> list:
        rows = resp if isinstance(resp, list) else resp.get("embeddings")
        if rows is None or len(rows) != n:
            raise ValueError(
                f"hf response shape mismatch: expected {n} rows, "
                f"got {None if rows is None else len(rows)}"
            )
        return rows
