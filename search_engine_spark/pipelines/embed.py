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
) -> DataFrame:
    """Attach an ``array<double>`` embedding column to each document.

    ``embedder``: any callable ``list[str] -> np.ndarray (n, dim)``; one
    instance is pickled into the UDF closure and reused for every Arrow
    batch on an executor (model-weight lifecycle). Defaults to
    :class:`HashedBowEmbedder`.

    Scale shape: embarrassingly parallel map — no shuffle, input pruned to
    (id, text); output partitioning inherited, so a downstream
    ``.write.parquet`` streams without an exchange.
    """
    if embedder is None:
        embedder = HashedBowEmbedder(dim)
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches):
        for pdf in batches:
            vecs = embedder(pdf[text_col].fillna("").tolist())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: list(vecs),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, {out_col} array<double>"
    )
