"""Sentence-embedding provider for the "sbert" variants.

The reference embeds texts with the frozen MiniLM sentence transformer inside
every forward (vae-gan.py:106-116); only the 384->64 projection trains. Here
embeddings are precomputed in the input pipeline (SURVEY.md §7 hard-part 6):

* ``SbertEmbedder`` wraps sentence-transformers when the model is available
  locally (no network egress is assumed — a missing/uncached model raises and
  callers fall back);
* ``hash_embed`` is the offline fallback: a deterministic pseudo-embedding
  keyed by the text hash. It preserves the pipeline contract (distinct texts
  -> distinct frozen vectors; identical text -> identical vector) so training
  and tests run without the HF model; swap in SbertEmbedder for real runs.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List

import numpy as np

SBERT_MODEL_NAME = (
    "sentence-transformers/paraphrase-multilingual-MiniLM-L12-v2")


def hash_embed(texts: Iterable[str], dim: int = 384) -> np.ndarray:
    out = []
    for text in texts:
        digest = hashlib.sha256(text.encode("utf-8")).digest()
        seed = int.from_bytes(digest[:8], "little") % (2 ** 32)
        out.append(np.random.default_rng(seed).normal(0, 1, dim))
    return np.asarray(out, np.float32)


class SbertEmbedder:
    """Real MiniLM embeddings (requires a locally cached model)."""

    def __init__(self, model_name: str = SBERT_MODEL_NAME,
                 device: str = "cpu"):
        from sentence_transformers import SentenceTransformer
        self.model = SentenceTransformer(model_name, device=device)
        self.dim = self.model.get_sentence_embedding_dimension()

    def __call__(self, texts: List[str]) -> np.ndarray:
        return np.asarray(
            self.model.encode(list(texts), convert_to_numpy=True),
            np.float32)


def make_text_embedder(prefer_sbert: bool = True,
                       require_sbert: bool = False):
    """Best-available embedder: SBERT if cached locally, else hash fallback.

    ``require_sbert=True`` turns a missing/uncached MiniLM into a loud
    RuntimeError instead of a silent hash_embed fallback — serving or
    evaluating an sbert-variant checkpoint on pseudo-embeddings it was not
    trained with would quietly produce garbage (the serve/eval CLIs pass
    this unless ``--allow-hash-embed`` is given).
    """
    if prefer_sbert:
        try:
            return SbertEmbedder()
        except Exception as e:
            if require_sbert:
                raise RuntimeError(
                    f"SBERT model '{SBERT_MODEL_NAME}' is unavailable "
                    f"({type(e).__name__}: {e}). Refusing to fall back to "
                    f"hash_embed: an sbert-variant checkpoint served on "
                    f"pseudo-embeddings generates garbage. Install/cache "
                    f"the sentence-transformers model, or pass "
                    f"--allow-hash-embed to accept the fallback "
                    f"explicitly.") from e
            import sys
            print(f"[text_embed] WARNING: SBERT unavailable "
                  f"({type(e).__name__}); using deterministic hash_embed "
                  f"fallback", file=sys.stderr)
    return lambda texts: hash_embed(texts)
