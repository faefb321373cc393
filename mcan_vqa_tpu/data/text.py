"""Question text processing: cleaning, vocabulary building, index encoding.

Pure functions over Python/NumPy; nothing here touches a device. The cleaning
regex and PAD/UNK vocabulary layout follow the reference semantics
(reference: core/data/data_utils.py:53-82,133-151) so vocabularies and
question-index tensors are bit-identical with the reference pipeline.

GloVe embedding lookup (spaCy ``en_core_web_lg``) is isolated behind
``build_vocab(..., glove_lookup=...)`` and the built ``(token_to_ix, emb)``
pair is cached to disk (``save_vocab``/``load_vocab``) so TPU training jobs
never need spaCy at runtime.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

PAD_TOKEN = "PAD"
UNK_TOKEN = "UNK"
PAD_IX = 0
UNK_IX = 1

# Strip sentence punctuation, split hyphen/slash compounds into words
# (reference: core/data/data_utils.py:68-72).
_CLEAN_RE = re.compile(r"([.,'!?\"()*#:;])")


def clean_question(text: str) -> List[str]:
    """Lowercase, strip punctuation, split '-'/'/' compounds, whitespace-split."""
    return (
        _CLEAN_RE.sub("", text.lower())
        .replace("-", " ")
        .replace("/", " ")
        .split()
    )


def build_vocab(
    questions: Iterable[str],
    glove_lookup: Optional[Callable[[str], np.ndarray]] = None,
    embed_dim: int = 300,
) -> Tuple[Dict[str, int], np.ndarray]:
    """Build {token: index} in corpus insertion order, PAD=0 / UNK=1 first.

    ``glove_lookup`` maps a token to its 300-d vector (e.g. a spaCy pipeline's
    ``lambda w: nlp(w).vector``). When None, embeddings are deterministic
    seeded Gaussians so the rest of the stack works without spaCy.
    """
    token_to_ix: Dict[str, int] = {PAD_TOKEN: PAD_IX, UNK_TOKEN: UNK_IX}
    vectors: List[np.ndarray] = []

    def embed(word: str) -> np.ndarray:
        if glove_lookup is not None:
            return np.asarray(glove_lookup(word), dtype=np.float32)
        # Deterministic per-token fallback. NOTE: not Python hash() — that is
        # salted per process (PYTHONHASHSEED) and would make fallback
        # embeddings differ across runs.
        import hashlib
        seed = int.from_bytes(
            hashlib.md5(word.encode()).digest()[:4], "little")
        return np.random.default_rng(seed).normal(0, 1, embed_dim).astype(np.float32)

    vectors.append(embed(PAD_TOKEN))
    vectors.append(embed(UNK_TOKEN))

    for q in questions:
        for word in clean_question(q):
            if word not in token_to_ix:
                token_to_ix[word] = len(token_to_ix)
                vectors.append(embed(word))

    return token_to_ix, np.stack(vectors).astype(np.float32)


def encode_question(
    text: str, token_to_ix: Dict[str, int], max_token: int
) -> np.ndarray:
    """Encode a question into a fixed-length int32 index vector.

    Unknown words map to UNK, the tail is PAD (reference semantics:
    core/data/data_utils.py:133-151). int32 — TPU-native index dtype.
    """
    ques_ix = np.zeros(max_token, dtype=np.int32)
    for ix, word in enumerate(clean_question(text)):
        if ix == max_token:
            break
        ques_ix[ix] = token_to_ix.get(word, UNK_IX)
    return ques_ix


def encode_questions(
    texts: Iterable[str], token_to_ix: Dict[str, int], max_token: int
) -> np.ndarray:
    """Vectorized batch encode -> [N, max_token] int32."""
    return np.stack([encode_question(t, token_to_ix, max_token) for t in texts])


# ---------------------------------------------------------------------------
# Vocab cache: TPU jobs load this instead of running spaCy at startup.
# ---------------------------------------------------------------------------

def vocab_cache_file(path: str) -> str:
    """Canonical on-disk name for a vocab cache path. np.savez appends
    '.npz' to suffix-less paths, so save and the caller's exists-check
    must normalize the same way — otherwise a '--vocab_cache_path
    ./cache/vocab' silently rebuilds (and re-runs spaCy) every run."""
    return path if path.endswith(".npz") else path + ".npz"


def save_vocab(path: str, token_to_ix: Dict[str, int], emb: np.ndarray,
               meta: Optional[dict] = None) -> None:
    """meta: optional JSON-able provenance dict (e.g. which question
    files and embedding source built this vocab) — the cache-staleness
    check reads it back via load_vocab_meta."""
    import json
    tokens = sorted(token_to_ix, key=token_to_ix.get)
    np.savez_compressed(vocab_cache_file(path),
                        tokens=np.array(tokens, dtype=object), emb=emb,
                        meta=json.dumps(meta) if meta is not None else "")


def load_vocab(path: str) -> Tuple[Dict[str, int], np.ndarray]:
    z = np.load(vocab_cache_file(path), allow_pickle=True)
    tokens = list(z["tokens"])
    return {t: i for i, t in enumerate(tokens)}, z["emb"].astype(np.float32)


def load_vocab_meta(path: str) -> Optional[dict]:
    """Provenance dict stored by save_vocab (None for caches written
    before meta existed, or saved without one)."""
    import json
    z = np.load(vocab_cache_file(path), allow_pickle=True)
    if "meta" not in z.files:
        return None
    raw = str(z["meta"])
    return json.loads(raw) if raw else None


def spacy_glove_lookup():
    """Return a GloVe lookup backed by spaCy en_core_web_lg, or None if
    absent — with a WARNING: callers substitute deterministic random
    embeddings on None, and a silent fallback would let a use_glove=True
    training run complete with materially worse question embeddings and
    nothing in the logs to distinguish it from a real GloVe run."""
    try:
        import spacy  # noqa: deferred heavy import

        nlp = spacy.load("en_core_web_lg")
        return lambda word: nlp(word).vector
    except Exception as e:
        import warnings
        warnings.warn(
            f"spaCy GloVe lookup unavailable ({e!r}): use_glove falls "
            f"back to deterministic random embeddings — install spaCy + "
            f"en_core_web_lg for reference-parity embeddings")
        return None
