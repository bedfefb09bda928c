"""Text-analysis operators for training-data pipelines (documents table).

These are the large-scale additions beyond the reference's operator set
(task brief): language-ID, quality scoring, token counting, fingerprinting.
All per-batch, shuffle-free.  Pattern-compiling stages are callable CLASSES
so ``map_batches(Cls, concurrency=N)`` builds the state once per actor
(reference analog: the per-worker client singleton,
ExtractionPipelineBuilder.scala:31-42).

Counts are emitted as integers (exactly reproducible in SQL oracles);
derived ratios use integer milli-units to stay hash-stable across engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# token = letters | digits | single other non-space (BPE-ish pre-tokenizer)
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WORD_PATTERN = r"\S+"
PUNCT_PATTERN = r"[.!?,;:]"

#: tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "los", "una"],
    "fr": ["le", "la", "et", "les", "des", "une", "est"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}
#: deterministic tie-break: first language in this order wins ties
LANG_ORDER = ["de", "en", "es", "fr", "zh"]


class TextStats:
    """Actor-pool form: regexes compiled once per actor (__init__), applied
    per batch (__call__) — use with map_batches(TextStats, concurrency=N)."""

    def __init__(self, column: str = "text"):
        import re

        self.column = column
        self.word = re.compile(WORD_PATTERN)
        self.token = re.compile(TOKEN_PATTERN)
        self.punct = re.compile(PUNCT_PATTERN)
        self.stop_en = set(LANG_STOPWORDS["en"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        n_words = np.empty(len(texts), np.int64)
        n_tokens = np.empty(len(texts), np.int64)
        n_punct = np.empty(len(texts), np.int64)
        n_stop = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            words = self.word.findall(t)
            n_words[i] = len(words)
            n_tokens[i] = len(self.token.findall(t))
            n_punct[i] = len(self.punct.findall(t))
            n_stop[i] = sum(1 for w in words if w.lower() in self.stop_en)
        out = batch.append_column("n_chars", pc.cast(pc.utf8_length(batch.column(self.column)), pa.int64()))
        out = out.append_column("n_words", pa.array(n_words))
        out = out.append_column("n_tokens", pa.array(n_tokens))
        out = out.append_column("n_punct", pa.array(n_punct))
        out = out.append_column("n_stop", pa.array(n_stop))
        # quality score in integer milli-units: 1000*stopwords/words (0 if empty)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.where(n_words > 0, (1000 * n_stop) // np.maximum(n_words, 1), 0)
        return out.append_column("quality_milli", pa.array(q.astype(np.int64)))


class LangId:
    """Stopword-hit language heuristic: tokenize on whitespace, count hits
    against each language's stopword set, argmax with deterministic
    tie-break by LANG_ORDER.  Word sets are built once per actor.  Semantics
    chosen to be exactly reproducible in SQL (list_filter + list_contains),
    so the DuckDB oracle can check it bit-for-bit."""

    def __init__(self, column: str = "text"):
        self.column = column
        self.sets = {lang: frozenset(w) for lang, w in LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        preds = []
        for t in texts:
            words = (t or "").lower().split()
            best_lang, best_n = None, -1
            for lang in LANG_ORDER:
                s = self.sets[lang]
                n = sum(1 for w in words if w in s)
                if n > best_n:
                    best_lang, best_n = lang, n
            preds.append(best_lang)
        return batch.append_column("pred_lang", pa.array(preds, type=pa.string()))


def md5_fingerprint(batch: pa.Table, column: str = "text", out: str = "fp_md5") -> pa.Table:
    """Content fingerprint = hex md5 of the text (matches SQL md5())."""
    vals = batch.column(column).to_pylist()
    fps = [hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals]
    return batch.append_column(out, pa.array(fps, type=pa.string()))


def rolling_fingerprint(
    batch: pa.Table, column: str = "text", out: str = "fp_roll", window: int = 16
) -> pa.Table:
    """Rabin-Karp-style rolling-hash document fingerprint: min of the rolling
    polynomial hashes over ``window``-byte windows (robust to concatenation;
    not SQL-expressible → rows-only oracle)."""
    B, M = np.uint64(257), np.uint64((1 << 31) - 1)  # Mersenne-31: no uint64 wrap
    out_vals = np.empty(batch.num_rows, np.int64)
    texts = batch.column(column).to_pylist()
    for i, t in enumerate(texts):
        data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(data) < window:
            h = np.uint64(0)
            for b in data:
                h = (h * B + b) % M
            out_vals[i] = int(h)
            continue
        # vectorized rolling hash via cumulative powers
        n = len(data)
        pows = np.empty(window, np.uint64)
        pows[0] = 1
        for j in range(1, window):
            pows[j] = (pows[j - 1] * B) % M
        # windows as strided matrix-free: hash_k = sum(data[k+j]*B^(w-1-j)) mod M
        acc = np.zeros(n - window + 1, np.uint64)
        for j in range(window):
            acc = (acc + data[j : n - window + 1 + j] * pows[window - 1 - j]) % M
        out_vals[i] = int(acc.min())
    return batch.append_column(out, pa.array(out_vals, type=pa.int64()))
