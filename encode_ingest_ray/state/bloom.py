"""Vectorized Bloom filter — the crawl frontier's beyond-driver-RAM mode.

Reference analog: the extraction crawl dedups reachable entities via id
sets (ExtractionPipelineBuilder.scala:90-91); at 10^10 entities an exact
set outgrows the driver, and the classic crawler answer is a Bloom filter:
O(bits) memory, zero false negatives, tunable false-positive rate (a FP
means an id is treated as already-seen — bounded under-crawl, never
duplicate fetches).

Double hashing (Kirsch-Mitzenmatcher 2006): k positions derive from two
independent 64-bit halves of one blake2b digest, so membership tests are
pure numpy over the whole id batch.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


def _hash_pairs(values) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 arrays — one blake2b(16B) per value, split in half."""
    h1 = np.empty(len(values), np.uint64)
    h2 = np.empty(len(values), np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1  # odd → full-period stride
    return h1, h2


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        n_bits = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.n_bits = n_bits
        self.k = max(1, round(n_bits / capacity * math.log(2)))
        self.bits = np.zeros((n_bits + 63) // 64, np.uint64)

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # (len(values), k) bit positions via double hashing
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add_many(self, values) -> None:
        if not len(values):
            return
        pos = self._positions(*_hash_pairs(values)).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_many(self, values) -> np.ndarray:
        """bool array; no false negatives, FPs at ~the configured rate."""
        if not len(values):
            return np.zeros(0, bool)
        pos = self._positions(*_hash_pairs(values))
        words = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hits = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return hits.all(axis=1)

    # -- broadcast support: workers rebuild a read-only view from the state
    def state(self) -> dict:
        return {"n_bits": self.n_bits, "k": self.k, "bits": self.bits}

    @classmethod
    def from_state(cls, state: dict) -> "BloomFilter":
        bf = cls.__new__(cls)
        bf.n_bits = state["n_bits"]
        bf.k = state["k"]
        bf.bits = state["bits"]
        return bf
