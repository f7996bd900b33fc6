"""Automatic prefix caching: content-addressed sharing of prompt KV pages.

No reference analogue (the reference re-prefills the whole concatenated
history every round, src/models/llama/llama.cpp:363-449 MakeHistory); this
is the vLLM-style "automatic prefix caching" layer over the paged KV cache
(ops/paged_kvcache.py), the memory/TTFT win for serving workloads with
shared system prompts or multi-turn chats:

- Every FULL page of a prompt gets a chain hash (the hash covers all tokens
  from position 0, so equal hashes ⇔ equal full prefixes — a page is only
  reusable under the exact same history).
- At admission the scheduler looks up the longest run of already-cached
  pages, maps them into the request's page table READ-ONLY, and prefills
  only the suffix (models/llama.forward(paged_history=True) writes fresh
  pages at the block offset and attends over the shared history).
- Pages stay in the store after their requests retire (refcount 0) and are
  evicted LRU only under pool pressure — cache-as-much-as-memory-allows.

The page containing a prompt's LAST token is never reused: at least one
token must be recomputed to produce the first-token logits.

Collision safety: 128-bit blake2b over the exact token bytes — content
hashing, not Python hash(), so a collision is cryptographically negligible
rather than a silent wrong-output risk.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Dict, List, Sequence

import numpy as np


def chunk_hashes(tokens: Sequence[int], page_size: int,
                 salt: int = 0) -> List[bytes]:
    """Chain hash per full prompt page, excluding the last token's page.
    `salt` partitions the key space — e.g. the LoRA adapter slot: an
    adapter changes the K/V content of identical prompt tokens, so pages
    must never be shared across adapters."""
    aligned = ((len(tokens) - 1) // page_size) * page_size
    out: List[bytes] = []
    h = salt.to_bytes(4, "little", signed=False) if salt else b""
    for i in range(0, aligned, page_size):
        chunk = np.asarray(tokens[i:i + page_size], np.int32).tobytes()
        h = hashlib.blake2b(h + chunk, digest_size=16).digest()
        out.append(h)
    return out


class PrefixStore:
    """Hash → page-id map with per-page request refcounts and LRU eviction.

    A page is in exactly one of three places: the allocator's free list,
    privately owned by a slot, or registered here. Registered pages with
    refcount 0 are reclaimable (evict() → back to the allocator)."""

    def __init__(self) -> None:
        self._by_hash: "OrderedDict[bytes, int]" = OrderedDict()  # LRU order
        self._hash_of: Dict[int, bytes] = {}
        self._refs: Dict[int, int] = {}
        self.hit_tokens = 0
        self.miss_tokens = 0

    def __len__(self) -> int:
        return len(self._by_hash)

    def owns(self, page: int) -> bool:
        return int(page) in self._hash_of

    def lookup(self, hashes: Sequence[bytes], page_size: int) -> List[int]:
        """Longest run of cached pages for this hash chain; increfs each
        returned page (caller owns one reference until release())."""
        pages: List[int] = []
        for h in hashes:
            p = self._by_hash.get(h)
            if p is None:
                break
            self._by_hash.move_to_end(h)
            self._refs[p] += 1
            pages.append(p)
        self.hit_tokens += len(pages) * page_size
        self.miss_tokens += (len(hashes) - len(pages)) * page_size
        return pages

    def insert(self, h: bytes, page: int) -> bool:
        """Register a freshly prefilled page under its chain hash. Returns
        False (no ownership transfer) when the hash is already present —
        e.g. two identical prompts admitted concurrently; the second
        request's page stays private and is freed at its retirement."""
        page = int(page)
        if h in self._by_hash:
            return False
        self._by_hash[h] = page
        self._hash_of[page] = h
        self._refs[page] = self._refs.get(page, 0) + 1
        return True

    def release(self, page: int) -> None:
        """Drop one request reference (page stays cached for reuse)."""
        self._refs[int(page)] -= 1
        assert self._refs[int(page)] >= 0

    def evict(self, want: int) -> List[int]:
        """Pop up to `want` least-recently-used unreferenced pages; the
        caller returns them to the allocator."""
        victims: List[int] = []
        for h, p in list(self._by_hash.items()):
            if len(victims) >= want:
                break
            if self._refs.get(p, 0) == 0:
                del self._by_hash[h]
                del self._hash_of[p]
                del self._refs[p]
                victims.append(p)
        return victims
