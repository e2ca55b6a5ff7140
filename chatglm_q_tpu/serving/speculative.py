"""Prompt-lookup speculative decoding (n-gram drafting, greedy-exact).

Autoregressive decode reads every weight byte per token; if several future
tokens can be guessed, ONE chunked forward verifies them all — the guessed
tokens then cost a prefill-shaped step (weights streamed once) instead of
k decode steps.  Drafts come from the sequence itself: the last ``ngram``
tokens are searched in the prompt + generation history and the tokens that
followed their previous occurrence become the draft ("prompt lookup
decoding" — no draft model, no extra memory).  Summarization, code editing
and retrieval-style chats repeat long spans, where this routinely accepts
multi-token jumps; worst case costs one extra verification row.

Verification is exact for greedy decoding: position i of the chunk gives
the model's argmax after ``context + draft[:i]``; the accepted prefix is
identical to what step-by-step greedy would have produced, and the first
rejected position's own argmax is exactly the token greedy would emit —
so acceptance never changes the output, only the number of device steps
(tests/test_speculative.py asserts token-for-token equality).

The KV written for rejected draft positions sits above the rolled-back
length and is overwritten by later steps — the same invalidation rule the
serving engine's over-generation rollback uses (engine.py step()).
"""
from __future__ import annotations

from typing import Optional, Sequence


def find_draft(history: Sequence[int], ngram: int = 3, k: int = 8,
               min_ngram: int = 1) -> Optional[list]:
    """Draft the ``k`` tokens that followed the most recent earlier
    occurrence of the longest matching tail n-gram (tries ``ngram`` down
    to ``min_ngram``).  Returns None when no n-gram recurs."""
    n = len(history)
    for g in range(min(ngram, n - 1), min_ngram - 1, -1):
        tail = tuple(history[n - g:])
        # most recent earlier occurrence wins (locality: repeated spans
        # tend to continue like their nearest repetition)
        for s in range(n - g - 1, -1, -1):
            if tuple(history[s : s + g]) == tail:
                nxt = history[s + g : s + g + k]
                if nxt:
                    return list(nxt)
                break
    return None


def greedy_accept(draft: Sequence[int], row_argmax: Sequence[int]) -> int:
    """Longest accepted prefix: row i's argmax is the model's next token
    after the context + draft[:i]; draft[i] survives iff it equals
    row_argmax[i-1] ... expressed here with rows aligned so that
    ``row_argmax[i]`` judges ``draft[i]``.  Returns the accept count."""
    a = 0
    while a < len(draft) and row_argmax[a] == draft[a]:
        a += 1
    return a
