"""Continuous-batching serving loop over the engine's request slots.

The reference batches statically: B sequential prefills then a fixed batched
decode loop (`examples/batch_generation.py:43-59`). This scheduler makes the
batch continuous: requests join a free slot whenever one opens (prefill into
slot i touches only slot i's state), every decode step advances all live
slots together, and finished requests free their slot immediately — the
serving pattern the reference lists as future work (README roadmap) and the
natural fit for the engine's per-request `request_id` state layout
(reference `models/attnserver.py:112-117`).

Design limits (same as the reference's own serving story):
  * Admission is synchronous: a long prefill stalls the live slots' decode
    for its duration. Interleaving prefill chunks with decode steps would
    require a full-prefix K/V staging buffer per layer for the in-flight
    request (the LSH signatures need the completed, mean-centered K), i.e.
    one extra request's worth of HBM — a deliberate capacity/latency
    trade-off left to a future round.
  * Prefill graphs are compiled per padded prompt length; padding rounds to
    `chunk_size`, so at most max_length/chunk_size graphs exist.
"""

from __future__ import annotations

import dataclasses
from collections import deque

import numpy as np


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray
    max_tokens: int
    generated: list = dataclasses.field(default_factory=list)
    slot: int | None = None

    @property
    def done(self) -> bool:
        return len(self.generated) >= self.max_tokens or (
            bool(self.generated) and self.generated[-1] is None)


class Scheduler:
    """Continuous batching over an `LLM` engine's slots.

    Usage:
        s = Scheduler(llm)
        s.submit(prompt_ids, max_tokens=64)
        while s.pending:
            finished = s.step()
    """

    def __init__(self, llm):
        self.llm = llm
        self.free = deque(range(llm.batch_size))
        self.active: dict[int, Request] = {}   # slot -> request
        self.queue: deque[Request] = deque()
        self.finished: list[Request] = []
        self._uid = 0
        self._next_tokens = np.zeros((llm.batch_size,), np.int32)

    @property
    def pending(self) -> bool:
        return bool(self.queue or self.active)

    def submit(self, prompt, max_tokens: int = 64) -> int:
        from magicpig_tpu.runtime import state as state_lib

        lsh = self.llm.lsh
        budget = (state_lib.hot_capacity(lsh) - lsh.num_sink_tokens
                  - lsh.num_local_tokens)
        if lsh.enabled and max_tokens > budget:
            raise ValueError(f"max_tokens={max_tokens} exceeds the "
                             f"generation buffer ({budget} tokens)")
        self._uid += 1
        req = Request(self._uid, np.asarray(prompt, np.int32).reshape(-1),
                      max_tokens)
        self.queue.append(req)
        return self._uid

    def _admit(self):
        """Prefill queued requests into free slots (continuous admission)."""
        while self.queue and self.free:
            slot = self.free.popleft()
            req = self.queue.popleft()
            req.slot = slot
            logits = self.llm.prefill(req.prompt, request_id=slot)
            tok = int(np.asarray(logits)[0].argmax())
            req.generated.append(tok)
            self._next_tokens[slot] = tok
            self.active[slot] = req

    def _retire(self, req: Request, slot: int):
        self.active.pop(slot)
        self.free.append(slot)
        self.finished.append(req)
        # Free this slot's lengths so a future request reuses it.
        #
        # Invariant: the batched decode step still runs over free slots with
        # stale tokens, so their pos/hot_len advance from 0 and garbage rows
        # are written into their caches — this is safe ONLY because
        # `fill_dense_layer`/`fill_sparse_layer` fully overwrite a slot's
        # cache region and lengths on re-admission. Do not add fill paths
        # that merge into existing slot state.
        self.llm.release_slot(slot)

    def step(self) -> list[Request]:
        """Admit + one batched greedy decode step; returns newly finished."""
        self._admit()
        if not self.active:
            return []
        logits = self.llm.inference(self._next_tokens)
        arr = np.asarray(logits)
        newly_done = []
        for slot, req in list(self.active.items()):
            tok = int(arr[slot].argmax())
            req.generated.append(tok)
            self._next_tokens[slot] = tok
            if (len(req.generated) >= req.max_tokens
                    or tok in self.llm.config.eos_token_ids):
                newly_done.append(req)
                self._retire(req, slot)
        return newly_done

    def run(self) -> list[Request]:
        """Drain everything; returns all finished requests in finish order."""
        while self.pending:
            self.step()
        return self.finished
