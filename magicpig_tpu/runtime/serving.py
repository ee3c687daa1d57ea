"""Continuous-batching serving loop over the engine's request slots.

The reference batches statically: B sequential prefills then a fixed batched
decode loop (`examples/batch_generation.py:43-59`). This scheduler makes the
batch continuous: requests join a free slot whenever one opens (prefill into
slot i touches only slot i's state), every decode step advances all live
slots together, and finished requests free their slot immediately — the
serving pattern the reference lists as future work (README roadmap) and the
natural fit for the engine's per-request `request_id` state layout
(reference `models/attnserver.py:112-117`).

Two admission modes:
  * `interleave=False` (default): admission is synchronous — a long prefill
    stalls the live slots' decode for its duration, but costs no extra HBM.
  * `interleave=True`: admission is chunked — each `step()` runs ONE
    prompt chunk of the in-flight request (`LLM.start_prefill`), then the
    batched decode, so live decodes stall by at most chunk_size tokens of
    prefill work per step. Costs one full-prefix K/V staging buffer
    (~2*L*S*Hkv*d bytes, one extra request's worth of K/V): the LSH
    estimator state needs the completed, mean-centered prompt keys, so the
    fills run once from staging after the last chunk.

Prefill graphs are compiled per padded prompt length (one fixed-shape
chunk graph in interleaved mode); padding rounds to `chunk_size`, so at
most max_length/chunk_size graphs exist.
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

    def __init__(self, llm, interleave: bool = False):
        self.llm = llm
        self.interleave = interleave
        self.free = deque(range(llm.batch_size))
        self.active: dict[int, Request] = {}   # slot -> request
        self.queue: deque[Request] = deque()
        self.finished: list[Request] = []
        self._uid = 0
        self._next_tokens = np.zeros((llm.batch_size,), np.int32)
        self._inflight: tuple[Request, object] | None = None

    @property
    def pending(self) -> bool:
        return bool(self.queue or self.active or self._inflight)

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

    def _admit_one_chunk(self):
        """Interleaved admission: at most one chunk of prefill work.

        The in-flight slot is neither free nor active while its chunks run;
        the batched decode still passes over it (stale state), which is safe
        because `_fill_from_staging_fn` overwrites the slot's caches and
        lengths absolutely — the same invariant `_retire` documents.
        """
        if self._inflight is None and self.queue and self.free:
            slot = self.free.popleft()
            req = self.queue.popleft()
            req.slot = slot
            self._inflight = (req, self.llm.start_prefill(req.prompt, slot))
        if self._inflight is not None:
            req, cp = self._inflight
            logits = cp.step()
            if logits is not None:
                tok = int(np.asarray(logits)[0].argmax())
                req.generated.append(tok)
                self._next_tokens[req.slot] = tok
                self.active[req.slot] = req
                self._inflight = None

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
        if self.interleave:
            self._admit_one_chunk()
        else:
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
