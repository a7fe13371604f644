"""C6 — the pairwise query interleaver (reference:
``calc/QueryParDivider.scala:6-42``). DEAD CODE in the reference —
``listOfListsQuery`` is never invoked by ``CalcLogic`` — implemented
here anyway to close the last §2.3 coverage row, and wired as an
OPT-IN scheduling strategy instead of dead weight: ``CalcEngine.run``
executes each emitted batch's queries concurrently when handed these
batches.

Semantics mirrored from the Scala: queries are grouped per query_id
into FIFO queues; while ≥ 2 queues are non-empty, one query is
dequeued from each of two queues to form a 2-element batch; once a
single queue remains, it drains as 1-element batches. Deviation
(documented): the Scala picks the "first two" keys of an UNORDERED
``Map`` — nondeterministic for > 4 keys on the JVM; this
implementation picks the two smallest non-empty query_ids so batch
composition is reproducible.
"""

from __future__ import annotations

from collections import deque
from typing import Sequence, TypeVar

Q = TypeVar("Q")


def pairwise_batches(queries: Sequence[Q], key=lambda q: q.query_id) -> list[list[Q]]:
    """Split ``queries`` into the reference's interleaved batches:
    2-element batches drawn from two distinct query_id queues while
    possible, then 1-element batches from the last remaining queue.
    Order within a queue is the input order (FIFO), like the Scala
    ``mutable.Queue``."""
    queues: dict = {}
    for q in queries:
        queues.setdefault(key(q), deque()).append(q)
    out: list[list[Q]] = []
    while any(queues.values()):
        live = sorted(k for k, v in queues.items() if v)
        if len(live) == 1:
            out.append([queues[live[0]].popleft()])
        else:
            k1, k2 = live[0], live[1]
            out.append([queues[k1].popleft(), queues[k2].popleft()])
    return out
