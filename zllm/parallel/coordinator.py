"""Multi-host continuous-batching schedule coordinator.

The reference's RPC backend ships tensors to workers over a socket
protocol (ggml/src/ggml-rpc/ggml-rpc.cpp); the TPU-native replacement
keeps every process running the SAME jitted sharded step and only ships
the *schedule*: rank 0 (the only process with the HTTP front-end and the
slot state machine) broadcasts one fixed-shape message per engine step —
(op, kind, tokens, positions) — and every follower replays the identical
ubatch, so the global mesh's collectives stay in lockstep and each
process's KV shard evolves identically.  This is SURVEY hard part #4: the
schedule is the only cross-host coordination continuous batching needs,
because all other state (weights, KV) is device-resident and deterministic
given the schedule.

Wire format (fixed shapes -> one jax.experimental.multihost_utils
broadcast, no re-compilation): header int32[4] = (op, kind, width,
logits_all), tokens int32[n_slots, chunk], positions int32[n_slots, chunk].
"""

from __future__ import annotations

import numpy as np

OP_STEP = 0
OP_STOP = 1

KIND_DECODE = 0  # [n_slots, 1] step, logits_for="last"
KIND_MIXED = 1  # [n_slots, chunk] mixed prefill+decode step, logits_for="all"


class StepCoordinator:
    """Per-step schedule broadcast from process 0 to all processes.

    On a single process this degenerates to a pass-through (broadcast of a
    fully-addressable array is the identity), so the coordinated engine
    path is testable without a multi-process launch."""

    def __init__(self, n_slots: int, chunk: int):
        import jax

        self.n_slots = int(n_slots)
        self.chunk = int(chunk)
        self.n_processes = jax.process_count()
        self.is_leader = jax.process_index() == 0

    # -- serialization (unit-testable without any broadcast) ---------------
    def pack(self, op: int, kind: int, toks: np.ndarray, pos: np.ndarray):
        """-> (header int32[4], toks int32[S, C], pos int32[S, C]); token /
        position grids are zero-padded to the fixed wire width."""
        width = 0 if op == OP_STOP else int(toks.shape[1])
        assert width <= self.chunk, (width, self.chunk)
        wt = np.zeros((self.n_slots, self.chunk), np.int32)
        wp = np.zeros((self.n_slots, self.chunk), np.int32)
        if width:
            wt[:, :width] = toks
            wp[:, :width] = pos
        hdr = np.asarray(
            [op, kind, width, 1 if kind == KIND_MIXED else 0], np.int32)
        return hdr, wt, wp

    def unpack(self, hdr, wt, wp):
        op, kind, width, logits_all = (int(v) for v in np.asarray(hdr))
        if op == OP_STOP:
            return op, kind, None, None
        toks = np.asarray(wt)[:, :width]
        pos = np.asarray(wp)[:, :width]
        return op, kind, toks, pos

    # -- transport ----------------------------------------------------------
    def _broadcast(self, tree):
        if self.n_processes == 1:
            return tree
        from jax.experimental import multihost_utils

        return tuple(
            np.asarray(a) for a in multihost_utils.broadcast_one_to_all(tree)
        )

    def publish(self, kind: int, toks: np.ndarray, pos: np.ndarray):
        """Leader: broadcast a step schedule; returns (toks, pos) unchanged
        so call sites can wrap their step invocation."""
        assert self.is_leader
        self._broadcast(self.pack(OP_STEP, kind, toks, pos))
        return toks, pos

    def publish_stop(self):
        assert self.is_leader
        self._broadcast(self.pack(OP_STOP, 0, None, None))

    def recv(self):
        """Follower: block until the leader publishes the next schedule."""
        zeros = self.pack(OP_STOP, 0, None, None)
        got = self._broadcast(zeros)
        return self.unpack(*got)
