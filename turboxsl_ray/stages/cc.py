"""Distributed connected components over a pair/edge stream.

The one operator in this engine where the Dataset API genuinely cannot
express the semantics: CC is ITERATIVE with mutable per-round state
(the label table). A Dataset-only formulation must re-shuffle the full
edge list every round (each ``copartition_join`` exchange moves O(E)
rows per round); here edges are sharded ONCE into a pool of stateful
actors and only label updates move between rounds — O(cut edges)
per-round traffic, actor-to-actor through the object store, never
through the driver.

Reference analog: the closest thing turboxsl has to iterative shared
state is the per-processor global cache guarded by a lock
(/root/reference/src/functions.c:23-37); the BSP actor pool is the
distributed re-expression: state lives sharded, rounds are message
exchanges, no lock.

Protocol (driver orchestrates, data never touches the driver):
1. ingest: edge blocks route ``(src, dst)`` arrays to the shard owning
   ``src`` (multiplicative hash of the node id);
2. seal: each shard sorts its edges, owns ``nodes = unique(src)`` and
   initializes ``comp[node] = node`` (edges are fed symmetrized, so
   every endpoint appears as a src somewhere);
3. round: each shard proposes ``comp[src]`` along each local edge,
   returning ONE object per target shard (``num_returns`` fan-out —
   the driver passes refs, shards fetch peer payloads zero-copy);
   then each shard min-merges what it received and reports how many
   of its labels changed;
4. stop when nothing changed anywhere. Hash-min alone converges in
   O(component diameter) rounds; the interleaved pointer-jumping
   (label-doubling) rounds below (``jump_request`` / ``jump_resolve``
   / ``jump_apply``) cut that to O(log diameter), so adversarially
   deep path-graph clusters converge too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing constant


def _shard_of(nodes: np.ndarray, n_shards: int) -> np.ndarray:
    """Multiplicative-hash shard routing (plain modulo would stride-skew
    sequential doc ids)."""
    h = (nodes.astype(np.int64).view(np.uint64) * _MIX) >> np.uint64(40)
    return (h % np.uint64(n_shards)).astype(np.int64)


_EMPTY_PART = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))


# nominal CPU claim (same policy as the hash-shuffle aggregators,
# context.ensure_hash_shuffle): shards are mostly-idle mailboxes between
# short numpy bursts; a real claim times n_shards deadlocks small
# clusters against the ingest map tasks
@ray.remote(num_cpus=0.1)
class _CCShard:
    """One shard of the edge set + the labels of the nodes it owns."""

    def __init__(self, shard_id: int, n_shards: int):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self.nodes: np.ndarray | None = None
        self.comp: np.ndarray | None = None

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._src_parts.append(np.asarray(src, dtype=np.int64))
        self._dst_parts.append(np.asarray(dst, dtype=np.int64))
        return len(src)

    def seal(self) -> int:
        src = (
            np.concatenate(self._src_parts)
            if self._src_parts
            else np.empty(0, dtype=np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts)
            if self._dst_parts
            else np.empty(0, dtype=np.int64)
        )
        self._src_parts, self._dst_parts = [], []
        order = np.argsort(src, kind="stable")
        self.src, self.dst = src[order], dst[order]
        self.nodes = np.unique(src)
        self.comp = self.nodes.copy()
        return len(self.nodes)

    def propose(self):
        """comp[src] pushed along every local edge, pre-routed by the
        destination's owning shard. Returns one (dst, label) pair per
        target shard (num_returns fan-out)."""
        lab = self.comp[np.searchsorted(self.nodes, self.src)]
        tgt = _shard_of(self.dst, self.n_shards)
        out = []
        for t in range(self.n_shards):
            m = tgt == t
            out.append((self.dst[m], lab[m]) if m.any() else _EMPTY_PART)
        return tuple(out) if self.n_shards > 1 else out[0]

    def accept(self, *parts) -> int:
        """Min-merge peer proposals into owned labels; returns how many
        labels changed (global sum == 0 is the fixpoint)."""
        if len(self.nodes) == 0:
            return 0
        before = self.comp.copy()
        for dst, lab in parts:
            if len(dst) == 0:
                continue
            idx = np.searchsorted(self.nodes, dst)
            # every dst is an endpoint of a symmetric edge => owned here
            np.minimum.at(self.comp, idx, lab)
        return int((self.comp < before).sum())

    # ---- pointer jumping (label doubling): comp[v] <- comp[comp[v]] ----
    # Every label value IS a node id of the pair graph (labels start as
    # own ids and only ever min-merge other nodes' ids), so each label
    # is resolvable at its owner shard. One jump round halves the depth
    # of every label chain: hash-min alone converges in O(diameter)
    # rounds, hash-min + jumping in O(log diameter) — the difference
    # between a 10-round and a 10^6-round loop on a path-graph cluster.

    def jump_request(self):
        """Distinct current labels, routed by owning shard."""
        lab = np.unique(self.comp) if len(self.nodes) else np.empty(0, np.int64)
        tgt = _shard_of(lab, self.n_shards)
        out = [lab[tgt == t] for t in range(self.n_shards)]
        return tuple(out) if self.n_shards > 1 else out[0]

    def jump_resolve(self, *requests):
        """comp[label] for each requested (owned) label array."""
        out = []
        for req in requests:
            req = np.asarray(req, dtype=np.int64)
            if len(req) == 0 or len(self.nodes) == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            out.append(self.comp[np.searchsorted(self.nodes, req)])
        return tuple(out) if len(requests) > 1 else out[0]

    def jump_apply(self, *resolved_parts) -> int:
        """comp <- min(comp, resolved comp-of-comp); returns changes."""
        if len(self.nodes) == 0:
            return 0
        lab = np.unique(self.comp)
        tgt = _shard_of(lab, self.n_shards)
        new = np.empty_like(lab)
        for t in range(self.n_shards):
            m = tgt == t
            new[m] = resolved_parts[t]
        before = self.comp.copy()
        self.comp = np.minimum(self.comp, new[np.searchsorted(lab, self.comp)])
        return int((self.comp < before).sum())

    def jump_local(self) -> int:
        """Single-shard jump: everything is owned here."""
        if len(self.nodes) == 0:
            return 0
        before = self.comp.copy()
        self.comp = np.minimum(
            self.comp, self.comp[np.searchsorted(self.nodes, self.comp)]
        )
        return int((self.comp < before).sum())

    def labels_table(self) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(self.nodes, type=pa.int64()),
                "comp": pa.array(self.comp, type=pa.int64()),
            }
        )


def connected_components(
    pairs: Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_shards: int = 8,
    max_rounds: int = 50,
) -> Dataset:
    """(node, comp) labels for every node in ``pairs``; comp = min node
    id reachable. Nodes outside the pair graph are absent (callers
    left-join + fill own id — keeps the iteration near-dup-scale, not
    corpus-scale)."""
    from turboxsl_ray.kernels.arrays import as_array
    from turboxsl_ray.stages.partitioning import map_partitions

    shards = [_CCShard.remote(i, n_shards) for i in range(n_shards)]

    def ingest(t: pa.Table) -> pa.Table:
        a = as_array(t[a_col]).to_numpy().astype(np.int64)
        b = as_array(t[b_col]).to_numpy().astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        tgt = _shard_of(src, n_shards)
        refs = []
        for s in range(n_shards):
            m = tgt == s
            if m.any():
                refs.append(shards[s].add_edges.remote(src[m], dst[m]))
        # block until this block's edges are owned — the ingest pass
        # completing == all edges resident
        ray.get(refs)
        return pa.table({"n": pa.array([len(a)], type=pa.int64())})

    map_partitions(pairs, ingest).materialize()
    ray.get([s.seal.remote() for s in shards])

    for _ in range(max_rounds):
        if n_shards > 1:
            prop = [s.propose.options(num_returns=n_shards).remote() for s in shards]
            changed = ray.get(
                [
                    shards[t].accept.remote(*[prop[s][t] for s in range(n_shards)])
                    for t in range(n_shards)
                ]
            )
            # pointer jumping: comp[v] <- comp[comp[v]] (one gather
            # exchange over DISTINCT labels, not nodes) — chains halve
            # every round, so convergence is O(log diameter)
            reqs = [
                s.jump_request.options(num_returns=n_shards).remote() for s in shards
            ]
            resolved = [
                shards[t].jump_resolve.options(num_returns=n_shards).remote(
                    *[reqs[s][t] for s in range(n_shards)]
                )
                for t in range(n_shards)
            ]
            jumped = ray.get(
                [
                    shards[s].jump_apply.remote(
                        *[resolved[t][s] for t in range(n_shards)]
                    )
                    for s in range(n_shards)
                ]
            )
        else:
            changed = ray.get([shards[0].accept.remote(shards[0].propose.remote())])
            jumped = ray.get([shards[0].jump_local.remote()])
        if sum(changed) + sum(jumped) == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"(with pointer jumping this needs diameter > 2^{max_rounds} — "
            "almost certainly a bug, not a real graph)"
        )

    # materialize (tiny: one row per pair-graph node) before the shard
    # handles go out of scope and the actors terminate
    return ray.data.from_arrow_refs(
        [s.labels_table.remote() for s in shards]
    ).materialize()
