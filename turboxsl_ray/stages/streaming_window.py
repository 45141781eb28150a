"""Stateful streaming window stage: an actor-pool callable holding
per-conversation ring buffers so trailing-window features survive
batch boundaries.

The north_rule requires windowed operators "run on actor pools that
hold sorted per-conversation ring buffers as stateful window state".
The block-local path (stages/window_stage.py) covers the common case
where the partitioner hands a whole sorted conversation to one block
fn; THIS stage covers the streaming case — `map_batches(Cls,
batch_size=B)` slices a sorted block into many batches, and the actor
carries each conversation's tail across those slices.

Reference analog for the state discipline: per-worker caches
initialized once and reused across work items
(/root/reference/src/xpath.c:37-51, threadpool.c:147-167; SURVEY.md
§2.8). Ring-buffer mechanics: the actor stores, per conversation, the
last ``W = max(lag k, rolling k, 1)`` raw rows (the ring buffer), the
last-valid value per backfill column, and the absolute session
ordinal. Each incoming batch is PREPENDED with the ring buffer of its
first conversation, run through the same segment-vectorized kernels as
the stateless path, and the prepended rows are sliced off the output.

Validity contract (asserted): batches must arrive sorted by
``(conv_id, ts, turn_idx)`` and a conversation must be contiguous
within one block — both guaranteed by partition_by_conv + sort_block.
Only PAST-ONLY features are supported: leads are anti-causal and
cannot stream (the point-in-time discipline, SURVEY.md §2.3).

The reappearance guard is BEST-EFFORT beyond ``finished_cap``: the
actor remembers only the most recently closed conversations (an LRU,
default 65,536 — constructor-configurable), so a contract violation
that splits a conversation across more than ``finished_cap`` closed
conversations is NOT detected and would silently produce wrong
lag/session values. A violation that severe requires an upstream
re-block that scatters a conversation across distant batches; the
partitioner never does this, and real re-block splits land the
severed parts near each other, inside the window. Raise the cap (or
set it to ``None`` for an unbounded, O(#convs)-memory guarantee) when
auditing an untrusted upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from turboxsl_ray.kernels import windows as W
from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.stages.window_stage import WindowSpec, make_window_fn


class StreamingWindowStage:
    """Callable class for ``map_batches(StreamingWindowStage, ...,
    fn_constructor_kwargs={'spec': spec}, concurrency=N)``."""

    def __init__(self, spec: WindowSpec, finished_cap: int | None = 65_536):
        if spec.leads:
            raise ValueError(
                "leads are anti-causal and cannot stream; use the "
                "block-local window stage for lead features"
            )
        self.spec = spec
        self.window = max(
            [k for _, k in spec.lags] + [k for _, k, _ in spec.rolling] + [1]
        )
        self.fn = make_window_fn(spec, presorted=True)
        # per-conversation state (actor-lifetime)
        self.tail: dict[str, pa.Table] = {}          # last W raw rows
        self.session_base: dict[str, int] = {}       # abs session idx of tail[0]
        self.ffill_last: dict[tuple[str, str], object] = {}
        # contract guard: conversations this actor has finished (a
        # later batch started a different conversation). A finished
        # conversation REAPPEARING means an upstream re-block split it
        # across batches non-contiguously — state carry would silently
        # produce wrong lag/session values, so we raise instead.
        # BOUNDED: an LRU of the most recently closed conversations —
        # a long-lived actor streaming billions of conversations must
        # not grow O(#convs) state (the whole point of ring buffers).
        # A re-block split puts the severed parts NEAR each other in
        # the stream, so a recent-window check catches real violations;
        # beyond the cap the guard is best-effort by design (see module
        # docstring). finished_cap=None => unbounded deterministic
        # guard at O(#convs) actor memory.
        from collections import OrderedDict

        self._finished: "OrderedDict" = OrderedDict()
        self._finished_cap = finished_cap
        self._open_conv = None

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        conv = as_array(tbl["conv_id"])
        first_conv = conv[0].as_py()
        self._check_contiguity(conv, first_conv)
        prepended = 0
        state = self.tail.get(first_conv)
        if state is not None:
            tbl = pa.concat_tables([state, tbl], promote_options="permissive")
            prepended = state.num_rows

        out = self.fn(tbl)

        # restore absolute session ordinals + ffill continuity
        conv_all = as_array(out["conv_id"])
        if self.spec.session_gap_us is not None:
            sess = as_array(out["session_idx"]).to_numpy(zero_copy_only=False).copy()
            starts = W.segment_starts_from_arrow(conv_all)
            seg_first = W.segment_first_index(starts)
            base = np.zeros(len(sess), dtype=np.int64)
            if first_conv in self.session_base:
                base[seg_first == 0] = self.session_base[first_conv]
            sess = sess + base
            out = out.set_column(
                out.schema.get_field_index("session_idx"),
                "session_idx", pa.array(sess, type=pa.int64())
            )
        for col in self.spec.ffill_cols:
            key = (first_conv,)
            name = f"{col}_ffill"
            arr = as_array(out[name])
            isnull = pc.is_null(arr).to_numpy(zero_copy_only=False)
            stored = self.ffill_last.get((first_conv, col))
            if stored is not None and isnull.any():
                starts = W.segment_starts_from_arrow(conv_all)
                in_first_seg = W.segment_first_index(starts) == 0
                fix = isnull & in_first_seg
                if fix.any():
                    fixed = pc.if_else(
                        pa.array(fix), pa.scalar(stored, type=arr.type), arr
                    )
                    out = out.set_column(
                        out.schema.get_field_index(name), name, as_array(fixed)
                    )

        # update state from the (unsliced) batch tail, then slice output
        self._update_state(tbl, out)
        return out.slice(prepended)

    def _check_contiguity(self, conv: pa.Array, first_conv) -> None:
        """Raise if a conversation this actor already finished shows up
        again (the sorted-contiguous batch contract is violated and
        state carry would be silently wrong)."""
        starts = W.segment_starts_from_arrow(conv)
        firsts = [conv[int(i)].as_py() for i in np.flatnonzero(starts)]
        if len(set(firsts)) != len(firsts):
            raise ValueError(
                "streaming-window contract violated: a conversation appears "
                "in two non-adjacent runs within one batch (input not sorted "
                "by conv_id)"
            )
        if self._open_conv is not None and first_conv != self._open_conv:
            self._mark_finished(self._open_conv)
        reappeared = [c for c in set(firsts) if c in self._finished]
        if reappeared:
            raise ValueError(
                "streaming-window contract violated: conversation(s) "
                f"{sorted(map(str, reappeared))[:5]} reappeared after being "
                "finished — batches must keep each conversation contiguous "
                "(partition_by_conv + sort_block upstream)"
            )
        # every conversation in this batch except the last is now closed
        for c in firsts[:-1]:
            self._mark_finished(c)
        self._open_conv = firsts[-1]

    def _mark_finished(self, conv) -> None:
        self._finished[conv] = None
        self._finished.move_to_end(conv)
        if self._finished_cap is not None:
            while len(self._finished) > self._finished_cap:
                self._finished.popitem(last=False)

    def _update_state(self, raw: pa.Table, computed: pa.Table) -> None:
        conv = as_array(raw["conv_id"])
        last_conv = conv[len(conv) - 1].as_py()
        starts = W.segment_starts_from_arrow(conv)
        last_seg_first = int(W.segment_first_index(starts)[-1])
        seg_len = raw.num_rows - last_seg_first
        keep = min(self.window, seg_len)
        # only the LAST conversation of the batch can continue into the
        # next batch (sorted contiguity); earlier conversations are done
        self.tail = {last_conv: raw.slice(raw.num_rows - keep, keep)}
        new_base: dict[str, int] = {}
        if self.spec.session_gap_us is not None:
            sess = as_array(computed["session_idx"]).to_numpy(zero_copy_only=False)
            new_base[last_conv] = int(sess[raw.num_rows - keep])
        self.session_base = new_base
        new_ffill: dict[tuple[str, str], object] = {}
        for col in self.spec.ffill_cols:
            arr = as_array(computed[f"{col}_ffill"])
            v = arr[len(arr) - 1].as_py()
            if v is not None:
                new_ffill[(last_conv, col)] = v
        self.ffill_last = new_ffill
