"""Ray Data DataContext helpers.

The engine's partitioning spine is ``Dataset.repartition(keys=[...])``,
which requires the hash-shuffle strategy. We never call ``ray.init``
here — the driver owns the session (see __ray_entry__.py contract).
"""

from __future__ import annotations


def ensure_hash_shuffle() -> None:
    """Switch the current DataContext to hash shuffling.

    Key-based ``repartition(keys=...)`` (the engine's one big shuffle —
    conv_id co-partitioning, SURVEY.md §4.3.1) is only supported under
    ``ShuffleStrategy.HASH_SHUFFLE``. Idempotent; safe to call per
    pipeline build.
    """
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Aggregator actors default to 0.0625 CPU/partition => a 16-way
    # shuffle reserves 1 full CPU. A DAG chaining several shuffle
    # operators (near-dup candidate pipelines chain up to 4) can then
    # reserve every core on a small cluster and DEADLOCK with its own
    # map tasks. Aggregators are mostly-idle mailboxes; make their CPU
    # claim nominal unless the caller set an explicit policy (bench.py
    # sets the uniform scaling policy itself).
    if ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override is None:
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01


def tune_context(
    *,
    target_max_block_size: int | None = None,
    preserve_order: bool | None = None,
    read_min_blocks: int | None = None,
    quiet: bool = True,
) -> None:
    """Apply engine-recommended DataContext knobs.

    Block size governs everything downstream: Ray's default
    ``read_op_min_num_blocks=200`` shatters small inputs into ~1 MB
    blocks, and per-task + per-block shuffle overhead then dominates
    wall time. We floor read parallelism at the CPU count instead —
    at 100 TB the 128 MB ``target_max_block_size`` takes over and this
    knob is moot.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if read_min_blocks is None:
        import ray

        if ray.is_initialized():
            try:
                read_min_blocks = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                read_min_blocks = 8
        # Ray not up yet (e.g. Engine constructed before the session):
        # leave the knob alone — Engine.run re-applies once initialized,
        # so a large cluster is never silently floored at a default.
    if read_min_blocks is not None:
        ctx.read_op_min_num_blocks = read_min_blocks
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    if preserve_order is not None:
        ctx.execution_options.preserve_order = preserve_order
    if quiet:
        ctx.enable_progress_bars = False
