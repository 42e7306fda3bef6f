"""DataContext tuning shared by the pipeline entry points.

Safe, workload-independent knobs only; callers own ray.init()."""

from __future__ import annotations


def tune_context():
    from ray.data import DataContext

    ctx = DataContext.get_current()
    # polars block sort is markedly faster than the default pyarrow path
    # for the string-keyed canonicalization shuffle
    ctx.use_polars_sort = True
    # output order is never semantically meaningful in this engine
    # (edges/nodes are sets; queries sort explicitly when they need order)
    ctx.execution_options.preserve_order = False
    # NOTE: max_tasks_in_flight_per_actor was evaluated at 16 and is 3x
    # WORSE than the default here (deep per-actor queues cause
    # head-of-line blocking at the tail of the stage) — leave default.
    return ctx


# Upper bound on the bytes a single shuffle partition should hold; above
# this the partition count grows past the CPU pin so one partition never
# outgrows a worker heap at large corpus sizes.
TARGET_SHUFFLE_PARTITION_BYTES = 256 * 1024 * 1024


def shuffle_partitions(minimum: int = 8, estimated_bytes: int | None = None) -> int:
    """Partition count for high-cardinality groupby shuffles.

    Pinned to the cluster CPU count for small inputs (Ray's default
    over-partitions these; measured ~3x slower on md5-key dedup and
    ~40% on order-key aggregation), but scales as
    estimated_bytes / TARGET_SHUFFLE_PARTITION_BYTES once the
    per-partition share of the input would exceed a worker heap —
    corpus/NCPU grows unboundedly at 100-TB scale otherwise.
    Low-cardinality groupbys don't care and keep the default."""
    import ray

    try:
        cpus = max(minimum, int(ray.cluster_resources().get("CPU", minimum)))
    except Exception:
        import logging

        logging.getLogger(__name__).warning(
            "shuffle_partitions: cluster resources unavailable; using %d", minimum
        )
        cpus = minimum
    if estimated_bytes is None:
        return cpus
    return max(cpus, -(-int(estimated_bytes) // TARGET_SHUFFLE_PARTITION_BYTES))


def input_bytes(*paths: str) -> int:
    """Cheap on-disk size estimate for shuffle_partitions(): sum of the
    parquet file sizes under each path (file or directory)."""
    import os

    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total
