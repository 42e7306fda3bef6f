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


def shuffle_partitions(minimum: int = 8) -> int:
    """Partition count for high-cardinality groupby shuffles: the
    cluster CPU count (Ray's default over-partitions these; measured
    ~3x slower on md5-key dedup and ~40% on order-key aggregation).
    Low-cardinality groupbys don't care and keep the default."""
    import ray

    try:
        return max(minimum, int(ray.cluster_resources().get("CPU", minimum)))
    except Exception:
        import logging

        logging.getLogger(__name__).warning(
            "shuffle_partitions: cluster resources unavailable; using %d", minimum
        )
        return minimum
