"""Pipeline package; shared execution-context helpers."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def fast_shuffle():
    """Scope the hash-shuffle strategy to datasets BUILT inside this block.

    Measured on this engine's unified edge exchange (20M light rows, 32
    CPUs): sort-shuffle 66s vs hash-shuffle 21s, identical output — all of
    this engine's big groupbys are hash-partition-then-scan shaped, so the
    global sort the default strategy performs is pure overhead.

    Scoped, not global, because Ray 2.49's hash shuffle crashes when a
    shuffled dataset contains 0-row blocks ("Invalid sort key column ... in
    <empty schema>" from HashShuffleAggregator.finalize): only exchanges
    whose inputs are provably non-empty (explode/fingerprint outputs after
    a rebalancing repartition) opt in; small, possibly-empty groupbys keep
    the robust sort strategy. Ray Datasets snapshot the DataContext at
    creation, so wrapping dataset CONSTRUCTION is sufficient.
    """
    import ray
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    prev = {
        "strategy": ctx.shuffle_strategy,
        "aggs": ctx.max_hash_shuffle_aggregators,
        "par": ctx.default_hash_shuffle_parallelism,
        "op_cpu": ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
        "ag_cpu": ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override,
    }
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # default = ~100 partitions x 0.5 CPU of aggregator-actor reservations
    # (50 CPUs!) -> never schedules on a small session; size to the cluster
    # and keep reservations low so aggregators pack beside our actor pools
    ctx.max_hash_shuffle_aggregators = max(2, cpus // 4)
    ctx.default_hash_shuffle_parallelism = max(8, 2 * cpus)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.1
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.1
    try:
        yield ctx
    finally:
        ctx.shuffle_strategy = prev["strategy"]
        ctx.max_hash_shuffle_aggregators = prev["aggs"]
        ctx.default_hash_shuffle_parallelism = prev["par"]
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = prev["op_cpu"]
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = prev["ag_cpu"]


def maybe_fast_shuffle(n_rows: int | None):
    """Size-aware exchange strategy: :func:`fast_shuffle` (hash) only when
    the exchange moves enough rows to amortize the hash shuffle's fixed
    aggregator/partition cost; below the crossover the default sort
    strategy is faster AND tolerates empty blocks. Measured: 20M-row edge
    explode 66s sort vs 21s hash; 1.6M-row minhash band exchange 3.2s sort
    vs 3.8s hash; 31.5k-row fingerprint exchange 1.3s sort vs 3.5s hash.
    None (unknown size) keeps hash — the conservative choice at corpus
    scale."""
    import contextlib

    if n_rows is None or n_rows > 4_000_000:
        return fast_shuffle()
    return contextlib.nullcontext()


def cluster_cpus() -> int:
    """Cluster CPU budget (initialized Ray session, else the host)."""
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 0)) or 4
    import os

    return os.cpu_count() or 4


def pool_size(n_rows: int | None = None):
    """Actor-pool ``concurrency`` sized to the cluster, with headroom for
    the shuffle/read tasks that run alongside (a pool reserving every CPU
    starves the downstream exchange — the flagship fingerprint pool rule).

    With ``n_rows`` (parquet metadata — free): a FIXED pool sized to the
    actual work, ~2048 rows per actor minimum — measured on this host,
    ramping a 24-actor pool for a 3-second query costs more than the
    parallelism returns, while fixed pools beat autoscaling ramp on big
    inputs (A/B in BASELINE.md). Without it: autoscaling (1, full)."""
    cpus = cluster_cpus()
    full = max(2, cpus - max(2, cpus // 4))
    if n_rows is None:
        return (1, full)
    return max(2, min(full, n_rows // 2048 + 1))


def _pin_arrow_threads() -> None:
    """Limit pyarrow's internal thread pool inside Ray workers.

    Every worker process defaults to a hardware-width Arrow thread pool, so
    N workers × N-thread kernels (sort_by, take, parquet codec) oversubscribe
    the node quadratically — measured as a 32-CPU run landing SLOWER than an
    8-CPU run on the same input. One compute thread per worker restores
    linear scaling; Ray already pins OMP/BLAS similarly.
    """
    import pyarrow as _pa

    try:
        if _pa.cpu_count() != 1:
            _pa.set_cpu_count(1)
        if _pa.io_thread_count() != 2:
            _pa.set_io_thread_count(2)
    except Exception:
        pass
