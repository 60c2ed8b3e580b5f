"""Actor-pool sizing: autoscaling bounds derived from cluster CPUs.

A fixed actor count is wrong in both directions: a pool of 2 bottlenecks a
256-node cluster, and a pool equal to the CPU count can starve upstream
read tasks into deadlock on a small session.  Every stateful
``map_batches`` stage therefore uses an AUTOSCALING pool ``(min_actors,
max(floor, cluster CPUs))`` — Ray Data grows the pool only while upstream
keeps it busy, so small sessions stay deadlock-free and big clusters get
a pool that tracks their size.
"""

from __future__ import annotations


def autoscale_pool(min_actors: int = 1, floor: int = 8) -> tuple[int, int]:
    """``(min_actors, max(floor, cluster CPUs))`` for ``concurrency=``."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", floor))
    except Exception:
        cpus = floor
    return (min_actors, max(floor, cpus))


def coarse_fanout(floor: int = 64, per_cpu: int = 2, ceil: int = 1 << 14) -> int:
    """Coarse-partition fan-out for the hash(key)&mask co-group ops, sized
    to the CLUSTER rather than a constant: the next power of two >=
    ``max(floor, per_cpu * cluster CPUs)``, clamped to ``ceil``.

    A fixed 64/256 mask is right for a 32-CPU box (the floors reproduce
    exactly those measured values there) but starves a 1000-core cluster —
    a handful of reduce partitions serialize the fold.  Power-of-two so the
    partition id stays a single ``bit_wise_and`` in Arrow.

    MUST be resolved ON THE DRIVER at pipeline-build time and closed over
    by the batch fns: if each worker task resolved it independently, a
    mid-job cluster resize could route the same key to different
    partitions within one shuffle.  ``SPIDER_RAY_FANOUT`` forces an exact
    value (tests use it to pin high-fan-out robustness).
    """
    import os

    forced = os.environ.get("SPIDER_RAY_FANOUT")
    if forced:
        target = int(forced)
    else:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        target = max(floor, per_cpu * cpus)
    p = 1
    while p < target:
        p <<= 1
    return min(p, ceil)


def fixed_pool(floor: int = 4) -> int:
    """Fixed actor count = max(floor, cluster CPUs) — for the HEAVY stage
    of a pipeline.  Pair with ``num_cpus=0.5`` so reads/shuffle tasks keep
    scheduling room.  Measured vs the (min, max) autoscaling pool on the
    sf0.1 corpus parse: the autoscaler's ramp-up dominates 10-20 s jobs
    (edge extraction 13.2 s -> 7.8 s, markdown transform 23.4 s -> 12.0 s
    with a fixed fractional pool)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", floor))
    except Exception:
        cpus = floor
    return max(floor, cpus)
