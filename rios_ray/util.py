"""Small engine utilities."""

from __future__ import annotations

import ray


def default_pool(cap: int = 64) -> tuple[int, int]:
    """Actor-pool ``concurrency`` sized to the session's CPUs.

    A fixed cap (the old ``(1, 8)``) silently serializes on bigger
    clusters: measured 8->32 cpus scaling efficiency 0.41 at sf0.5 with
    the stage pinned to 8 actors.  Pools must scale with the cluster;
    the streaming executor still only spins up actors it can feed.
    """
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(2, min(cap, cpus)))
