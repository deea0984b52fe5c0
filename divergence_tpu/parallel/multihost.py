"""Multi-host (DCN) launch and work partitioning.

The reference fans out per-chromosome jobs through the HyperBrowser
platform (reference tools/FisherExactTestSNPTool.py:167-171, one region job
per chromosome); there is no in-repo distributed backend (SURVEY.md §2.5).
The TPU-native design: each *host* of a pod slice takes a disjoint set of
chromosomes (or window shards of very large chromosomes), runs the local
mesh engine over its ICI domain, and writes its score-track shard; the
tiny global statistics needed by the region callers (median / percentile /
BH-FDR sort over one double per 500 bp) are computed host-side after a
gather — never as an on-device sort (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up JAX multi-host over DCN.

    Thin wrapper over ``jax.distributed.initialize`` so single-host runs
    (the common case, and all tests) never touch it."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


@dataclasses.dataclass(frozen=True)
class HostAssignment:
    """Which chromosomes this host runs."""

    process_id: int
    num_processes: int
    seqids: tuple[str, ...]


def partition_chromosomes(
    seqid_weights: dict[str, int],
    num_processes: int,
    process_id: int,
) -> HostAssignment:
    """Greedy load-balanced chromosome partitioning.

    ``seqid_weights``: per-chromosome work estimate (window count or SNP
    count).  Chromosomes are assigned largest-first to the least-loaded
    host — deterministic across hosts, so every process computes the same
    assignment with no communication."""
    if not 0 <= process_id < num_processes:
        raise ValueError("process_id out of range")
    loads = np.zeros(num_processes, dtype=np.int64)
    assign: list[list[str]] = [[] for _ in range(num_processes)]
    order = sorted(
        seqid_weights.items(), key=lambda kv: (-kv[1], kv[0])
    )
    for seqid, w in order:
        h = int(np.argmin(loads))
        loads[h] += max(int(w), 1)
        assign[h].append(seqid)
    return HostAssignment(
        process_id=process_id,
        num_processes=num_processes,
        seqids=tuple(assign[process_id]),
    )


def merge_score_shards(
    shards: list[dict[str, tuple[np.ndarray, np.ndarray]]],
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Merge per-host result dicts (disjoint chromosome sets) into one.

    The host-side analogue of an ``all_gather`` of score tracks; with
    per-host file outputs this is simply reading every shard file."""
    merged: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for shard in shards:
        overlap = merged.keys() & shard.keys()
        if overlap:
            raise ValueError(f"chromosome shards overlap: {sorted(overlap)}")
        merged.update(shard)
    return merged
