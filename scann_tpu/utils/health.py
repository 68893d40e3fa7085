"""Index health statistics.

TPU-native equivalent of the reference's HealthStatsCollector
(scann/base/health_stats_collector.h:36-60, HealthStats struct
base/single_machine_base.h:568-597): partition imbalance (weighted and
positive variants, ComputeAvgRelativeImbalance :277-303) and average
quantization error, exposed through Searcher.get_health_stats like the
pybind wrapper (scann_ops_pybind.py:121-127).  Computed batched from the
index arrays rather than incrementally; the mutation layer re-derives them
after updates.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class HealthStats:
    partition_weighted_avg_relative_imbalance: float = 0.0
    partition_avg_relative_positive_imbalance: float = 0.0
    avg_quantization_error: float = 0.0
    sum_partition_sizes: int = 0

    def as_dict(self):
        return dataclasses.asdict(self)


def partition_imbalance(sizes: np.ndarray) -> tuple[float, float]:
    """(weighted_avg_relative, avg_relative_positive) imbalance
    (health_stats_collector.h:277-303)."""
    sizes = np.asarray(sizes, np.float64)
    total = sizes.sum()
    if total == 0:
        return 0.0, 0.0
    n = len(sizes)
    weighted = float((sizes / total * sizes).sum() / (total / n) - 1.0)
    best = total / n
    over = sizes[sizes > best]
    positive = 0.0
    if len(over) > 0 and best > 0:
        positive = float((over - best).mean() / best)
    return weighted, positive


def compute_health_stats(searcher) -> HealthStats:
    """Derive health stats from a searcher's index arrays."""
    stats = HealthStats()
    tokens = getattr(searcher, "datapoint_to_token", None)
    part_cfg = getattr(searcher, "part_cfg", None)
    if tokens is None or part_cfg is None:
        stats.sum_partition_sizes = searcher.n_points
        return stats
    flat = np.asarray(tokens).reshape(-1)
    flat = flat[flat >= 0]
    sizes = np.bincount(flat, minlength=part_cfg.num_leaves)
    stats.sum_partition_sizes = int(sizes.sum())
    w, p = partition_imbalance(sizes)
    stats.partition_weighted_avg_relative_imbalance = w
    stats.partition_avg_relative_positive_imbalance = p

    # Quantization error: rms ||x - x_hat|| over the index, where x_hat is
    # the AH reconstruction (+ leaf center under residual quantization).
    model = getattr(searcher, "model", None)
    if model is not None and hasattr(searcher, "_quantization_error_sq"):
        stats.avg_quantization_error = float(
            np.sqrt(searcher._quantization_error_sq))
    return stats
