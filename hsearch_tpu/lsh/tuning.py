"""LSH operating-point sweep harness.

The reference hard-codes its operating point (and silently overrides the
CLI's hash_K/hash_L to 4, motif_both_points.cpp:375-382); picking (K, L,
W, probes) is left to the user's intuition.  This harness measures the
actual trade-off on the user's own data: for each candidate config it
builds the index, searches, and scores weighted recall (the reference's
metric) plus the verify bill (candidate slots per query — the cost the
parameters are trading against).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from ..search import evaluate, exact, motif


@dataclasses.dataclass
class SweepPoint:
    config: motif.MotifSearchConfig
    recall: float            # weighted (reference metric)
    hits: int
    truth: int
    cand_slots: int          # tables * probes * cand_max per query
    build_s: float
    search_s: float

    def row(self) -> str:
        c = self.config
        return (f"K={c.hash_k:<3} L={c.hash_l:<3} W={c.w:<6g} "
                f"P={c.probes:<3} recall={self.recall:.4f} "
                f"slots/query={self.cand_slots:<8} "
                f"build={self.build_s:.2f}s search={self.search_s:.2f}s")


def sweep(db_kmers: np.ndarray, centers: np.ndarray, radius: float,
          configs: list[motif.MotifSearchConfig] | None = None,
          key: jax.Array | None = None,
          truth=None) -> list[SweepPoint]:
    """Evaluate candidate LSH configs against the exact oracle.

    truth: optional precomputed (ci, ki, dd) from exact.search_radius —
    computed once here otherwise.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if configs is None:
        configs = default_grid(radius)
    if truth is None:
        truth = exact.search_radius(db_kmers, centers, radius)
    tci, tki, tdd = truth
    out = []
    for cfg in configs:
        cfg = dataclasses.replace(cfg, radius=radius)
        t0 = time.perf_counter()
        index = motif.build_index(db_kmers, key, cfg)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        ci, ki, _ = motif.search(index, centers, cfg)
        search_s = time.perf_counter() - t0
        rep = evaluate.recall_from_indices(tci, tki, tdd, ci, ki, radius)
        out.append(SweepPoint(
            config=cfg, recall=rep.recall, hits=len(ci), truth=len(tci),
            cand_slots=cfg.hash_l * max(cfg.probes, 1) * index.cand_max,
            build_s=build_s, search_s=search_s))
    return out


def default_grid(radius: float) -> list[motif.MotifSearchConfig]:
    """A sensible starting grid around the reference's defaults."""
    grid = []
    for k, t, w, p in [(4, 4, 50.0, 1),      # the reference's fixed point
                       (4, 8, 50.0, 1),
                       (8, 8, 50.0, 8),
                       (8, 16, 50.0, 16),
                       (8, 8, 2 * radius, 8),
                       (10, 16, 2 * radius, 16)]:
        grid.append(motif.MotifSearchConfig(hash_k=k, hash_l=t, w=w,
                                            radius=radius, probes=p))
    return grid


def best(points: list[SweepPoint], min_recall: float = 0.95):
    """Cheapest config meeting the recall bar (or the highest-recall one
    when none does)."""
    ok = [p for p in points if p.recall >= min_recall]
    if ok:
        return min(ok, key=lambda p: p.cand_slots)
    return max(points, key=lambda p: p.recall)
