"""Minimal mergeable t-digest (numpy), for the GROUPED_AGG quantile UDAF.

A t-digest compresses a distribution into weighted centroids whose sizes are
bounded by a scale function — small at the tails (accurate extreme quantiles),
large in the middle. Digests merge associatively, which is what makes the
aggregation distributable: each Arrow batch/group builds a digest, partial
digests merge, quantiles are read off the final digest.

This is a compact reimplementation of the classic merging t-digest algorithm
(Dunning & Ertl, "Computing extremely accurate quantiles using t-digests") —
public algorithm, no reference-repo code involved.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights")

    def __init__(self, delta: int = 100,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)

    # -- construction -------------------------------------------------------
    @classmethod
    def from_values(cls, values: np.ndarray, delta: int = 100) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        d = cls(delta)
        if values.size:
            d._merge_sorted(np.sort(values), np.ones(values.size))
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        if other.means.size == 0:
            return self
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        order = np.argsort(means, kind="mergesort")
        out = TDigest(self.delta)
        out._merge_sorted(means[order], weights[order])
        return out

    def _merge_sorted(self, means: np.ndarray, weights: np.ndarray) -> None:
        total = weights.sum()
        new_means: list[float] = []
        new_weights: list[float] = []
        cur_mean, cur_w = means[0], weights[0]
        w_so_far = 0.0
        for m, w in zip(means[1:], weights[1:]):
            q0 = w_so_far / total
            q2 = (w_so_far + cur_w + w) / total
            # k-size bound of the merging digest: centroids may span at most
            # 4·total·q(1-q)/delta mass at quantile midpoint q
            q_mid = (q0 + q2) / 2
            limit = 4.0 * total * q_mid * (1 - q_mid) / self.delta
            if cur_w + w <= max(limit, 1.0):
                cur_mean = (cur_mean * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                new_means.append(cur_mean)
                new_weights.append(cur_w)
                w_so_far += cur_w
                cur_mean, cur_w = m, w
        new_means.append(cur_mean)
        new_weights.append(cur_w)
        self.means = np.asarray(new_means)
        self.weights = np.asarray(new_weights)

    # -- queries -------------------------------------------------------------
    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = np.searchsorted(cum, target)
        lo, hi = cum[i - 1], cum[i]
        frac = (target - lo) / (hi - lo) if hi > lo else 0.0
        return float(self.means[i - 1] + frac * (self.means[i] - self.means[i - 1]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- (de)serialization for shuffle-ability -------------------------------
    def serialize(self) -> bytes:
        arr = np.concatenate([self.means, self.weights]).astype(np.float64)
        n = np.array([self.means.size, self.delta], dtype=np.int64)
        return n.tobytes() + arr.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "TDigest":
        n, delta = np.frombuffer(blob[:16], dtype=np.int64)
        arr = np.frombuffer(blob[16:], dtype=np.float64)
        return cls(int(delta), arr[:n].copy(), arr[n:].copy())
