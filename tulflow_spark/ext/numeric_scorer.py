"""A REAL numeric model in the re-rank scorer slot (r6 VERDICT #4): a
logistic scorer over pairwise lexical features, with persisted weights and
a genuine batched forward pass — proving ``ext.rerank``'s model-slot
contract (iterator of (query, doc) Arrow batches -> scores) with no torch
in the container.  A production cross-encoder drops into the same slot
with zero plan changes; this scorer IS the ONNX-shaped stand-in: load
weights once per executor, featurize the batch, run the linear algebra in
numpy, squash, return floats.

Engine-exact scoring (the lm/psi/bm25 recipe): every division and
transcendental is rounded to 9 decimals the moment it is produced, so the
DuckDB oracle re-derives scores and ranks bit for bit.

- features per (query, doc) pair — integers except the last:
  ``overlap = |tq ∩ td|``, ``union = |tq ∪ td|``, ``dlen = |td|``,
  ``jacc = round(overlap/union, 9)`` (0 when union = 0); token sets are
  the same distinct-whitespace-token sets as the lexical scorer.
- forward pass: ``z = round(b + w0*overlap + w1*union + w2*dlen +
  w3*jacc, 9)`` accumulated STRICTLY left to right (both engines evaluate
  the same IEEE double sequence), then
  ``score = round(1 / (1 + exp(-z)), 9)``; ``exp`` goes through libm
  (math.exp — the same library DuckDB's ``exp`` binds) rather than
  numpy's SIMD exp, whose ≤1-ulp variance could straddle the rounding
  boundary.

Scale shape: identical to ext.rerank (the scorer only changes the UDF
body) — pair-assembly shuffle sized by the candidate list, weights are a
handful of floats carried in the UDF closure (a real model would load
from ``path`` once per executor, which ``load_scorer`` supports).

No reference analogue; LLM-pipeline extension surface.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from tulflow_spark import fsio
from tulflow_spark.ext.rerank import _tokset

#: default weights: overlap, union, doc-length, jaccard
DEFAULT_WEIGHTS = (0.7, -0.05, 0.01, 1.3)
DEFAULT_BIAS = -0.4


def _round9(a: np.ndarray) -> np.ndarray:
    """Round half away from zero to 9 decimals (DuckDB/Spark ROUND
    semantics; numpy's .round is half-to-even)."""
    return np.copysign(np.floor(np.abs(a) * 1e9 + 0.5), a) / 1e9


def pair_features(q: pd.Series, d: pd.Series) -> np.ndarray:
    """(n, 4) float64 feature matrix: overlap, union, dlen, jacc."""
    rows = np.empty((len(q), 4), dtype=np.float64)
    for i, (a, b) in enumerate(zip(q, d)):
        ta, tb = _tokset(a), _tokset(b)
        ov = float(len(ta & tb))
        un = float(len(ta | tb))
        rows[i, 0] = ov
        rows[i, 1] = un
        rows[i, 2] = float(len(tb))
        rows[i, 3] = 0.0 if un == 0.0 else float(_round9(np.float64(ov / un)))
    return rows


@dataclass(frozen=True)
class NumericScorer:
    """Logistic pair scorer: callable with the exact ``scorer=`` contract
    of :func:`tulflow_spark.ext.rerank.rerank_topk` / ``cross_score``."""

    weights: tuple[float, ...] = DEFAULT_WEIGHTS
    bias: float = DEFAULT_BIAS

    def __call__(self, q: pd.Series, d: pd.Series) -> list[float]:
        x = pair_features(q, d)
        if x.shape[1] != len(self.weights):
            raise ValueError(
                f"scorer has {len(self.weights)} weights for "
                f"{x.shape[1]} features"
            )
        # strict left-to-right accumulation — the SQL mirror's
        # (((b + t0) + t1) + t2) + t3 double sequence
        z = np.full(len(x), float(self.bias), dtype=np.float64)
        for j, w in enumerate(self.weights):
            z = z + np.float64(w) * x[:, j]
        z = _round9(z)
        # clamp before exp: math.exp raises OverflowError past ~709 (a
        # huge low-overlap doc can push z below -709), while sigmoid is
        # already exactly 0.0/1.0 at 9 decimals for |z| >= 31 — so the
        # +/-50 clamp is VALUE-IDENTICAL to the unclamped form (and to
        # the oracle's exp(), whose inf collapses to the same 0.0/1.0)
        z = np.clip(z, -50.0, 50.0)
        # libm exp per element (matches DuckDB's exp); batch sizes here
        # are candidate lists, not the corpus
        return [
            float(_round9(np.float64(1.0 / (1.0 + math.exp(-v)))))
            for v in z
        ]

    def save(self, path: str) -> None:
        fsio.write_text(
            path,
            json.dumps(
                {"weights": list(self.weights), "bias": self.bias,
                 "features": ["overlap", "union", "dlen", "jacc"]},
            ),
        )


def load_scorer(path: str) -> NumericScorer:
    fs, p = fsio.resolve(path)
    with fs.open_input_stream(p) as stream:
        d = json.loads(stream.read().decode("utf-8"))
    return NumericScorer(tuple(float(w) for w in d["weights"]),
                         float(d["bias"]))


def score_sql_expr(
    tq: str, td: str,
    weights: tuple[float, ...] = DEFAULT_WEIGHTS,
    bias: float = DEFAULT_BIAS,
) -> str:
    """DuckDB mirror of the forward pass over token-list columns ``tq``
    / ``td`` (same CTE shape as rr1's oracle)."""
    w0, w1, w2, w3 = weights
    ov = f"len(list_intersect({tq}, {td}))"
    un = f"len(list_distinct(list_concat({tq}, {td})))"
    jc = f"CASE WHEN {un} = 0 THEN 0.0 ELSE ROUND({ov} / {un}, 9) END"
    z = (
        f"ROUND(CAST({bias!r} AS DOUBLE) "
        f"+ CAST({w0!r} AS DOUBLE) * {ov} "
        f"+ CAST({w1!r} AS DOUBLE) * {un} "
        f"+ CAST({w2!r} AS DOUBLE) * len({td}) "
        f"+ CAST({w3!r} AS DOUBLE) * ({jc}), 9)"
    )
    return f"ROUND(1.0 / (1.0 + exp(-({z}))), 9)"


__all__ = [
    "DEFAULT_BIAS",
    "DEFAULT_WEIGHTS",
    "NumericScorer",
    "load_scorer",
    "pair_features",
    "score_sql_expr",
]
