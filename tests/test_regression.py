"""Isotonic calibration (operators/regression.py): the minimax closed
form must agree with a classic pool-adjacent-violators reference, be
monotone, and preserve the weighted mean."""

from __future__ import annotations

import numpy as np

from e_commerce_data_pipeline_spark.operators.regression import isotonic_fit


def _pava(rates, weights):
    """Textbook pool-adjacent-violators: merge adjacent violating
    blocks until the sequence is non-decreasing."""
    blocks = [[r * w, w] for r, w in zip(rates, weights)]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] * blocks[i + 1][1] > blocks[i + 1][0] * blocks[i][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand block means back over the original band order
    fitted = []
    bi, used = 0, 0
    for w in weights:
        s, bw = blocks[bi][0], blocks[bi][1]
        fitted.append(s / bw)
        used += w
        if used >= bw - 1e-9:
            bi += 1
            used = 0
    return fitted


def test_isotonic_matches_pava_and_is_monotone(spark):
    rng = np.random.RandomState(3)
    for trial in range(4):
        nb = int(rng.randint(4, 12))
        n = rng.randint(5, 40, size=nb)
        hits = np.array([rng.randint(0, k + 1) for k in n])
        rows = [(int(i), int(h), int(k)) for i, (h, k) in enumerate(zip(hits, n))]
        df = spark.createDataFrame(rows, "x int, hits long, n long")
        got = {
            r["x"]: r for r in isotonic_fit(df).collect()
        }
        fitted = [got[i]["fitted_rate"] for i in range(nb)]
        # monotone non-decreasing
        assert all(a <= b + 1e-12 for a, b in zip(fitted, fitted[1:])), fitted
        # matches PAVA
        ref = _pava(list(hits / n), list(n.astype(float)))
        assert np.allclose(fitted, ref, atol=1e-9), (trial, fitted, ref)
        # weighted mean preserved (least-squares projection property)
        assert abs(
            float(np.dot(fitted, n)) - float(hits.sum())
        ) < 1e-6 * max(1, hits.sum())
        # empirical rates pass through untouched
        for i in range(nb):
            assert got[i]["emp_rate"] == hits[i] / n[i]
