"""Ramer–Douglas–Peucker simplification: reference-equality, the
deviation guarantee, and the Dataset stage."""

import numpy as np
import pyarrow as pa


def _rdp_reference(pts: np.ndarray, eps: float) -> np.ndarray:
    """Plain recursive RDP (indices kept) — the textbook formulation."""

    def seg_d2(p, a, b):
        d = b - a
        L2 = float(d @ d)
        if L2 == 0.0:
            return float(((p - a) ** 2).sum())
        t = min(max(float((p - a) @ d) / L2, 0.0), 1.0)
        proj = a + t * d
        return float(((p - proj) ** 2).sum())

    def rec(lo, hi):
        if hi - lo < 2:
            return []
        ds = [seg_d2(pts[i], pts[lo], pts[hi]) for i in range(lo + 1, hi)]
        i = int(np.argmax(ds))
        if ds[i] > eps * eps:
            m = lo + 1 + i
            return rec(lo, m) + [m] + rec(m, hi)
        return []

    n = len(pts)
    return np.array(sorted([0, n - 1] + rec(0, n - 1))) if n > 1 else np.arange(n)


def test_dp_matches_reference_implementation():
    from ingest_ray.simplify import dp_keep_mask

    rng = np.random.default_rng(17)
    for _ in range(50):
        n = int(rng.integers(2, 120))
        pts = np.cumsum(rng.normal(size=(n, 2)), axis=0)
        eps = float(rng.uniform(0.0, 2.0))
        got = np.flatnonzero(dp_keep_mask(pts[:, 0], pts[:, 1], eps))
        want = _rdp_reference(pts, eps)
        assert np.array_equal(got, want), (n, eps)


def test_dp_deviation_guarantee():
    """Every dropped vertex lies within eps of the chord between its
    surrounding kept vertices."""
    from ingest_ray.simplify import dp_keep_mask

    rng = np.random.default_rng(23)
    pts = np.cumsum(rng.normal(size=(500, 2)), axis=0)
    eps = 1.5
    keep = dp_keep_mask(pts[:, 0], pts[:, 1], eps)
    kept_idx = np.flatnonzero(keep)
    assert keep[0] and keep[-1]
    for j in range(len(kept_idx) - 1):
        a, b = kept_idx[j], kept_idx[j + 1]
        for i in range(a + 1, b):
            p, pa_, pb = pts[i], pts[a], pts[b]
            d = pb - pa_
            L2 = float(d @ d)
            t = 0.0 if L2 == 0 else min(max(float((p - pa_) @ d) / L2, 0.0), 1.0)
            proj = pa_ + t * d
            assert ((p - proj) ** 2).sum() <= eps * eps + 1e-9


def test_dp_degenerate_lines():
    from ingest_ray.simplify import dp_keep_mask

    # 2 points, identical points, collinear run
    assert dp_keep_mask(np.array([0.0, 1.0]), np.array([0.0, 0.0]), 1.0).all()
    m = dp_keep_mask(np.zeros(5), np.zeros(5), 0.5)
    assert m[0] and m[-1] and m.sum() == 2
    x = np.arange(10.0)
    m = dp_keep_mask(x, np.zeros(10), 0.0)
    assert m.sum() == 2  # exact collinear interior dropped even at eps=0


def test_simplify_lines_dataset(ray_session):
    import ray.data as rd

    from ingest_ray.simplify import simplify_lines

    rng = np.random.default_rng(5)
    rows = []
    for k in range(40):
        n = int(rng.integers(2, 200))
        pts = np.cumsum(rng.normal(size=(n, 2)), axis=0).astype(np.float32)
        rows.append({"key": k, "positions": pts.ravel().tolist()})
    t = pa.table(
        {
            "key": pa.array([r["key"] for r in rows], pa.int64()),
            "positions": pa.array(
                [r["positions"] for r in rows], pa.list_(pa.float32())
            ),
        }
    )
    out = simplify_lines(rd.from_arrow(t).repartition(4), eps=1.0).take_all()
    assert len(out) == 40
    by_key = {int(r["key"]): r for r in out}
    for k, r in by_key.items():
        orig = np.array(rows[k]["positions"], dtype=np.float32).reshape(-1, 2)
        simp = np.array(r["positions"], dtype=np.float32).reshape(-1, 2)
        assert r["n_pts"] == len(orig) and r["n_kept"] == len(simp)
        assert len(simp) <= len(orig)
        # kept points are a subsequence (exact f32 equality — no new coords)
        oi = 0
        for p in simp:
            while oi < len(orig) and not np.array_equal(orig[oi], p):
                oi += 1
            assert oi < len(orig)
            oi += 1
        # endpoints preserved
        assert np.array_equal(simp[0], orig[0]) and np.array_equal(simp[-1], orig[-1])
