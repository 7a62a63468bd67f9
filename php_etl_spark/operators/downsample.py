"""Time-series downsampling operators.

LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013) — the
standard visual-fidelity downsampler: keep first and last point,
split the middle into k−2 index-equal buckets, and from each bucket
keep the point forming the largest triangle with the PREVIOUSLY
selected point and the next bucket's centroid. The sequential
selection chain is what DataFrame algebra can't express directly, so
the per-series pass runs in applyInPandas; everything is EXACT
integer arithmetic (areas compared after multiplying through by the
next-bucket size, so no rational division ever happens) which makes
the output engine-reproducible and SQL-oracle-able.

Scale shape: one shuffle on the series key; each series is processed
independently in one Python pass over its (already small) row set. For 100 TB
the input would be pre-bucketed by (key, day) upstream; the operator
itself never joins or re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def lttb(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Downsample each ``key_col`` series to ≤ ``k`` points with LTTB.

    ``x_col``/``y_col``/``id_col`` must be integral (epoch seconds,
    scaled integer value, row id). Rows are ordered by (x, id); ties
    in triangle area break to the earliest (x, id) — a total order,
    so the selection is deterministic on any engine. Series with at
    most ``k`` points pass through unchanged.

    Exactness: with prev-selected point a, candidate b, next-bucket
    sums (sx, sy, m), twice-the-triangle-area scaled by m is
    ``|(a.x·m − sx)(b.y − a.y) − (a.x − b.x)(sy − a.y·m)|`` — pure
    int64 products (bounded by series span × value scale × bucket
    size; ~1e15 for epoch-second × milli-value data).
    """
    assert k >= 3, "lttb needs at least first/last plus one bucket"

    import pandas as pd

    cols = [key_col, id_col, x_col, y_col]

    def _one(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pts = sorted(
            zip(
                (int(v) for v in pdf[x_col]),
                (int(v) for v in pdf[y_col]),
                (int(v) for v in pdf[id_col]),
            ),
            key=lambda p: (p[0], p[2]),
        )
        n = len(pts)
        key = pdf[key_col].iloc[0]
        if n <= k:
            sel = pts
        else:
            b_cnt = k - 2
            middles = pts[1 : n - 1]
            buckets: list[list[tuple[int, int, int]]] = [
                [] for _ in range(b_cnt)
            ]
            for j, p in enumerate(middles):
                buckets[(j * b_cnt) // (n - 2)].append(p)
            sel = [pts[0]]
            for i in range(b_cnt):
                if i < b_cnt - 1:
                    nxt = buckets[i + 1]
                    m = len(nxt)
                    sx = sum(p[0] for p in nxt)
                    sy = sum(p[1] for p in nxt)
                else:
                    sx, sy, m = pts[-1][0], pts[-1][1], 1
                xa, ya = sel[-1][0], sel[-1][1]
                best = None
                for xb, yb, eid in buckets[i]:
                    area2m = abs(
                        (xa * m - sx) * (yb - ya) - (xa - xb) * (sy - ya * m)
                    )
                    cand = ((-area2m, xb, eid), (xb, yb, eid))
                    if best is None or cand[0] < best[0]:
                        best = cand
                sel.append(best[1])
            sel.append(pts[-1])
        return pd.DataFrame(
            {
                key_col: [key] * len(sel),
                id_col: [p[2] for p in sel],
                x_col: [p[0] for p in sel],
                y_col: [p[1] for p in sel],
            }
        )

    schema = ", ".join(f"{c} long" for c in cols)
    return df.select(*cols).groupBy(key_col).applyInPandas(_one, schema)
