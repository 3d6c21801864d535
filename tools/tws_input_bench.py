"""Microbenchmark: pyspark's shipped TWS input-grouping path (per-row
itertuples + pd.DataFrame(list_of_namedtuples) reconstruction) vs the
vectorized boundary-slice path `streaming/_tws_fastpath.py` installs —
measured standalone on the FK-join stage-2 batch shape (1M rows,
~1000 contiguous keys, mixed dtypes incl. a nullable Int64).

Run: python tools/tws_input_bench.py
Representative (this box): shipped ~4.2 s (~237k rows/s), vectorized
~0.06 s (~17.7M rows/s) — ~75x; the per-row loop is the TWS framework
floor SCALE.md has tracked since r7.
"""

from __future__ import annotations

import time
from itertools import groupby

import numpy as np
import pandas as pd


def main() -> None:
    n, nk = 1_000_000, 1000
    rng = np.random.default_rng(7)
    key = np.sort(rng.integers(0, nk, n))
    df = pd.DataFrame(
        {
            "fk": key.astype("int64"),
            "kind": rng.integers(0, 3, n).astype("int32"),
            "pk": pd.array(rng.integers(0, 10**6, n), dtype="Int64"),
            "name": pd.Series(rng.choice(["alpha", "beta", "gamma"], n)),
            "seq": np.arange(n).astype("int64"),
            "minor": rng.integers(0, 3, n).astype("int32"),
            "r_rank": rng.random(n),
            "right_is_delete": rng.random(n) < 0.1,
        }
    )
    key_offsets = [0]

    t0 = time.time()

    def row_stream():
        for row in df.itertuples(index=False):
            yield (tuple(row[s] for s in key_offsets), row)

    shipped = []
    for bk, grows in groupby(row_stream(), key=lambda x: x[0]):
        shipped.append((bk, pd.DataFrame([r for _, r in grows])))
    t_ship = time.time() - t0

    t0 = time.time()
    key_arrays = [df.iloc[:, s].to_numpy() for s in key_offsets]
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for ka in key_arrays:
        change[1:] |= ka[1:] != ka[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    vec = [
        (tuple(ka[s] for ka in key_arrays), df.iloc[s:e])
        for s, e in zip(starts.tolist(), ends.tolist())
    ]
    t_vec = time.time() - t0

    assert len(shipped) == len(vec)
    for (k1, d1), (k2, d2) in zip(shipped, vec):
        assert k1 == k2 and len(d1) == len(d2)
    print(f"shipped itertuples path: {t_ship:.2f} s ({n / t_ship / 1e3:.0f}k rows/s)")
    print(f"vectorized slice path:   {t_vec:.3f} s ({n / t_vec / 1e3:.0f}k rows/s)")
    print(f"speedup: {t_ship / t_vec:.1f}x")


if __name__ == "__main__":
    main()
