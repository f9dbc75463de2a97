"""One-off measurement: recall vs ef at several segment fills, to pick the
adaptive serving-ef schedule (r9 verdict ask #1). Pure numpy, no Spark."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from milvus_spark.operators.hnsw import _beam_search, build_graph_np  # noqa: E402

rng = np.random.default_rng(42)
for n in (12_000, 24_000, 48_000, 96_000):
    centers = rng.normal(size=(16, 32)) * 3
    X = centers[rng.integers(0, 16, n)] + rng.normal(size=(n, 32))
    t0 = time.time()
    adj = build_graph_np(X, m=8)
    build_s = time.time() - t0
    step = max(1, int(np.sqrt(n)))
    sample = np.arange(0, n, step)
    nq = 20
    queries, truths, entries = [], [], []
    for qi in range(nq):
        q = centers[qi % 16] + rng.normal(size=32)
        queries.append(q)
        truths.append(set(np.argsort(((X - q) ** 2).sum(axis=1), kind="stable")[:10]))
        entries.append(int(sample[((X[sample] - q) ** 2).sum(axis=1).argmin()]))
    for ef in (64, 96, 128, 192, 256, 384, 512):
        hits = 0
        t0 = time.time()
        for q, truth, entry in zip(queries, truths, entries):
            got = {v for _, v in _beam_search(X, adj, q, ef=ef, entry=entry)[:10]}
            hits += len(truth & got)
        dt = (time.time() - t0) / nq * 1000
        print(f"n={n:6d} ef={ef:4d} recall={hits/(nq*10):.3f} {dt:6.1f} ms/q build={build_s:.1f}s", flush=True)
