"""Randomized index-lifecycle fuzz: arbitrary insert / delete / upsert /
refresh sequences must keep the index EXACT vs a brute-force model.

The r7 epoch machinery (per-epoch version masks, upsert acceptance, epoch
compaction, delete folding) has many interacting states; the targeted
tests pin known shapes, this fuzz walks random sequences and asserts the
single invariant everything reduces to: after any accepted refresh, an
exhaustive-ef search over the index equals the exact cosine top-k over
the rows currently visible in the collection. Covers, among others, the
r6 advisor's disappearing-row shape (insert → delete → re-insert between
refreshes) and multi-epoch upsert chains, on both the graph (HNSW) and a
trained (IVF_FLAT, full-probe) index."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

DIM = 8


def _vec(rng: random.Random) -> list:
    return [rng.uniform(-1, 1) for _ in range(DIM)]


def _truth_topk(model: dict, q: list, k: int) -> set:
    qv = np.asarray(q)
    qv = qv / np.linalg.norm(qv)
    cos = {}
    for pk, v in model.items():
        a = np.asarray(v)
        cos[pk] = float(np.dot(a / np.linalg.norm(a), qv))
    return set(sorted(cos, key=lambda i: (-round(cos[i], 12), i))[:k])


@pytest.mark.parametrize("itype,params,sp", [
    ("HNSW", {"M": 4, "n_partitions": 3}, {"ef": 10**6}),
    ("IVF_FLAT", {"nlist": 4}, {"nprobe": 10**6}),
    # r8: the shortlist family rides the same epoch/mask/fold machinery
    # plus the shard-partitioned code-table layout; full shortlist makes
    # the ADC pass exact so the model comparison is strict
    ("IVF_PQ", {"m": 4}, {"shortlist": 10**6}),
])
def test_refresh_lifecycle_fuzz(spark, tmp_path, itype, params, sp):
    from milvus_spark.client import MilvusSparkClient

    for seed in (11, 23):
        rng = random.Random(seed)
        client = MilvusSparkClient(
            spark, root=str(tmp_path / f"{itype}_{seed}")
        )
        name = "fz"
        model: dict[int, list] = {i: _vec(rng) for i in range(30)}
        next_pk = 30
        client.create_collection(
            name, pk_field="pk", vector_field="v", metric_type="COSINE"
        )
        client.insert(
            name,
            spark.createDataFrame(
                [(p, v) for p, v in model.items()], "pk long, v array<double>"
            ),
        )
        client.create_index(name, "v", itype, dict(params))
        q = _vec(rng)
        for _step in range(6):
            op = rng.choice(["insert", "delete", "upsert", "churn"])
            if op == "insert":
                batch = {next_pk + i: _vec(rng) for i in range(rng.randint(1, 5))}
                next_pk += len(batch)
                model.update(batch)
                client.insert(
                    name,
                    spark.createDataFrame(
                        [(p, v) for p, v in batch.items()],
                        "pk long, v array<double>",
                    ),
                )
            elif op == "delete" and len(model) > 5:
                victims = rng.sample(sorted(model), rng.randint(1, 3))
                for p in victims:
                    model.pop(p)
                client.delete(name, ids=victims)
            elif op == "upsert":
                targets = rng.sample(sorted(model), rng.randint(1, 3))
                up = {p: _vec(rng) for p in targets}
                model.update(up)
                client.upsert(
                    name,
                    spark.createDataFrame(
                        [(p, v) for p, v in up.items()],
                        "pk long, v array<double>",
                    ),
                )
            else:  # churn: the r6 advisor's disappearing-row shape —
                # insert a NEW pk, delete it, re-insert it, all between
                # two refreshes; the row was never indexed, must never
                # be masked, and must serve after the refresh
                p = next_pk
                next_pk += 1
                v1, v2 = _vec(rng), _vec(rng)
                client.insert(
                    name,
                    spark.createDataFrame([(p, v1)], "pk long, v array<double>"),
                )
                client.delete(name, ids=[p])
                client.insert(
                    name,
                    spark.createDataFrame([(p, v2)], "pk long, v array<double>"),
                )
                model[p] = v2
            # r8: every other step searches WITHOUT refreshing first —
            # the sealed+growing serving path (stale index epochs + delta
            # exact scan + query-time delete mask) must match the model
            # exactly too, including its unsafe-composition fallbacks
            if _step % 2 == 0:
                got = client.search(
                    name, [q], limit=10, search_params=dict(sp)
                ).collect()
                assert {r.pk for r in got} == _truth_topk(model, q, 10), (
                    "sealed+growing", itype, seed, _step, op,
                )
            entry = client.refresh_index(name, "v", itype)
            if itype == "HNSW":
                assert len(entry["epochs"]) <= client.MAX_INDEX_EPOCHS + 1
            got = client.search(
                name, [q], limit=10, search_params=dict(sp)
            ).collect()
            assert {r.pk for r in got} == _truth_topk(model, q, 10), (
                itype, seed, _step, op,
            )
        client.drop_collection(name)
