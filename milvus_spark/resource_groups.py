"""Resource groups: the reference's query-node pooling surface, Spark-first.

Reference behavior re-expressed (no code reused — the reference manager is Go):
  - client surface: ``client/milvusclient/resource_group.go:32-160`` (list /
    create / drop / describe / update / transfer_node / transfer_replica),
    option structs in ``resource_group_option.go``.
  - semantics: ``internal/querycoordv2/meta/resource_manager.go`` —
    TransferNode config arithmetic (:340-390), deletable validation
    (:1140-1173: never the default group, limits must be 0, no nodes, not
    referenced by another group's transfer_from/transfer_to), idempotent
    drop of a missing group (:403-410); node flow comment (:724): requests
    are satisfied first, groups may fill to their limits, and every
    redundant node lands in the default group.
  - default group: ``internal/querycoordv2/meta/resource_group.go:15,83-85``
    — name ``__default_resource_group`` (pkg/common/common.go:200), its
    capacity pinned to the DefaultResourceGroupCapacity constant; reported
    capacity of a non-default group is its ``requests.node_num``
    (resource_group.go GetCapacity).
  - tests modeled: ``tests/python_client/resource_group/test_resource_group.py``.

Spark-first mapping: a Milvus resource group fences QueryNodes so tenants
don't contend; the idiomatic Spark analog is a **fair-scheduler pool** — the
group name doubles as the pool name, and every search/query on a collection
loaded into a group runs with ``spark.scheduler.pool`` set to that pool (the
deployment enables ``spark.scheduler.mode=FAIR`` with pool weights
proportional to node counts; in local mode the property is still set and
test-observable). "Nodes" are a logical inventory: on a real cluster a node
is an executor slot-group, here a bookkeeping unit that drives the same
accounting the reference exposes (capacity / num_available_node / transfer
arithmetic). Node assignment is recomputed deterministically from the
declarative configs after every mutation — the synchronous equivalent of the
reference's async resource observer, so ``describe`` is immediately
consistent and the store only persists configs + replicas, never node ids.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

DEFAULT_RESOURCE_GROUP = "__default_resource_group"
# resource_group.go:83-85 pins the default group's reported capacity to the
# DefaultResourceGroupCapacity constant (pymilvus surfaces 1_000_000).
DEFAULT_RESOURCE_GROUP_CAPACITY = 1_000_000


def _node_num(limit, default: int = 0) -> int:
    """Accept the pymilvus shapes: int, {"node_num": n}, or None."""
    if limit is None:
        return default
    if isinstance(limit, dict):
        limit = limit.get("node_num", default)
    n = int(limit)
    return n


def _normalize_config(config: Optional[dict]) -> dict:
    config = dict(config or {})
    requests = _node_num(config.get("requests"), 0)
    limits = _node_num(config.get("limits"), 0)
    # resource_manager.go:1112-1118 validation order: something must be
    # declared, nothing negative, limits >= requests.
    if requests < 0 or limits < 0:
        raise ValueError("node num in `requests` or `limits` should not less than 0")
    if limits < requests:
        raise ValueError("limits node num should not less than requests node num")
    tf = [t if isinstance(t, str) else t["resource_group"] for t in config.get("transfer_from", [])]
    tt = [t if isinstance(t, str) else t["resource_group"] for t in config.get("transfer_to", [])]
    return {
        "requests": requests,
        "limits": limits,
        "transfer_from": list(tf),
        "transfer_to": list(tt),
        "node_labels": dict(config.get("node_labels", {})),
    }


class ResourceGroupStore:
    """Declarative resource-group state + deterministic node assignment.

    Persists configs and replica placements as JSON next to the collection
    data (the etcd-meta analog); the node inventory is session state sized by
    ``num_nodes`` and re-derived from the configs on every load/mutation.
    """

    def __init__(self, path: str, num_nodes: int = 8):
        self._path = path
        self.num_nodes = num_nodes
        if os.path.exists(path):
            with open(path) as f:
                self._s = json.load(f)
        else:
            self._s = {
                "groups": {
                    DEFAULT_RESOURCE_GROUP: {
                        "requests": 0,
                        "limits": DEFAULT_RESOURCE_GROUP_CAPACITY,
                        "transfer_from": [],
                        "transfer_to": [],
                        "node_labels": {},
                        "order": 0,
                    }
                },
                "replicas": {},  # collection -> [rg, rg, ...] one per replica
            }
            self._save()
        self._nodes: dict[str, list[int]] = {}
        self._rebalance()

    # -- persistence -----------------------------------------------------------
    def _save(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._s, f)
        os.replace(tmp, self._path)

    # -- node assignment -------------------------------------------------------
    def _rebalance(self) -> None:
        """Deterministic synchronous version of the resource observer:
        requests first (creation order), then fill each non-default group to
        its limits, remainder to the default group (resource_manager.go:724)."""
        pool = list(range(1, self.num_nodes + 1))
        groups = sorted(
            (g for g in self._s["groups"] if g != DEFAULT_RESOURCE_GROUP),
            key=lambda g: self._s["groups"][g]["order"],
        )
        assign = {g: [] for g in self._s["groups"]}
        for g in groups:  # pass 1: requests
            want = min(self._s["groups"][g]["requests"], len(pool))
            assign[g], pool = pool[:want], pool[want:]
        for g in groups:  # pass 2: fill to limits
            extra = min(self._s["groups"][g]["limits"] - len(assign[g]), len(pool))
            if extra > 0:
                assign[g] += pool[:extra]
                pool = pool[extra:]
        assign[DEFAULT_RESOURCE_GROUP] += pool  # pass 3: redundant -> default
        self._nodes = assign

    # -- CRUD ------------------------------------------------------------------
    def create(self, name: str, config: Optional[dict] = None) -> None:
        if not name or not isinstance(name, str):
            raise ValueError("resource group name must be a non-empty string")
        if name in self._s["groups"]:
            raise ValueError(f"resource group {name!r} already exists")
        cfg = _normalize_config(config)
        cfg["order"] = 1 + max(g["order"] for g in self._s["groups"].values())
        self._s["groups"][name] = cfg
        self._save()
        self._rebalance()

    def update(self, configs: dict[str, dict]) -> None:
        """update_resource_groups({name: config}) — batch declarative update."""
        normalized = {}
        for name, config in configs.items():
            if name not in self._s["groups"]:
                raise ValueError(f"resource group {name!r} not found")
            normalized[name] = _normalize_config(config)
        for name, cfg in normalized.items():
            self._s["groups"][name].update(cfg)
        self._save()
        self._rebalance()

    def drop(self, name: str) -> None:
        if name not in self._s["groups"]:
            return  # resource_manager.go:403-410 — idempotent drop
        if name == DEFAULT_RESOURCE_GROUP:
            raise ValueError("default resource group is not deletable")
        if self._s["groups"][name]["limits"] != 0:
            raise ValueError("resource group's limits node num is not 0")
        for other, cfg in self._s["groups"].items():
            if name in cfg["transfer_from"]:
                raise ValueError(
                    f"resource group {name} is used by {other}'s `transfer_from`,"
                    " remove that configuration first"
                )
            if name in cfg["transfer_to"]:
                raise ValueError(
                    f"resource group {name} is used by {other}'s `transfer_to`,"
                    " remove that configuration first"
                )
        for coll, rgs in self._s["replicas"].items():
            if name in rgs:
                raise ValueError(f"collection {coll} still has replicas in {name}")
        del self._s["groups"][name]
        self._save()
        self._rebalance()

    def list(self) -> list[str]:
        return sorted(self._s["groups"], key=lambda g: self._s["groups"][g]["order"])

    def describe(self, name: str) -> dict:
        if name not in self._s["groups"]:
            raise ValueError(f"resource group {name!r} not found")
        cfg = self._s["groups"][name]
        loaded: dict[str, int] = {}
        for coll, rgs in self._s["replicas"].items():
            n = rgs.count(name)
            if n:
                loaded[coll] = n
        # GetCapacity (resource_group.go:78-88): requests for a normal group,
        # the pinned constant for the default group.
        capacity = (
            DEFAULT_RESOURCE_GROUP_CAPACITY
            if name == DEFAULT_RESOURCE_GROUP
            else cfg["requests"]
        )
        return {
            "name": name,
            "capacity": capacity,
            "num_available_node": len(self._nodes.get(name, [])),
            "num_loaded_replica": loaded,
            # deterministic synchronous rebalance => replicas never serve on
            # borrowed nodes, so outgoing/incoming are structurally empty
            "num_outgoing_node": {},
            "num_incoming_node": {},
            "config": {
                "requests": {"node_num": cfg["requests"]},
                "limits": {"node_num": cfg["limits"]},
                "transfer_from": list(cfg["transfer_from"]),
                "transfer_to": list(cfg["transfer_to"]),
                "node_labels": dict(cfg["node_labels"]),
            },
            "nodes": list(self._nodes.get(name, [])),
        }

    # -- transfers -------------------------------------------------------------
    def transfer_node(self, source: str, target: str, num_node: int) -> None:
        """The deprecated-but-supported imperative transfer: rewrite both
        groups' declarative configs exactly like CheckIfTransferNode
        (resource_manager.go:340-390), then rebalance."""
        if source == target:
            raise ValueError(
                "source resource group and target resource group should not be the same"
            )
        if num_node <= 0:
            raise ValueError(f"invalid NumNode {num_node}")
        for g in (source, target):
            if g not in self._s["groups"]:
                raise ValueError(f"resource group {g!r} not found")
        if len(self._nodes.get(source, [])) < num_node:
            raise ValueError(
                f"resource group {source} has {len(self._nodes.get(source, []))} nodes,"
                f" not enough to transfer {num_node}"
            )
        s, t = self._s["groups"][source], self._s["groups"][target]
        s["requests"] = max(s["requests"] - num_node, 0)
        if source != DEFAULT_RESOURCE_GROUP:
            s["limits"] = max(s["limits"] - num_node, 0)
        t["requests"] += num_node
        if t["requests"] > t["limits"]:
            t["limits"] = t["requests"]
        self._save()
        self._rebalance()

    def transfer_replica(
        self, source: str, target: str, collection: str, num_replicas: int
    ) -> None:
        if source == target:
            raise ValueError(
                "source resource group and target resource group should not be the same"
            )
        if num_replicas <= 0:
            raise ValueError(f"invalid num_replicas {num_replicas}")
        for g in (source, target):
            if g not in self._s["groups"]:
                raise ValueError(f"resource group {g!r} not found")
        rgs = self._s["replicas"].get(collection, [])
        have = rgs.count(source)
        if have < num_replicas:
            raise ValueError(
                f"collection {collection} has {have} replicas in {source},"
                f" not enough to transfer {num_replicas}"
            )
        moved = 0
        for i, g in enumerate(rgs):
            if g == source and moved < num_replicas:
                rgs[i] = target
                moved += 1
        self._s["replicas"][collection] = rgs
        self._save()

    # -- replica placement (load/release hooks) ---------------------------------
    def place_replicas(
        self, collection: str, replica_number: int, resource_groups: Optional[Sequence[str]]
    ) -> None:
        groups = list(resource_groups) if resource_groups else [DEFAULT_RESOURCE_GROUP]
        for g in groups:
            if g not in self._s["groups"]:
                raise ValueError(f"resource group {g!r} not found")
        # round-robin the replicas over the requested groups, like the
        # reference spreads replicas across the rg list on load
        self._s["replicas"][collection] = [
            groups[i % len(groups)] for i in range(replica_number)
        ]
        self._save()

    def release_replicas(self, collection: str) -> None:
        if collection in self._s["replicas"]:
            del self._s["replicas"][collection]
            self._save()

    def pool_for(self, collection: str) -> Optional[str]:
        """Scheduler pool that queries on this collection should run in: the
        group of its first replica (None when the collection isn't loaded —
        the caller leaves the default pool in place)."""
        rgs = self._s["replicas"].get(collection)
        return rgs[0] if rgs else None

    def replicas_of(self, collection: str) -> list[dict]:
        """DescribeReplica (client/milvusclient/resource_group.go:146-177):
        one entry per loaded replica — id, owning group, the group's node
        ids. ``shards`` is empty in local mode: the DM-channel analog here
        is the micro-batch ingest log (streaming/ingest.py), which is not
        replica-partitioned; ``num_outbound_node`` is structurally 0 for
        the same reason describe()'s outgoing/incoming are empty."""
        out = []
        for i, rg in enumerate(self._s["replicas"].get(collection, [])):
            out.append(
                {
                    "replica_id": i,
                    "resource_group": rg,
                    "nodes": list(self._nodes.get(rg, [])),
                    "shards": [],
                    "num_outbound_node": 0,
                }
            )
        return out
