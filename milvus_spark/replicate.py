"""Cross-cluster replication configuration — the reference's replicate
topology surface, re-expressed (no code reused; the original validator is Go:
``pkg/util/replicateutil/config_validator.go``).

A configuration is a plain dict:
    {"clusters": [{"cluster_id": str,
                   "connection_param": {"uri": str, "token": str?},
                   "pchannels": [str, ...]}, ...],
     "cross_cluster_topology": [{"source_cluster_id": s,
                                 "target_cluster_id": t}, ...]}

Validation mirrors the reference rule-for-rule (config_validator.go):
cluster basics (:86-148 — ids non-empty/no whitespace/unique, URIs
parseable/unique, pchannels non-empty/unique/equal counts), relevance
(:152-161 — the current cluster must appear with matching pchannels,
order-insensitive), topology edge endpoints + uniqueness (:164-191), the
STAR-topology constraint (:194-238 — exactly one center with out-degree
n−1/in-degree 0, every other node in-degree 1/out-degree 0), and the
config-comparison rules (:242-300 — existing pchannels append-only at the
same positions, connection uri/token immutable per cluster id).

The data plane behind the topology is the existing changefeed/CDC operator
(operators/lifecycle.py changefeed): a secondary cluster applies the
primary's changefeed batches — here both "clusters" are directories, which
is exactly how a Spark deployment would replicate (structured-streaming the
changefeed into the peer's ingest log).
"""

from __future__ import annotations

from urllib.parse import urlparse


class ReplicateConfigError(ValueError):
    pass


def _err(msg: str) -> None:
    raise ReplicateConfigError(msg)


def validate_replicate_configuration(
    incoming: dict,
    current: dict | None,
    current_cluster_id: str,
    current_pchannels: list[str],
) -> bool:
    """Returns is_pchannel_increasing (the validator's side output)."""
    if incoming is None:
        _err("config cannot be nil")
    clusters = incoming.get("clusters") or []
    if not clusters:
        _err("clusters list cannot be empty")

    cluster_map: dict[str, dict] = {}
    uri_set: dict[str, str] = {}
    expected_n = None
    first_id = None
    for i, c in enumerate(clusters):
        if c is None:
            _err(f"cluster at index {i} is nil")
        cid = c.get("cluster_id", "")
        if not cid:
            _err(f"cluster at index {i} has empty clusterID")
        if any(ch in cid for ch in " \t\n\r"):
            _err(f"cluster at index {i} has clusterID '{cid}' containing whitespace characters")
        conn = c.get("connection_param")
        if conn is None:
            _err(f"cluster '{cid}' has nil connection_param")
        uri = conn.get("uri", "")
        if not uri:
            _err(f"cluster '{cid}' has empty URI")
        parsed = urlparse(uri)
        if not parsed.scheme or not (parsed.netloc or parsed.path):
            _err(f"cluster '{cid}' has invalid URI format: '{uri}'")
        if uri in uri_set:
            _err(
                f"duplicate URI found: '{uri}' is used by both cluster "
                f"'{uri_set[uri]}' and cluster '{cid}'"
            )
        uri_set[uri] = cid
        pchannels = c.get("pchannels") or []
        if not pchannels:
            _err(f"cluster '{cid}' has empty pchannels")
        seen = set()
        for j, p in enumerate(pchannels):
            if not p:
                _err(f"cluster '{cid}' has empty pchannel at index {j}")
            if p in seen:
                _err(f"cluster '{cid}' has duplicate pchannel: '{p}'")
            seen.add(p)
        if expected_n is None:
            expected_n, first_id = len(pchannels), cid
        elif len(pchannels) != expected_n:
            _err(
                f"cluster '{cid}' has {len(pchannels)} pchannels, but expected "
                f"{expected_n} (same as cluster '{first_id}')"
            )
        if cid in cluster_map:
            _err(f"duplicate clusterID found: '{cid}'")
        cluster_map[cid] = c

    # relevance: the cluster applying this config must be in it
    me = cluster_map.get(current_cluster_id)
    if me is None:
        _err(
            f"current Milvus cluster '{current_cluster_id}' must be included "
            "in the clusters list"
        )
    if sorted(current_pchannels) != sorted(me.get("pchannels") or []):
        _err(
            "current pchannels do not match the pchannels in the config, "
            f"current pchannels: {current_pchannels}, config pchannels: {me.get('pchannels')}"
        )

    topologies = incoming.get("cross_cluster_topology") or []
    edges = set()
    for i, t in enumerate(topologies):
        if t is None:
            _err(f"topology at index {i} is nil")
        s, d = t.get("source_cluster_id"), t.get("target_cluster_id")
        if s not in cluster_map:
            _err(f"topology at index {i} references non-existent source cluster: '{s}'")
        if d not in cluster_map:
            _err(f"topology at index {i} references non-existent target cluster: '{d}'")
        key = f"{s}->{d}"
        if key in edges:
            _err(f"duplicate topology relationship found: '{key}'")
        edges.add(key)

    if topologies:
        indeg = {cid: 0 for cid in cluster_map}
        outdeg = {cid: 0 for cid in cluster_map}
        for t in topologies:
            outdeg[t["source_cluster_id"]] += 1
            indeg[t["target_cluster_id"]] += 1
        n = len(cluster_map)
        centers = [
            cid for cid in cluster_map if outdeg[cid] == n - 1 and indeg[cid] == 0
        ]
        if len(centers) > 1:
            _err("multiple center nodes found, only one center node is allowed in star topology")
        if not centers:
            _err("no center node found, star topology must have exactly one center node")
        center = centers[0]
        for cid in cluster_map:
            if cid == center:
                continue
            if indeg[cid] != 1 or outdeg[cid] != 0:
                _err(
                    f"cluster '{cid}' does not follow star topology pattern "
                    f"(in-degree={indeg[cid]}, out-degree={outdeg[cid]})"
                )

    increasing = False
    if current is not None:
        cur_map = {
            c["cluster_id"]: c for c in (current.get("clusters") or []) if c
        }
        for inc in clusters:
            cur = cur_map.get(inc["cluster_id"])
            if cur is None:
                continue  # new cluster — allowed
            cp, ip = cur.get("pchannels") or [], inc.get("pchannels") or []
            if len(ip) < len(cp):
                _err(
                    f"cluster '{cur['cluster_id']}' pchannels cannot decrease: "
                    f"current={len(cp)}, incoming={len(ip)}"
                )
            if ip[: len(cp)] != cp:
                _err(
                    f"cluster '{cur['cluster_id']}' existing pchannels must be "
                    f"preserved at the same positions: current={cp}, incoming={ip}"
                )
            if len(ip) > len(cp):
                increasing = True
            cc = cur.get("connection_param") or {}
            ic = inc.get("connection_param") or {}
            if cc.get("uri") != ic.get("uri"):
                _err(
                    f"cluster '{cur['cluster_id']}' connection_param.uri cannot "
                    f"be changed: current={cc.get('uri')}, incoming={ic.get('uri')}"
                )
            if cc.get("token") != ic.get("token"):
                _err(
                    f"cluster '{cur['cluster_id']}' connection_param.token cannot be changed"
                )
    return increasing


def replicate_role(config: dict, cluster_id: str) -> str:
    """primary / secondary / standalone for a cluster under the config
    (config_helper.go role derivation)."""
    for t in config.get("cross_cluster_topology") or []:
        if t.get("target_cluster_id") == cluster_id:
            return "secondary"
    for t in config.get("cross_cluster_topology") or []:
        if t.get("source_cluster_id") == cluster_id:
            return "primary"
    return "standalone"
