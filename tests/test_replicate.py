"""Replicate-configuration validation: rule-for-rule against
pkg/util/replicateutil/config_validator.go (+ the client topology APIs)."""

from __future__ import annotations

import pytest

from milvus_spark.replicate import (
    ReplicateConfigError,
    replicate_role,
    validate_replicate_configuration,
)

ME = "by-dev"
MY_PCH = ["by-dev-rootcoord-dml_0", "by-dev-rootcoord-dml_1"]


def _cluster(cid, uri=None, pch=None, token=None):
    if uri is None:
        uri = f"http://{cid}:19530"
    if pch is None:
        pch = [f"{cid}-dml_0", f"{cid}-dml_1"]
    return {
        "cluster_id": cid,
        "connection_param": {"uri": uri, "token": token},
        "pchannels": pch,
    }


def _cfg(clusters, topo=()):
    return {"clusters": clusters, "cross_cluster_topology": list(topo)}


def _me():
    return _cluster(ME, pch=list(MY_PCH))


def _star(*targets):
    return [{"source_cluster_id": ME, "target_cluster_id": t} for t in targets]


def test_cluster_basic_matrix():
    v = lambda cfg: validate_replicate_configuration(cfg, None, ME, MY_PCH)
    with pytest.raises(ReplicateConfigError, match="cannot be empty"):
        v(_cfg([]))
    with pytest.raises(ReplicateConfigError, match="empty clusterID"):
        v(_cfg([_cluster("")]))
    with pytest.raises(ReplicateConfigError, match="whitespace"):
        v(_cfg([_cluster("bad id")]))
    with pytest.raises(ReplicateConfigError, match="empty URI"):
        v(_cfg([_cluster("a", uri="")]))
    with pytest.raises(ReplicateConfigError, match="invalid URI"):
        v(_cfg([_cluster("a", uri="not a uri")]))
    with pytest.raises(ReplicateConfigError, match="duplicate URI"):
        v(_cfg([_me(), _cluster("b", uri=f"http://{ME}:19530")]))
    with pytest.raises(ReplicateConfigError, match="empty pchannels"):
        v(_cfg([_cluster("a", pch=[])]))
    with pytest.raises(ReplicateConfigError, match="duplicate pchannel"):
        v(_cfg([_cluster("a", pch=["p", "p"])]))
    with pytest.raises(ReplicateConfigError, match="expected 2"):
        v(_cfg([_me(), _cluster("b", pch=["only-one"])]))
    with pytest.raises(ReplicateConfigError, match="duplicate clusterID"):
        v(_cfg([_me(), dict(_me(), connection_param={"uri": "http://x:1"})]))
    # relevance: the applying cluster must be present with matching pchannels
    with pytest.raises(ReplicateConfigError, match="must be included"):
        v(_cfg([_cluster("other")]))
    with pytest.raises(ReplicateConfigError, match="do not match"):
        v(_cfg([_cluster(ME, pch=["x0", "x1"])]))
    v(_cfg([_me()]))  # minimal valid config


def test_topology_rules():
    v = lambda cfg: validate_replicate_configuration(cfg, None, ME, MY_PCH)
    cl = [_me(), _cluster("b"), _cluster("c")]
    v(_cfg(cl, _star("b", "c")))  # proper star, me = center
    with pytest.raises(ReplicateConfigError, match="non-existent source"):
        v(_cfg(cl, [{"source_cluster_id": "ghost", "target_cluster_id": "b"}]))
    with pytest.raises(ReplicateConfigError, match="duplicate topology"):
        v(_cfg(cl, _star("b", "c") + _star("b")))
    # b -> c makes c in-degree 2: not a star
    with pytest.raises(ReplicateConfigError, match="star topology"):
        v(_cfg(cl, _star("b", "c")
               + [{"source_cluster_id": "b", "target_cluster_id": "c"}]))
    # two centers / chain: no node has out-degree n-1
    with pytest.raises(ReplicateConfigError, match="no center node"):
        v(_cfg(cl, [{"source_cluster_id": ME, "target_cluster_id": "b"}]))


def test_config_comparison_rules():
    cur = _cfg([_me(), _cluster("b")], _star("b"))
    ok = _cfg([_me(), _cluster("b"), _cluster("c")], _star("b", "c"))
    assert validate_replicate_configuration(ok, cur, ME, MY_PCH) is False
    # uri/token immutable for an existing cluster id
    changed = _cfg([_me(), _cluster("b", uri="http://elsewhere:19530")], _star("b"))
    with pytest.raises(ReplicateConfigError, match="uri cannot be changed"):
        validate_replicate_configuration(changed, cur, ME, MY_PCH)
    tok = _cfg([_me(), _cluster("b", token="s3cret")], _star("b"))
    with pytest.raises(ReplicateConfigError, match="token cannot be changed"):
        validate_replicate_configuration(tok, cur, ME, MY_PCH)
    # pchannels append-only at the same positions; growth flagged
    me3 = _cluster(ME, pch=MY_PCH + ["by-dev-rootcoord-dml_2"])
    b3 = _cluster("b", pch=["b-dml_0", "b-dml_1", "b-dml_2"])
    grown = _cfg([me3, b3], _star("b"))
    assert (
        validate_replicate_configuration(
            grown, cur, ME, MY_PCH + ["by-dev-rootcoord-dml_2"]
        )
        is True
    )
    # a uniform decrease passes basic validation (counts stay equal) but
    # trips the append-only comparison rule
    cur3 = _cfg([me3, b3], _star("b"))
    shrunk = _cfg([_me(), _cluster("b")], _star("b"))
    with pytest.raises(ReplicateConfigError, match="cannot decrease"):
        validate_replicate_configuration(shrunk, cur3, ME, MY_PCH)
    reordered = _cfg(
        [_me(), _cluster("b", pch=["b-dml_1", "b-dml_0"])], _star("b")
    )
    with pytest.raises(ReplicateConfigError, match="same positions"):
        validate_replicate_configuration(reordered, cur, ME, MY_PCH)


def test_client_replicate_apis(spark, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    c = MilvusSparkClient(spark, root=str(tmp_path / "rep_root"))
    assert c.get_replicate_configuration() is None
    assert c.get_replicate_info()["role"] == "standalone"
    cfg = _cfg(
        [_cluster(ME, pch=list(c.PCHANNELS)), _cluster("dr-site")],
        _star("dr-site"),
    )
    c.update_replicate_configuration(cfg)
    assert c.get_replicate_configuration()["clusters"][1]["cluster_id"] == "dr-site"
    info = c.get_replicate_info()
    assert info["role"] == "primary" and info["targets"] == ["dr-site"]
    with pytest.raises(ReplicateConfigError):
        c.update_replicate_configuration(_cfg([_cluster("unrelated")]))
    # role derivation helper also covers the secondary side
    assert replicate_role(cfg, "dr-site") == "secondary"
