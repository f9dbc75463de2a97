"""Resource groups: CRUD/transfer accounting mirrors the reference manager
(querycoordv2/meta/resource_manager.go; tests/python_client/resource_group/
test_resource_group.py), the Spark hook is the fair-scheduler pool."""

from __future__ import annotations

import pytest

from milvus_spark.client import MilvusSparkClient
from milvus_spark.resource_groups import (
    DEFAULT_RESOURCE_GROUP,
    DEFAULT_RESOURCE_GROUP_CAPACITY,
    ResourceGroupStore,
)


@pytest.fixture()
def client(spark, tmp_path):
    return MilvusSparkClient(spark, root=str(tmp_path / "rg_root"))


def test_default_group_exists_and_holds_all_nodes(client):
    assert client.list_resource_groups() == [DEFAULT_RESOURCE_GROUP]
    info = client.describe_resource_group(DEFAULT_RESOURCE_GROUP)
    assert info["capacity"] == DEFAULT_RESOURCE_GROUP_CAPACITY
    assert info["num_available_node"] == client._rg.num_nodes
    assert info["config"]["requests"] == {"node_num": 0}


def test_create_validation_matrix(client):
    with pytest.raises(ValueError, match="exists"):
        client.create_resource_group(DEFAULT_RESOURCE_GROUP)
    with pytest.raises(ValueError, match="not less than 0"):
        client.create_resource_group("neg", {"requests": {"node_num": -1}})
    # limits >= requests (resource_manager.go:1118)
    with pytest.raises(ValueError, match="not less than requests"):
        client.create_resource_group(
            "bad", {"requests": {"node_num": 3}, "limits": {"node_num": 1}}
        )
    with pytest.raises(ValueError, match="non-empty string"):
        client.create_resource_group("")


def test_node_flow_requests_then_limits_then_default(client):
    total = client._rg.num_nodes
    # requests satisfied first, then fill to limits, remainder -> default
    client.create_resource_group("rg_a", {"requests": {"node_num": 2}, "limits": {"node_num": 3}})
    a = client.describe_resource_group("rg_a")
    assert a["num_available_node"] == 3  # filled to its limits
    assert a["capacity"] == 2  # GetCapacity = requests for non-default
    d = client.describe_resource_group(DEFAULT_RESOURCE_GROUP)
    assert d["num_available_node"] == total - 3
    assert sorted(a["nodes"] + d["nodes"]) == list(range(1, total + 1))


def test_transfer_node_config_arithmetic(client):
    client.create_resource_group("rg_b", {"requests": {"node_num": 1}, "limits": {"node_num": 1}})
    client.transfer_node(DEFAULT_RESOURCE_GROUP, "rg_b", 2)
    b = client.describe_resource_group("rg_b")
    # target requests += 2, limits bumped to match (CheckIfTransferNode)
    assert b["config"]["requests"] == {"node_num": 3}
    assert b["config"]["limits"] == {"node_num": 3}
    assert b["num_available_node"] == 3
    # default group's requests floor at 0 and its limits never shrink
    d = client.describe_resource_group(DEFAULT_RESOURCE_GROUP)
    assert d["config"]["requests"] == {"node_num": 0}
    assert d["config"]["limits"] == {"node_num": DEFAULT_RESOURCE_GROUP_CAPACITY}
    # error matrix
    with pytest.raises(ValueError, match="should not be the same"):
        client.transfer_node("rg_b", "rg_b", 1)
    with pytest.raises(ValueError, match="invalid NumNode"):
        client.transfer_node(DEFAULT_RESOURCE_GROUP, "rg_b", 0)
    with pytest.raises(ValueError, match="not found"):
        client.transfer_node("ghost", "rg_b", 1)
    with pytest.raises(ValueError, match="not enough"):
        client.transfer_node("rg_b", DEFAULT_RESOURCE_GROUP, 99)
    # non-default source loses requests AND limits
    client.transfer_node("rg_b", DEFAULT_RESOURCE_GROUP, 2)
    b = client.describe_resource_group("rg_b")
    assert b["config"]["requests"] == {"node_num": 1}
    assert b["config"]["limits"] == {"node_num": 1}


def test_drop_semantics(client):
    client.create_resource_group("rg_c", {"requests": {"node_num": 1}, "limits": {"node_num": 1}})
    with pytest.raises(ValueError, match="not deletable"):
        client.drop_resource_group(DEFAULT_RESOURCE_GROUP)
    # limits must be 0 first (validateResourceGroupIsDeletable)
    with pytest.raises(ValueError, match="limits node num is not 0"):
        client.drop_resource_group("rg_c")
    client.update_resource_groups(
        {"rg_c": {"requests": {"node_num": 0}, "limits": {"node_num": 0}}}
    )
    client.drop_resource_group("rg_c")
    assert "rg_c" not in client.list_resource_groups()
    client.drop_resource_group("rg_c")  # idempotent (resource_manager.go:403)
    # a group referenced by another group's transfer_from is not deletable
    client.create_resource_group("rg_src", {"limits": {"node_num": 0}})
    client.create_resource_group(
        "rg_dst", {"limits": {"node_num": 0}, "transfer_from": ["rg_src"]}
    )
    with pytest.raises(ValueError, match="transfer_from"):
        client.drop_resource_group("rg_src")
    client.update_resource_groups(
        {"rg_dst": {"limits": {"node_num": 0}, "transfer_from": []}}
    )
    client.drop_resource_group("rg_src")


def test_replica_placement_and_transfer(client, spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    client.create_collection("nat", pk_field="n_nationkey")
    client.insert("nat", nation)
    client.create_resource_group("rg_q", {"requests": {"node_num": 2}, "limits": {"node_num": 2}})
    with pytest.raises(ValueError, match="not found"):
        client.load_collection("nat", resource_groups=["ghost"])
    client.load_collection("nat", replica_number=2, resource_groups=["rg_q"])
    info = client.describe_resource_group("rg_q")
    assert info["num_loaded_replica"] == {"nat": 2}
    # a loaded group can't be dropped even at limits 0
    client.transfer_replica("rg_q", DEFAULT_RESOURCE_GROUP, "nat", 1)
    assert client.describe_resource_group("rg_q")["num_loaded_replica"] == {"nat": 1}
    assert client.describe_resource_group(DEFAULT_RESOURCE_GROUP)["num_loaded_replica"] == {
        "nat": 1
    }
    with pytest.raises(ValueError, match="not enough"):
        client.transfer_replica("rg_q", DEFAULT_RESOURCE_GROUP, "nat", 5)
    client.update_resource_groups(
        {"rg_q": {"requests": {"node_num": 0}, "limits": {"node_num": 0}}}
    )
    with pytest.raises(ValueError, match="replicas"):
        client.drop_resource_group("rg_q")
    client.release_collection("nat")
    assert client.describe_resource_group("rg_q")["num_loaded_replica"] == {}
    client.drop_resource_group("rg_q")


def test_describe_replica(client, spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    client.create_collection("nat", pk_field="n_nationkey")
    client.insert("nat", nation)
    assert client.describe_replica("nat") == []  # not loaded
    client.create_resource_group("rg_r", {"requests": {"node_num": 2}, "limits": {"node_num": 2}})
    client.load_collection("nat", replica_number=2, resource_groups=["rg_r", DEFAULT_RESOURCE_GROUP])
    reps = client.describe_replica("nat")
    assert [r["resource_group"] for r in reps] == ["rg_r", DEFAULT_RESOURCE_GROUP]
    assert reps[0]["nodes"] == client.describe_resource_group("rg_r")["nodes"]
    assert reps[0]["replica_id"] != reps[1]["replica_id"]
    client.release_collection("nat")
    assert client.describe_replica("nat") == []


def test_queries_run_in_the_groups_scheduler_pool(client, spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    client.create_collection("nat", pk_field="n_nationkey")
    client.insert("nat", nation)
    client.create_resource_group("rg_p", {"requests": {"node_num": 1}, "limits": {"node_num": 1}})
    client.load_collection("nat", resource_groups=["rg_p"])
    assert client.query("nat", filter="n_regionkey == 1").count() > 0
    # the pool local property is what Spark's fair scheduler keys jobs by —
    # it must name the resource group while this collection is being served
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") == "rg_p"
    client.release_collection("nat")
    client.query("nat", filter="n_regionkey == 1").count()
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None


def test_store_persists_configs_not_nodes(tmp_path):
    p = str(tmp_path / "_resource_groups.json")
    s1 = ResourceGroupStore(p, num_nodes=4)
    s1.create("rg_x", {"requests": {"node_num": 3}, "limits": {"node_num": 3}})
    # a new session over the same meta re-derives the same assignment
    s2 = ResourceGroupStore(p, num_nodes=4)
    assert s2.describe("rg_x")["nodes"] == s1.describe("rg_x")["nodes"]
    # resized session (different executor fleet) still honors requests first
    s3 = ResourceGroupStore(p, num_nodes=2)
    assert s3.describe("rg_x")["num_available_node"] == 2
    assert s3.describe(DEFAULT_RESOURCE_GROUP)["num_available_node"] == 0


def test_rbac_gates_resource_group_admin(client):
    client.create_user("ops", "opspass12")
    client.create_role("rg_reader")
    client.grant_privilege("rg_reader", "ClusterReadOnly", "*")
    client.grant_role("ops", "rg_reader")
    client.login("ops", "opspass12")
    try:
        assert client.list_resource_groups() == [DEFAULT_RESOURCE_GROUP]
        client.describe_resource_group(DEFAULT_RESOURCE_GROUP)
        from milvus_spark.rbac import RbacError

        with pytest.raises(RbacError):
            client.create_resource_group("rg_denied")
        with pytest.raises(RbacError):
            client.transfer_node(DEFAULT_RESOURCE_GROUP, "x", 1)
    finally:
        client.logout()
